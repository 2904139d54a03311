Feature: ExpressionAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Apa'})
      """

  Scenario: Execute n['name'] in read queries
    When executing query:
      """
      MATCH (n:Person) WHERE n['name'] = 'Apa' RETURN n['name'] AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'Apa' |
    And no side effects

  Scenario: Use dynamic property lookup based on parameters when there is no type information
    And parameters are:
      | idx | 'name' |
    When executing query:
      """
      MATCH (n:Person) RETURN n[$idx] AS value
      """
    Then the result should be, in any order:
      | value |
      | 'Apa' |
    And no side effects

  Scenario: Use dynamic property lookup based on parameters when there is lhs type information
    And parameters are:
      | idx | 'name' |
    When executing query:
      """
      MATCH (n:Person) WHERE n[$idx] STARTS WITH 'A' RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'Apa' |
    And no side effects

  Scenario: Use dynamic property lookup based on parameters when there is rhs type information
    And parameters are:
      | expr | {name: 'Apa'} |
      | idx  | 'name'        |
    When executing query:
      """
      RETURN $expr[$idx] AS value
      """
    Then the result should be, in any order:
      | value |
      | 'Apa' |
    And no side effects

  Scenario: Dynamic list and map element access
    When executing query:
      """
      WITH [1, 2, 3] AS list, {a: 10} AS map, 1 AS i
      RETURN list[i] AS li, list[i..] AS ls, map['a'] AS ma
      """
    Then the result should be, in any order:
      | li | ls     | ma |
      | 2  | [2, 3] | 10 |
    And no side effects
