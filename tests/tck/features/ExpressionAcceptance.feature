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
  Scenario: Fail at runtime when attempting to index with an Int into a Map
    Given any graph
    When executing query:
      """
      RETURN {name: 'Mats'}[0] AS x
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Fail at runtime when trying to index into a map with a non-string
    Given any graph
    When executing query:
      """
      WITH {name: 'Mats'} AS map, 0 AS idx RETURN map[idx] AS x
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Fail at runtime when attempting to index with a String into a Collection
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3]['foo'] AS x
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Fail at runtime when trying to index into a list with a list
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3][[1]] AS x
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Fail at compile time when attempting to index with a non-integer into a list
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3][1.5] AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: Fail at runtime when attempting to index with a non-integer into a list
    Given any graph
    When executing query:
      """
      WITH [1, 2, 3] AS l, 1.5 AS idx RETURN l[idx] AS x
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Fail at runtime when trying to index something which is not a map or collection
    Given any graph
    When executing query:
      """
      WITH 1 AS nope RETURN nope[0] AS x
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Fail at runtime when trying to index something which is not a map or list
    Given any graph
    When executing query:
      """
      WITH true AS nope RETURN nope[0] AS x
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Execute n['name'] in update queries
    Given an empty graph
    And having executed:
      """
      CREATE ({name: 'Apa'})
      """
    When executing query:
      """
      MATCH (n)
      CREATE (m {name: n['name']})
      RETURN m.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'Apa' |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |
