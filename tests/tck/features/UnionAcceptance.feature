Feature: UnionAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'}), (:B {name: 'b'})
      """

  Scenario: UNION removes duplicate rows
    When executing query:
      """
      MATCH (n:A) RETURN n.name AS name
      UNION
      MATCH (n:A) RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
    And no side effects

  Scenario: UNION ALL keeps duplicate rows
    When executing query:
      """
      MATCH (n:A) RETURN n.name AS name
      UNION ALL
      MATCH (n:A) RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
      | 'a'  |
    And no side effects

  Scenario: UNION over different labels
    When executing query:
      """
      MATCH (n:A) RETURN n.name AS name
      UNION
      MATCH (n:B) RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
      | 'b'  |
    And no side effects

  Scenario: Union of mixed-type columns
    When executing query:
      """
      RETURN 1 AS x
      UNION
      RETURN 'a' AS x
      """
    Then the result should be, in any order:
      | x   |
      | 1   |
      | 'a' |
    And no side effects
