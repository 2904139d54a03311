Feature: ColumnNameAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})
      """

  Scenario: Keeping used expression 2
    When executing query:
      """
      MATCH (n:A) RETURN n.name AS name, n.name AS name2
      """
    Then the result should be, in any order:
      | name | name2 |
      | 'A'  | 'A'   |
    And no side effects

  Scenario: Keeping used expression 3
    When executing query:
      """
      MATCH (n:A) WITH n.name AS x, size(n.name) AS s RETURN x, s
      """
    Then the result should be, in any order:
      | x   | s |
      | 'A' | 1 |
    And no side effects
