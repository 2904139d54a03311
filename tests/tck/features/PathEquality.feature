Feature: PathEquality

  Scenario: Direction of traversed relationship is not significant for path equality, simple
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X]->(b:B {name: 'B'})
      """
    When executing query:
      """
      MATCH p1 = (a:A)-->(b) MATCH p2 = (a:A)--(b) RETURN p1 = p2 AS eq
      """
    Then the result should be, in any order:
      | eq   |
      | true |
    And no side effects
