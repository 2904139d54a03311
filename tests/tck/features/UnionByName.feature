Feature: UnionByName

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a', num: 1}), (:B {name: 'b', num: 2})
      """

  Scenario: UNION aligns columns by name not position
    When executing query:
      """
      MATCH (a:A) RETURN a.name AS n, a.num AS x
      UNION
      MATCH (b:B) RETURN b.num AS x, b.name AS n
      """
    Then the result should be, in any order:
      | n   | x |
      | 'a' | 1 |
      | 'b' | 2 |
    And no side effects
