Feature: MergeAcceptance

  Scenario: Merge node when no match exists
    Given an empty graph
    When executing query:
      """
      MERGE (n:N {x: 1}) RETURN n.x AS x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
    And no side effects
