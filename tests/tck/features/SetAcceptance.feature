Feature: SetAcceptance

  Scenario: Set a property
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1})
      """
    When executing query:
      """
      MATCH (n:N) SET n.x = 2 RETURN n.x AS x
      """
    Then the result should be, in any order:
      | x |
      | 2 |
    And no side effects

  Scenario: Set a label
    Given an empty graph
    And having executed:
      """
      CREATE (:N)
      """
    When executing query:
      """
      MATCH (n:N) SET n:M RETURN labels(n) AS l
      """
    Then the result should be, in any order:
      | l          |
      | ['M', 'N'] |
    And no side effects
