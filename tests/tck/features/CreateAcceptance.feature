Feature: CreateAcceptance

  Scenario: Create a single node
    Given an empty graph
    When executing query:
      """
      CREATE (:N)
      """
    Then the result should be empty
    And no side effects

  Scenario: Create and return
    Given an empty graph
    When executing query:
      """
      CREATE (n:N {x: 1}) RETURN n.x AS x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
    And no side effects
