Feature: DeleteAcceptance

  Scenario: Delete nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:N)
      """
    When executing query:
      """
      MATCH (n) DELETE n
      """
    Then the result should be empty
    And no side effects

  Scenario: Detach delete node
    Given an empty graph
    And having executed:
      """
      CREATE (:N)-[:R]->(:N)
      """
    When executing query:
      """
      MATCH (n) DETACH DELETE n
      """
    Then the result should be empty
    And no side effects
