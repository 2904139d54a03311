Feature: OrderByAcceptance

  Scenario: ORDER BY with negative parameter for LIMIT should not generate errors
    Given an empty graph
    And having executed:
      """
      CREATE ({name: 'A'}), ({name: 'B'})
      """
    And parameters are:
      | limit | -1 |
    When executing query:
      """
      MATCH (n) RETURN n.name AS name ORDER BY name LIMIT $limit
      """
    Then the result should be empty
    And no side effects
  Scenario: ORDER BY with a negative LIMIT should fail with a syntax exception
    Given an empty graph
    And having executed:
      """
      CREATE ({name: 'A'}), ({name: 'B'})
      """
    When executing query:
      """
      MATCH (n) RETURN n.name AS name ORDER BY name LIMIT -1
      """
    Then a SyntaxError should be raised at compile time
    And no side effects
