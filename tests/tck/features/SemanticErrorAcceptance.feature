Feature: SemanticErrorAcceptance

  Scenario: Undefined variable in RETURN
    Given any graph
    When executing query:
      """
      RETURN foo AS x
      """
    Then a SyntaxError should be raised at compile time: UndefinedVariable
    And no side effects

  Scenario: Unclosed parenthesis
    Given any graph
    When executing query:
      """
      MATCH (n RETURN n
      """
    Then a SyntaxError should be raised at compile time: InvalidSyntax
    And no side effects

  Scenario: Aggregation nested inside aggregation
    Given any graph
    When executing query:
      """
      UNWIND [1, 2] AS i RETURN sum(count(i)) AS s
      """
    Then a SyntaxError should be raised at compile time: NestedAggregation
    And no side effects

  Scenario: Variable length relationship in CONSTRUCT NEW
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:R]->(:B)
      """
    When executing query:
      """
      MATCH (a:A)-[:R]->(b:B)
      CONSTRUCT NEW (a)-[:T*1..2]->(b)
      RETURN GRAPH
      """
    Then a SyntaxError should be raised at compile time: InvalidRelationshipPattern
    And no side effects
