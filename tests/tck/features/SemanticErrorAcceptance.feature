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

  Scenario: Failing when returning an undefined variable
    Given any graph
    When executing query:
      """
      MATCH () RETURN foo
      """
    Then a SyntaxError should be raised at compile time: UndefinedVariable
    And no side effects

  Scenario: Failing when comparing to an undefined variable
    Given any graph
    When executing query:
      """
      MATCH (s) WHERE s.name = undefinedVariable RETURN s
      """
    Then a SyntaxError should be raised at compile time: UndefinedVariable
    And no side effects

  Scenario: Failing when using IN on a string literal
    Given any graph
    When executing query:
      """
      MATCH (n) WHERE n.num IN 'string' RETURN n
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentType
    And no side effects

  Scenario: Failing when using IN on an integer literal
    Given any graph
    When executing query:
      """
      MATCH (n) WHERE n.num IN 1 RETURN n
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentType
    And no side effects

  Scenario: Failing when using IN on a float literal
    Given any graph
    When executing query:
      """
      MATCH (n) WHERE n.num IN 1.2 RETURN n
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentType
    And no side effects

  Scenario: Failing when using IN on a boolean literal
    Given any graph
    When executing query:
      """
      MATCH (n) WHERE n.num IN true RETURN n
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentType
    And no side effects

  Scenario: Failing when a node is used as a relationship
    Given any graph
    When executing query:
      """
      MATCH (r) MATCH ()-[r]-() RETURN r
      """
    Then a SyntaxError should be raised at compile time: VariableTypeConflict
    And no side effects

  Scenario: Failing when a relationship is used as a node
    Given any graph
    When executing query:
      """
      MATCH ()-[r]-(r) RETURN r
      """
    Then a SyntaxError should be raised at compile time: VariableTypeConflict
    And no side effects

  Scenario: Failing when using `type()` on a node
    Given any graph
    When executing query:
      """
      MATCH (r) RETURN type(r)
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentType
    And no side effects

  Scenario: Failing when using `length()` on a node
    Given any graph
    When executing query:
      """
      MATCH (r) RETURN length(r)
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentType
    And no side effects

  Scenario: Failing when re-using a relationship in the same pattern
    Given any graph
    When executing query:
      """
      MATCH (a)-[r]->()-[r]->(a) RETURN r
      """
    Then a SyntaxError should be raised at compile time: RelationshipUniquenessViolation
    And no side effects

  Scenario: Failing when using NOT on string literal
    Given any graph
    When executing query:
      """
      RETURN NOT 'foo'
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentType
    And no side effects

  Scenario: Failing when using aggregation in list comprehension
    Given any graph
    When executing query:
      """
      MATCH (n) RETURN [x IN [1, 2, 3, 4, 5] | count(*)]
      """
    Then a SyntaxError should be raised at compile time: InvalidAggregation
    And no side effects

  Scenario: Failing when using non-constants in SKIP
    Given any graph
    When executing query:
      """
      MATCH (n) RETURN n SKIP n.count
      """
    Then a SyntaxError should be raised at compile time: NonConstantExpression
    And no side effects

  Scenario: Failing when using negative value in SKIP
    Given any graph
    When executing query:
      """
      MATCH (n) RETURN n SKIP -1
      """
    Then a SyntaxError should be raised at compile time: NegativeIntegerArgument
    And no side effects

  Scenario: Failing when using non-constants in LIMIT
    Given any graph
    When executing query:
      """
      MATCH (n) RETURN n LIMIT n.count
      """
    Then a SyntaxError should be raised at compile time: NonConstantExpression
    And no side effects

  Scenario: Failing when using negative value in LIMIT
    Given any graph
    When executing query:
      """
      MATCH (n) RETURN n LIMIT -1
      """
    Then a SyntaxError should be raised at compile time: NegativeIntegerArgument
    And no side effects

  Scenario: Failing when using floating point in LIMIT
    Given any graph
    When executing query:
      """
      MATCH (n) RETURN n LIMIT 1.7
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentType
    And no side effects

  Scenario: Failing when using MATCH after OPTIONAL MATCH
    Given any graph
    When executing query:
      """
      OPTIONAL MATCH (a:Missing) MATCH (b) RETURN a, b
      """
    Then a SyntaxError should be raised at compile time: InvalidClauseComposition
    And no side effects
