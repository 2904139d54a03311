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
  Scenario: Failing when using parameter as node predicate in MATCH
    Given any graph
    When executing query:
      """
      MATCH (n $param) RETURN n
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using parameter as relationship predicate in MATCH
    Given any graph
    When executing query:
      """
      MATCH ()-[r:FOO $param]->() RETURN r
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using undefined variable in ON MATCH
    Given any graph
    When executing query:
      """
      MERGE (n) ON MATCH SET n.prop = missing RETURN n
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when float value is too large
    Given any graph
    When executing query:
      """
      RETURN 1.34E999 AS x
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Handling property access on the Any type
    Given any graph
    When executing query:
      """
      UNWIND [{prop: 1}, 2] AS x RETURN x.prop AS p
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Failing when checking existence of a non-property and non-pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})
      """
    When executing query:
      """
      MATCH (n:A) RETURN exists(n.name + 'x') AS x
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Bad arguments for `range()`
    Given any graph
    When executing query:
      """
      RETURN range(0, 10, 0) AS x
      """
    Then an ArgumentError should be raised at runtime
    And no side effects

  Scenario: Fail for invalid Unicode hyphen in subtraction
    Given any graph
    When executing query:
      """
      RETURN 1 − 1 AS x
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing for `size()` on paths
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})-[:X]->(:B)
      """
    When executing query:
      """
      MATCH p = (a:A)-->() RETURN size(p) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: Failing when creating relationship without type
    Given any graph
    When executing query:
      """
      CREATE (a)-[r]->(b) RETURN r
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when merging relationship without type
    Given any graph
    When executing query:
      """
      MERGE (a)-[r]->(b) RETURN r
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when merging relationship without type, no colon
    Given any graph
    When executing query:
      """
      MERGE (a)-[NO_COLON]->(b) RETURN a
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when creating relationship with more than one type
    Given any graph
    When executing query:
      """
      CREATE (a)-[r:A|:B]->(b) RETURN r
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when merging relationship with more than one type
    Given any graph
    When executing query:
      """
      MERGE (a)-[r:A|:B]->(b) RETURN r
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when performing property access on a non-map 1
    Given any graph
    When executing query:
      """
      WITH 1 AS x RETURN x.prop AS y
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Failing when performing property access on a non-map 2
    Given any graph
    When executing query:
      """
      WITH 'string' AS x RETURN x.prop AS y
      """
    Then a TypeError should be raised at any time
    And no side effects
  Scenario: Failing when using variable length relationship in CREATE
    Given any graph
    When executing query:
      """
      CREATE (a)-[:FOO*2]->(b)
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using variable length relationship in MERGE
    Given any graph
    When executing query:
      """
      MERGE (a)-[:FOO*2]->(b)
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using parameter as node predicate in MERGE
    Given any graph
    When executing query:
      """
      MERGE (n $param) RETURN n
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using parameter as relationship predicate in MERGE
    Given any graph
    When executing query:
      """
      MERGE ()-[r:FOO $param]->() RETURN r
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when deleting an integer expression
    Given any graph
    When executing query:
      """
      MATCH () DELETE 1 + 1
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using CREATE on a node that is already bound
    Given any graph
    When executing query:
      """
      MATCH (a) CREATE (a)
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using MERGE on a node that is already bound
    Given any graph
    When executing query:
      """
      MATCH (a) MERGE (a)
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using CREATE on a relationship that is already bound
    Given any graph
    When executing query:
      """
      MATCH ()-[r]->() CREATE ()-[r:FOO]->()
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using MERGE on a relationship that is already bound
    Given any graph
    When executing query:
      """
      MATCH ()-[r]->() MERGE ()-[r:FOO]->()
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using undefined variable in ON CREATE
    Given any graph
    When executing query:
      """
      MERGE (n) ON CREATE SET n.prop = missing RETURN n
      """
    Then a SyntaxError should be raised at compile time
    And no side effects
