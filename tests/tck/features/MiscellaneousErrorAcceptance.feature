Feature: MiscellaneousErrorAcceptance

  Scenario: Failing on aggregation in WHERE
    Given any graph
    When executing query:
      """
      MATCH (a) WHERE count(a) > 10 RETURN a
      """
    Then a SyntaxError should be raised at compile time: InvalidAggregation
    And no side effects

  Scenario: Failing on aggregation in ORDER BY after RETURN
    Given any graph
    When executing query:
      """
      MATCH (n) RETURN n.prop1 AS p ORDER BY max(n.prop2)
      """
    Then a SyntaxError should be raised at compile time: InvalidAggregation
    And no side effects

  Scenario: Failing when not aliasing expressions in WITH
    Given any graph
    When executing query:
      """
      MATCH (a) WITH a, count(*) RETURN a
      """
    Then a SyntaxError should be raised at compile time: NoExpressionAlias
    And no side effects

  Scenario: Failing when using undefined variable in pattern
    Given any graph
    When executing query:
      """
      MATCH (a)-[:KNOWS]->(b {name: missing}) RETURN b
      """
    Then a SyntaxError should be raised at compile time: UndefinedVariable
    And no side effects

  Scenario: Failing when using a list as a node
    Given any graph
    When executing query:
      """
      WITH [1, 2, 3] AS list MATCH (list)-[:REL]->() RETURN 1 AS one
      """
    Then a SyntaxError should be raised at compile time: VariableTypeConflict
    And no side effects

  Scenario: Failing when UNION has different columns
    Given any graph
    When executing query:
      """
      RETURN 1 AS a UNION RETURN 2 AS b
      """
    Then a SyntaxError should be raised at compile time: DifferentColumnsInUnion
    And no side effects

  Scenario: Failing when mixing UNION and UNION ALL
    Given any graph
    When executing query:
      """
      RETURN 1 AS a UNION RETURN 2 AS a UNION ALL RETURN 3 AS a
      """
    Then a SyntaxError should be raised at compile time: InvalidClauseComposition
    And no side effects

  Scenario: Failing when multiple columns have the same name
    Given any graph
    When executing query:
      """
      RETURN 1 AS a, 2 AS a
      """
    Then a SyntaxError should be raised at compile time: ColumnNameConflict
    And no side effects

  Scenario: Failing when using RETURN * without variables in scope
    Given any graph
    When executing query:
      """
      MATCH () RETURN *
      """
    Then a SyntaxError should be raised at compile time: NoVariablesInScope
    And no side effects
  Scenario: Failing on aggregation in ORDER BY after WITH
    Given an empty graph
    And having executed:
      """
      CREATE ({num: 1}), ({num: 2})
      """
    When executing query:
      """
      MATCH (n) WITH n.num AS x ORDER BY count(*) RETURN x
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using a path variable that is already bound
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})-[:X]->(:B)
      """
    When executing query:
      """
      MATCH p = (a:A)-->(b) WITH p MATCH p = (x)-->(y) RETURN p
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using a variable length relationship as a single relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})-[:X]->(:B)
      """
    When executing query:
      """
      MATCH (a)-[r*1..2]->(b) WITH r, a, b MATCH (a)-[r]->(b) RETURN r
      """
    Then a SyntaxError should be raised at compile time
    And no side effects
  Scenario: Failing on merging relationship with null property
    Given any graph
    When executing query:
      """
      CREATE (a), (b) MERGE (a)-[r:X {p: null}]->(b)
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing on merging node with null property
    Given any graph
    When executing query:
      """
      MERGE ({p: null})
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using undefined variable in SET
    Given any graph
    When executing query:
      """
      MATCH (a) SET a.name = missing RETURN a
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using undefined variable in DELETE
    Given any graph
    When executing query:
      """
      MATCH (a) DELETE x
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when using a variable that is already bound in CREATE
    Given any graph
    When executing query:
      """
      MATCH (a) CREATE (a {name: 'foo'})
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when creating without direction
    Given any graph
    When executing query:
      """
      CREATE (a)-[:FOO]-(b)
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when creating with two directions
    Given any graph
    When executing query:
      """
      CREATE (a)<-[:FOO]->(b)
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing when deleting a label
    Given any graph
    When executing query:
      """
      MATCH (n) DELETE n:Person
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Failing on incorrect unicode literal
    Given any graph
    When executing query:
      """
      RETURN '\uH'
      """
    Then a SyntaxError should be raised at compile time: InvalidUnicodeLiteral

  Scenario: Failing when setting a list of maps as a property
    Given an empty graph
    When executing query:
      """
      CREATE (a)
      SET a.maplist = [{foo: 1}]
      """
    Then a TypeError should be raised at any time: InvalidPropertyType
