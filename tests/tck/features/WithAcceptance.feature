Feature: WithAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'Alice', age: 38}),
             (b:P {name: 'Bob', age: 25}),
             (c:P {name: 'Carol', age: 61}),
             (a)-[:KNOWS]->(b), (b)-[:KNOWS]->(c)
      """

  Scenario: Alias a property and filter on the alias
    When executing query:
      """
      MATCH (p:P) WITH p.age AS age WHERE age > 30 RETURN age
      """
    Then the result should be, in any order:
      | age |
      | 38  |
      | 61  |
    And no side effects

  Scenario: Entity alias keeps property lineage
    When executing query:
      """
      MATCH (p:P) WITH p, p AS foo WHERE p.name = 'Bob'
      RETURN foo.age AS age
      """
    Then the result should be, in any order:
      | age |
      | 25  |
    And no side effects

  Scenario: WITH aggregation then post-filter
    When executing query:
      """
      MATCH (x:P)-[:KNOWS]->(y:P)
      WITH x, count(y) AS degree WHERE degree >= 1
      RETURN x.name AS name, degree
      """
    Then the result should be, in any order:
      | name    | degree |
      | 'Alice' | 1      |
      | 'Bob'   | 1      |
    And no side effects

  Scenario: WITH DISTINCT deduplicates mid-pipeline
    When executing query:
      """
      MATCH (:P)-[:KNOWS]->(p:P)
      WITH DISTINCT true AS knows_someone
      RETURN knows_someone
      """
    Then the result should be, in any order:
      | knows_someone |
      | true          |
    And no side effects

  Scenario: WITH ORDER BY LIMIT restricts the pipeline
    When executing query:
      """
      MATCH (p:P)
      WITH p ORDER BY p.age DESC LIMIT 1
      RETURN p.name AS oldest
      """
    Then the result should be, in any order:
      | oldest  |
      | 'Carol' |
    And no side effects

  Scenario: Chained WITH clauses compose
    When executing query:
      """
      MATCH (p:P)
      WITH p.age AS age
      WITH age * 2 AS dbl WHERE dbl < 100
      RETURN dbl ORDER BY dbl
      """
    Then the result should be, in order:
      | dbl |
      | 50  |
      | 76  |
    And no side effects

  Scenario: WITH a fresh literal for every input row
    When executing query:
      """
      MATCH (p:P) WITH p, 1 AS one RETURN sum(one) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |
    And no side effects

  Scenario: A simple pattern with one bound endpoint
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'})-[:REL]->(:B {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:A)-[r:REL]->(b:B)
      WITH a AS b, b AS tmp, r AS r
      WITH b AS a, r
      LIMIT 1
      MATCH (a)-[r]->(b)
      RETURN a.name AS a, b.name AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 'a' | 'b' |
    And no side effects
