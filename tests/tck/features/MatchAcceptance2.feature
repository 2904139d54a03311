Feature: MatchAcceptance2

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:KNOWS]->(b), (b)-[:KNOWS]->(c)
      """

  Scenario: Pattern predicate in WHERE
    When executing query:
      """
      MATCH (n:P) WHERE exists((n)-[:KNOWS]->()) RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
      | 'b'  |
    And no side effects

  Scenario: Negated pattern predicate
    When executing query:
      """
      MATCH (n:P) WHERE NOT exists((n)-[:KNOWS]->()) RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'c'  |
    And no side effects

  Scenario: Label predicate as an expression
    Given an empty graph
    And having executed:
      """
      CREATE (:A {val: 1}), (:B {val: 2}), (:C {val: 3})
      """
    When executing query:
      """
      MATCH (a) WHERE a:A OR a:B RETURN a.val AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Disconnected patterns produce the cross product
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (b:P)
      RETURN a.name AS a, b.name AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 'a' | 'a' |
      | 'a' | 'b' |
      | 'a' | 'c' |
    And no side effects

  Scenario: Relationship uniqueness within a pattern
    When executing query:
      """
      MATCH (a)-[r1:KNOWS]->(b)-[r2:KNOWS]->(c)
      RETURN a.name AS a, c.name AS c
      """
    Then the result should be, in any order:
      | a   | c   |
      | 'a' | 'c' |
    And no side effects

  Scenario: Named relationship variable exposes its properties
    Given an empty graph
    And having executed:
      """
      CREATE (:X)-[:R {w: 5}]->(:Y)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 5 |
    And no side effects

  Scenario: Relationship uniqueness applies across comma patterns
    Given an empty graph
    And having executed:
      """
      CREATE (:X {v: 1})-[:R]->(:Y {v: 2})
      """
    When executing query:
      """
      MATCH (x:X)-->(), ()-->(y:Y)
      RETURN x.v AS x, y.v AS y
      """
    Then the result should be empty
    And no side effects

  Scenario: Match a self loop
    Given an empty graph
    And having executed:
      """
      CREATE (a:S {v: 1})-[:R]->(a)
      """
    When executing query:
      """
      MATCH (a:S)-[:R]->(a) RETURN a.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
    And no side effects
