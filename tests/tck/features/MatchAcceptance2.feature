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
  Scenario: Aggregation with named paths
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH p = (x)-[*1..2]->(y) RETURN count(p) AS c, max(length(p)) AS ml
      """
    Then the result should be, in any order:
      | c | ml |
      | 3 | 2  |
    And no side effects

  Scenario: Simple variable length pattern
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-[*]->(x) RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'B'  |
      | 'C'  |
    And no side effects

  Scenario: Variable length relationship without lower bound
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-[*..2]->(x) RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'B'  |
      | 'C'  |
    And no side effects

  Scenario: Variable length relationship without bounds
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-[*]->(x:C) RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'C'  |
    And no side effects

  Scenario: Optionally matching named paths
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (x) OPTIONAL MATCH p = (x)-[:X]->(y) RETURN x.name AS name, p IS NULL AS missing
      """
    Then the result should be, in any order:
      | name | missing |
      | 'A'  | false   |
      | 'B'  | true    |
      | 'C'  | true    |
    And no side effects

  Scenario: Optionally matching named paths with single and variable length patterns
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH p = (a)-->(b)-[*0..1]->(c) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Optionally matching named paths with variable length patterns
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH p = (a)-[*1..2]->(x) RETURN x.name AS name, length(p) AS l
      """
    Then the result should be, in any order:
      | name | l |
      | 'B'  | 1 |
      | 'C'  | 2 |
    And no side effects

  Scenario: Matching variable length patterns from a bound node
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A) MATCH (a)-[*1..2]->(x) RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'B'  |
      | 'C'  |
    And no side effects

  Scenario: Variable length relationship in OPTIONAL MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (c:C) OPTIONAL MATCH (c)-[*1..2]->(y) RETURN c.name AS name, y IS NULL AS ynull
      """
    Then the result should be, in any order:
      | name | ynull |
      | 'C'  | true  |
    And no side effects

  Scenario: Handling direction of named paths
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH p = (b:B)<-[:X]-(a:A) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 1 |
    And no side effects

  Scenario: Handling fixed-length variable length pattern
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-[*1..1]->(x) RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'B'  |
    And no side effects

  Scenario: Zero-length named path
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH p = (a:A)-[*0..0]->(x) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 0 |
    And no side effects

  Scenario: Variable-length named path
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH p = (a:A)-[*1..2]->(x) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Matching using a relationship that is already bound
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH ()-[r]->() WITH r MATCH (a)-[r]->(b) RETURN a.name AS an, b.name AS bn
      """
    Then the result should be, in any order:
      | an  | bn  |
      | 'A' | 'B' |
      | 'B' | 'C' |
    And no side effects

  Scenario: Matching using a relationship that is already bound, in conjunction with aggregation
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH ()-[r]->() WITH r MATCH (a)-[r]->(b) RETURN b.name AS bn, count(*) AS c
      """
    Then the result should be, in any order:
      | bn  | c |
      | 'B' | 1 |
      | 'C' | 1 |
    And no side effects

  Scenario: Matching using a relationship that is already bound, in conjunction with aggregation and ORDER BY
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH ()-[r]->() WITH r MATCH (a)-[r]->(b)
      RETURN b.name AS bn, count(*) AS c ORDER BY bn
      """
    Then the result should be, in order:
      | bn  | c |
      | 'B' | 1 |
      | 'C' | 1 |
    And no side effects

  Scenario: Matching with LIMIT and optionally matching using a relationship that is already bound
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a {name: 'A'})-[r]->(b) WITH r LIMIT 1
      OPTIONAL MATCH (x)-[r]->(y) RETURN x.name AS xn, y.name AS yn
      """
    Then the result should be, in any order:
      | xn  | yn  |
      | 'A' | 'B' |
    And no side effects

  Scenario: Matching with LIMIT and optionally matching using a relationship and node that are both already bound
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a {name: 'A'})-[r]->(b) WITH a, r LIMIT 1
      OPTIONAL MATCH (a)-[r]->(y) RETURN a.name AS an, y.name AS yn
      """
    Then the result should be, in any order:
      | an  | yn  |
      | 'A' | 'B' |
    And no side effects

  Scenario: Matching with LIMIT, then matching again using a relationship and node that are both already bound along with an additional predicate
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a {name: 'A'})-[r]->(b) WITH a, r LIMIT 1
      MATCH (a)-[r]->(y) WHERE y.name = 'B' RETURN a.name AS an, y.name AS yn
      """
    Then the result should be, in any order:
      | an  | yn  |
      | 'A' | 'B' |
    And no side effects

  Scenario: Matching with LIMIT and predicates, then matching again using a relationship and node that are both already bound along with a duplicate predicate
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a {name: 'A'})-[r]->(b) WHERE a.name = 'A' WITH a, r LIMIT 1
      MATCH (a)-[r]->(y) WHERE a.name = 'A' RETURN a.name AS an, y.name AS yn
      """
    Then the result should be, in any order:
      | an  | yn  |
      | 'A' | 'B' |
    And no side effects

  Scenario: Matching twice with conflicting relationship types on same relationship
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a)-[r:X]->(b) MATCH (a)-[r:Y]->(b) RETURN r.p AS p
      """
    Then the result should be empty
    And no side effects

  Scenario: Matching twice with duplicate relationship types on same relationship
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a)-[r:X]->(b) MATCH (a)-[r:X]->(b) RETURN r.p AS p
      """
    Then the result should be, in any order:
      | p |
      | 1 |
    And no side effects

  Scenario: Matching relationships into a list and matching variable length using the list
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-[r1]->(b)-[r2]->(c) WITH [r1, r2] AS rs, a AS first, c AS second
      MATCH (first)-[rs2*2..2]->(second) RETURN rs = rs2 AS eq
      """
    Then the result should be, in any order:
      | eq   |
      | true |
    And no side effects

  Scenario: Matching relationships into a list and matching variable length using the list, with bound nodes
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-[r1]->(b)-[r2]->(c) WITH [r1, r2] AS rs, a AS first, c AS second
      MATCH (first)-[rs2*1..3]->(second) RETURN size(rs2) AS s, rs = rs2 AS eq
      """
    Then the result should be, in any order:
      | s | eq   |
      | 2 | true |
    And no side effects

  Scenario: Matching relationships into a list and matching variable length using the list, with bound nodes, wrong direction
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-[r1]->(b)-[r2]->(c) WITH [r1, r2] AS rs, a AS first, c AS second
      MATCH (second)-[rs2*2..2]->(first) RETURN rs2
      """
    Then the result should be empty
    And no side effects

  Scenario: Matching and optionally matching with bound nodes in reverse direction
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a)-[:X]->(b) OPTIONAL MATCH (a)<-[r2]-(b)
      RETURN a.name AS an, r2 IS NULL AS nor
      """
    Then the result should be, in any order:
      | an  | nor  |
      | 'A' | true |
    And no side effects

  Scenario: Matching and optionally matching with unbound nodes and equality predicate in reverse direction
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-->(b) OPTIONAL MATCH (x)<-[r2:X]-(y) WHERE y = b
      RETURN b.name AS bn, x IS NULL AS nox
      """
    Then the result should be, in any order:
      | bn  | nox  |
      | 'B' | true |
    And no side effects

  Scenario: Matching variable length pattern with property predicate
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-[rs* {p: 1}]->(x) RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'B'  |
    And no side effects

  Scenario: Variable length pattern checking labels on endnodes
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-[*1..2]->(c:C) RETURN c.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'C'  |
    And no side effects

  Scenario: Variable length pattern with label predicate on both sides
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-[*1..2]->(b:B) RETURN b.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'B'  |
    And no side effects

  Scenario: Undirected named path
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH p = (c:C)-[*1..2]-(x) RETURN x.name AS name, length(p) AS l
      """
    Then the result should be, in any order:
      | name | l |
      | 'B'  | 1 |
      | 'A'  | 2 |
    And no side effects

  Scenario: Named path with WITH
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH p = (a:A)-->(b) WITH p RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 1 |
    And no side effects

  Scenario: Named path with alternating directed/undirected relationships
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH p = (a:A)--(b)-->(c) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 2 |
    And no side effects

  Scenario: Named path with multiple alternating directed/undirected relationships
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:R]->(b:B {name: 'B'})-[:R]->(c:C {name: 'C'})-[:R]->(d:D {name: 'D'})
      """
    When executing query:
      """
      MATCH p = (a:A)--(b)-->(c)--(d) RETURN length(p) AS l, d.name AS name
      """
    Then the result should be, in any order:
      | l | name |
      | 3 | 'D'  |
    And no side effects

  Scenario: Named path with undirected fixed variable length pattern
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:R]->(b:B {name: 'B'})-[:R]->(c:C {name: 'C'})-[:R]->(d:D {name: 'D'})
      """
    When executing query:
      """
      MATCH p = (b:B)-[*2..2]-(x) RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'D'  |
    And no side effects

  Scenario: Variable length relationship variables are lists of relationships
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a:A)-[rs*1..2]->(x) RETURN size(rs) AS s
      """
    Then the result should be, in any order:
      | s |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Variable length patterns and nulls
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (c:C) OPTIONAL MATCH (c)-[rs*1..2]->(x)
      RETURN rs IS NULL AS rsnull, x IS NULL AS xnull
      """
    Then the result should be, in any order:
      | rsnull | xnull |
      | true   | true  |
    And no side effects

  Scenario: Projecting a list of nodes and relationships
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a)-[r:X]->(b) RETURN [a.name, b.name] AS ns, [r.p] AS rs
      """
    Then the result should be, in any order:
      | ns         | rs  |
      | ['A', 'B'] | [1] |
    And no side effects

  Scenario: Projecting a map of nodes and relationships
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a)-[r:X]->(b) RETURN {start: a.name, end: b.name, rel: r.p} AS m
      """
    Then the result should be, in any order:
      | m                                |
      | {start: 'A', end: 'B', rel: 1} |
    And no side effects

  Scenario: Respecting direction when matching existing path
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a {name: 'A'})-[:X]->(b {name: 'B'}) RETURN a.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'A'  |
    And no side effects

  Scenario: Respecting direction when matching non-existent path
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a {name: 'B'})-[:X]->(b {name: 'A'}) RETURN a.name AS name
      """
    Then the result should be empty
    And no side effects

  Scenario: Respecting direction when matching non-existent path with multiple directions
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})-[:Y {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a)-->(b)-->(a) RETURN a.name AS name
      """
    Then the result should be empty
    And no side effects

  Scenario: Matching path with both directions should respect other directions
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:R]->(b:B {name: 'B'}), (b)-[:R]->(a)
      """
    When executing query:
      """
      MATCH p = (x)-[]->(y)-[]->(x) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 2 |
      | 2 |
    And no side effects

  Scenario: Matching path with multiple bidirectional relationships
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:R]->(b:B {name: 'B'}), (b)-[:R]->(a)
      """
    When executing query:
      """
      MATCH p = (x)--(y)--(x) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 2 |
      | 2 |
      | 2 |
      | 2 |
    And no side effects

  Scenario: Matching longer variable length paths
    Given an empty graph
    And having executed:
      """
      CREATE (n1 {name: 'n1'})-[:R]->({name: 'n2'})-[:R]->({name: 'n3'})-[:R]->({name: 'n4'})-[:R]->({name: 'n5'})-[:R]->({name: 'n6'})
      """
    When executing query:
      """
      MATCH (s {name: 'n1'})-[*5..5]->(x) RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'n6' |
    And no side effects
  Scenario: Fail when using property access on primitive type
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})
      """
    When executing query:
      """
      MATCH (n:A) WITH n.name AS x RETURN x.prop AS y
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Do not fail when evaluating predicates with illegal operations if the OR'd predicate evaluates to true
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A', num: 1})
      """
    When executing query:
      """
      MATCH (n:A) WHERE true OR n.num.foo = 1 RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'A'  |
    And no side effects

  Scenario: Counting rows after MATCH, MERGE, OPTIONAL MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (:X), (:Y)
      """
    When executing query:
      """
      MATCH (a:X)
      MERGE (b:Y)
      WITH a, b
      OPTIONAL MATCH (c:Z)
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |
    And no side effects
