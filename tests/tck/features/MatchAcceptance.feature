Feature: MatchAcceptance

  Scenario: Return single node
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'})
      """
    When executing query:
      """
      MATCH (n) RETURN n
      """
    Then the result should be, in any order:
      | n                |
      | (:A {name: 'a'}) |
    And no side effects

  Scenario: Match on an empty graph returns nothing
    Given an empty graph
    When executing query:
      """
      MATCH (n) RETURN n
      """
    Then the result should be empty
    And no side effects

  Scenario: Filter nodes by label
    Given an empty graph
    And having executed:
      """
      CREATE (:A {num: 1}), (:B {num: 2}), (:A:B {num: 3})
      """
    When executing query:
      """
      MATCH (n:A) RETURN n.num AS num
      """
    Then the result should be, in any order:
      | num |
      | 1   |
      | 3   |
    And no side effects

  Scenario: Match node and relationship with properties
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'x'})-[:KNOWS {since: 2000}]->(b:P {name: 'y'})
      """
    When executing query:
      """
      MATCH (a)-[r:KNOWS]->(b) RETURN a, r, b
      """
    Then the result should be, in any order:
      | a                 | r                       | b                 |
      | (:P {name: 'x'})  | [:KNOWS {since: 2000}]  | (:P {name: 'y'})  |
    And no side effects

  Scenario: Undirected match counts both orientations
    Given an empty graph
    And having executed:
      """
      CREATE (a:X {v: 1})-[:R]->(b:X {v: 2}), (b)-[:R]->(c:X {v: 3})
      """
    When executing query:
      """
      MATCH (m:X)--(o:X) WHERE m.v = 2 RETURN o.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 3 |
    And no side effects

  Scenario: Path query should return results in written order
    Given an empty graph
    And having executed:
      """
      CREATE (:Label1)<-[:TYPE]-(:Label2)
      """
    When executing query:
      """
      MATCH p = (a:Label1)<--(:Label2) RETURN p
      """
    Then the result should be, in any order:
      | p                           |
      | <(:Label1)<-[:TYPE]-(:Label2)> |
    And no side effects

  Scenario: Longer path query should return results in written order
    Given an empty graph
    And having executed:
      """
      CREATE (:Label1)<-[:T1]-(:Label2)-[:T2]->(:Label3)
      """
    When executing query:
      """
      MATCH p = (a:Label1)<--(:Label2)-->(:Label3) RETURN p
      """
    Then the result should be, in any order:
      | p                                              |
      | <(:Label1)<-[:T1]-(:Label2)-[:T2]->(:Label3)>  |
    And no side effects

  Scenario: Return a simple path
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:KNOWS]->(b:B {name: 'B'})
      """
    When executing query:
      """
      MATCH p = (a {name: 'A'})-->(b) RETURN p
      """
    Then the result should be, in any order:
      | p                                             |
      | <(:A {name: 'A'})-[:KNOWS]->(:B {name: 'B'})> |
    And no side effects

  Scenario: Return a three node path
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:KNOWS]->(b:B {name: 'B'})-[:KNOWS]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH p = (a {name: 'A'})-[rel1]->(b)-[rel2]->(c) RETURN p
      """
    Then the result should be, in any order:
      | p                                                                          |
      | <(:A {name: 'A'})-[:KNOWS]->(:B {name: 'B'})-[:KNOWS]->(:C {name: 'C'})>   |
    And no side effects

  Scenario: Do not return anything because path length does not match
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:KNOWS]->(b:B {name: 'B'})
      """
    When executing query:
      """
      MATCH p = (n)-->(x) WHERE length(p) = 10 RETURN x
      """
    Then the result should be empty
    And no side effects

  Scenario: Pass the path length test
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:KNOWS]->(b:B {name: 'B'})
      """
    When executing query:
      """
      MATCH p = (n)-->(x) WHERE length(p) = 1 RETURN x.name AS x
      """
    Then the result should be, in any order:
      | x   |
      | 'B' |
    And no side effects

  Scenario: Return relationships by fetching them from the path - starting from the end
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:REL {value: 1}]->(:B)-[:REL {value: 2}]->(:End)
      """
    When executing query:
      """
      MATCH p = (a)-[:REL*2..2]->(b:End)
      RETURN [r IN relationships(p) | r.value] AS values
      """
    Then the result should be, in any order:
      | values |
      | [1, 2] |
    And no side effects

  Scenario: Return relationships by fetching them from the path
    Given an empty graph
    And having executed:
      """
      CREATE (s:Start)-[:REL {value: 1}]->(:B)-[:REL {value: 2}]->(:C)
      """
    When executing query:
      """
      MATCH p = (a:Start)-[:REL*2..2]->(b)
      RETURN [r IN relationships(p) | r.value] AS values
      """
    Then the result should be, in any order:
      | values |
      | [1, 2] |
    And no side effects

  Scenario: Return relationships by collecting them as a list - wrong way
    Given an empty graph
    And having executed:
      """
      CREATE (s:Start)-[:REL {value: 1}]->(:B)-[:REL {value: 2}]->(:C)
      """
    When executing query:
      """
      MATCH (a:Start)-[r:REL*2..2]->(b)
      RETURN [x IN r | x.value] AS values
      """
    Then the result should be, in any order:
      | values |
      | [1, 2] |
    And no side effects

  Scenario: Return relationships by collecting them as a list
    Given an empty graph
    And having executed:
      """
      CREATE (s:Start)-[:REL {value: 1}]->(:B)-[:REL {value: 2}]->(:End)
      """
    When executing query:
      """
      MATCH (a:Start)-[r:REL*2..2]->(b:End)
      RETURN [x IN r | x.value] AS values
      """
    Then the result should be, in any order:
      | values |
      | [1, 2] |
    And no side effects

  Scenario: Return relationships by collecting them as a list - directed, one way
    Given an empty graph
    And having executed:
      """
      CREATE (a:A)-[:REL {value: 1}]->(b:B)-[:REL {value: 2}]->(c:C)
      """
    When executing query:
      """
      MATCH (a:A)-[r:REL*1..2]->(x)
      RETURN [rel IN r | rel.value] AS values
      """
    Then the result should be, in any order:
      | values |
      | [1]    |
      | [1, 2] |
    And no side effects

  Scenario: Return a var length path
    Given an empty graph
    And having executed:
      """
      CREATE (:Start {name: 'A'})-[:KNOWS {num: 1}]->(:B {name: 'B'})-[:KNOWS {num: 2}]->(:C {name: 'C'})
      """
    When executing query:
      """
      MATCH p = (n {name: 'A'})-[:KNOWS*1..2]->(x) RETURN p
      """
    Then the result should be, in any order:
      | p |
      | <(:Start {name: 'A'})-[:KNOWS {num: 1}]->(:B {name: 'B'})> |
      | <(:Start {name: 'A'})-[:KNOWS {num: 1}]->(:B {name: 'B'})-[:KNOWS {num: 2}]->(:C {name: 'C'})> |
    And no side effects

  Scenario: Return a var length path of length zero
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:REL]->(b:B {name: 'B'})
      """
    When executing query:
      """
      MATCH p = (a:A)-[*0..1]->(b) RETURN p
      """
    Then the result should be, in any order:
      | p                                           |
      | <(:A {name: 'A'})>                          |
      | <(:A {name: 'A'})-[:REL]->(:B {name: 'B'})> |
    And no side effects

  Scenario: Return a named var length path of length zero
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:KNOWS]->(b:B {name: 'B'})-[:FRIEND]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH p = (a {name: 'A'})-[:KNOWS*0..1]->(b)-[:FRIEND*0..1]->(c)
      RETURN p
      """
    Then the result should be, in any order:
      | p |
      | <(:A {name: 'A'})> |
      | <(:A {name: 'A'})-[:KNOWS]->(:B {name: 'B'})> |
      | <(:A {name: 'A'})-[:KNOWS]->(:B {name: 'B'})-[:FRIEND]->(:C {name: 'C'})> |
    And no side effects
  Scenario: Return relationships by collecting them as a list - undirected
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:T {p: 1}]->(b:B {name: 'B'})-[:T {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (b {name: 'B'})-[r*1..1]-(x) RETURN [e IN r | e.p] AS ps
      """
    Then the result should be, in any order:
      | ps  |
      | [1] |
      | [2] |
    And no side effects

  Scenario: Return relationships by collecting them as a list - undirected, starting from one extreme
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:T {p: 1}]->(b:B {name: 'B'})-[:T {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a {name: 'A'})-[r*1..2]-(x) RETURN [e IN r | e.p] AS ps
      """
    Then the result should be, in any order:
      | ps     |
      | [1]    |
      | [1, 2] |
    And no side effects

  Scenario: Return relationships by collecting them as a list - undirected, starting from two extremes
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'})-[:T {p: 1}]->(b:B {name: 'B'})-[:T {p: 2}]->(c:C {name: 'C'})
      """
    When executing query:
      """
      MATCH (a {name: 'A'})-[r*2..2]-(c {name: 'C'}) RETURN [e IN r | e.p] AS ps
      """
    Then the result should be, in any order:
      | ps     |
      | [1, 2] |
    And no side effects
