Feature: VarLengthAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:V {n: 'a'}), (b:V {n: 'b'}), (c:V {n: 'c'}), (d:V {n: 'd'}),
             (a)-[:K {w: 1}]->(b), (b)-[:K {w: 2}]->(c), (b)-[:K {w: 1}]->(d)
      """

  Scenario: Fixed range one to two hops
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*1..2]->(t) RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Exact length two
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*2..2]->(t) RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Unbounded upper end
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*]->(t) RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Inline property map filters every hop
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*1..2 {w: 1}]->(x) RETURN x.n AS x
      """
    Then the result should be, in any order:
      | x   |
      | 'b' |
      | 'd' |
    And no side effects

  Scenario: Zero length includes the start node
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*0..1]->(t) RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'a' |
      | 'b' |
    And no side effects

  Scenario: Property access on members of a bound relationship list
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[rs:K*2..2]->(t) RETURN [r IN rs | r.w] AS ws
      """
    Then the result should be, in any order:
      | ws     |
      | [1, 2] |
      | [1, 1] |
    And no side effects

  Scenario: Quantifiers and comprehensions over var-length path elements
    When executing query:
      """
      MATCH p = (a:V {n: 'a'})-[:K*1..2]->(t)
      WHERE all(r IN relationships(p) WHERE r.w >= 1)
      RETURN t.n AS t, [x IN nodes(p) | x.n] AS ns
      """
    Then the result should be, in any order:
      | t   | ns              |
      | 'b' | ['a', 'b']      |
      | 'c' | ['a', 'b', 'c'] |
      | 'd' | ['a', 'b', 'd'] |
    And no side effects

  Scenario: Handling unbounded variable length match
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*]->(t) RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Handling explicitly unbounded variable length match
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*..]->(t) RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Handling lower bounded variable length match 1
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*1..]->(t) RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Handling lower bounded variable length match 2
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*2..]->(t) RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Handling lower bounded variable length match 3
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*3..]->(t) RETURN t.n AS t
      """
    Then the result should be empty
    And no side effects

  Scenario: Handling a variable length relationship and a standard relationship in chain, zero length 1
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*0..0]->(b)-[:K]->(c) RETURN c.n AS c
      """
    Then the result should be, in any order:
      | c   |
      | 'b' |
    And no side effects

  Scenario: Handling a variable length relationship and a standard relationship in chain, zero length 2
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K]->(b)-[:K*0..0]->(c) RETURN c.n AS c
      """
    Then the result should be, in any order:
      | c   |
      | 'b' |
    And no side effects

  Scenario: Handling a variable length relationship and a standard relationship in chain, single length 1
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*1..1]->(b)-[:K]->(c) RETURN c.n AS c
      """
    Then the result should be, in any order:
      | c   |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Handling a variable length relationship and a standard relationship in chain, single length 2
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K]->(b)-[:K*1..1]->(c) RETURN c.n AS c
      """
    Then the result should be, in any order:
      | c   |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Handling a variable length relationship and a standard relationship in chain, longer 1
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*1..2]->(b)-[:K]->(c) RETURN c.n AS c
      """
    Then the result should be, in any order:
      | c   |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Handling a variable length relationship and a standard relationship in chain, longer 2
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K]->(x)-[:K*1..2]->(c) RETURN c.n AS c
      """
    Then the result should be, in any order:
      | c   |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Handling a variable length relationship and a standard relationship in chain, longer 3
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*0..2]->(x)-[:K]->(c) RETURN c.n AS c
      """
    Then the result should be, in any order:
      | c   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Handling mixed relationship patterns and directions 1
    When executing query:
      """
      MATCH (x)<-[:K*1..2]-(a:V {n: 'a'}) RETURN x.n AS x
      """
    Then the result should be, in any order:
      | x   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Handling mixed relationship patterns and directions 2
    When executing query:
      """
      MATCH (c:V {n: 'c'})<-[:K*1..2]-(x) RETURN x.n AS x
      """
    Then the result should be, in any order:
      | x   |
      | 'a' |
      | 'b' |
    And no side effects

  Scenario: Handling mixed relationship patterns 1
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*0..1]->(x)-[:K*1..1]->(t) RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Handling mixed relationship patterns 2
    When executing query:
      """
      MATCH (a:V {n: 'a'})-[:K*1..1]->(x)-[:K*0..2]->(t) RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects
  Scenario: Fail when asterisk operator is missing
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:T]->(:B)
      """
    When executing query:
      """
      MATCH (a)-[:T1..2]->(b) RETURN a
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Fail on negative bound
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:T]->(:B)
      """
    When executing query:
      """
      MATCH (a)-[:T*-2]->(b) RETURN a
      """
    Then a SyntaxError should be raised at compile time
    And no side effects
