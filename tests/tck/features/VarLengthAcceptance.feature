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
