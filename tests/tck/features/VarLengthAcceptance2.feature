Feature: VarLengthAcceptance2

  Scenario: Handling relationships that are already bound in variable length paths
    Given an empty graph
    And having executed:
      """
      CREATE (a:V {n: 'a'}), (b:V {n: 'b'}), (c:V {n: 'c'}), (d:V {n: 'd'}),
             (a)-[:K]->(b), (b)-[:K]->(c), (b)-[:K]->(d)
      """
    When executing query:
      """
      MATCH (a)-[r:K]->(b) WHERE a.n = 'a'
      MATCH (a)-[rs:K*1..2]->(t) WHERE r IN rs
      RETURN t.n AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects
