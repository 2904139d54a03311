Feature: OptionalMatchAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:KNOWS]->(b), (b)-[:KNOWS]->(c)
      """

  Scenario: Unmatched optional rows are null padded
    When executing query:
      """
      MATCH (p:P) OPTIONAL MATCH (p)-[:KNOWS]->(x)
      RETURN p.name AS p, x.name AS x
      """
    Then the result should be, in any order:
      | p   | x    |
      | 'a' | 'b'  |
      | 'b' | 'c'  |
      | 'c' | null |
    And no side effects

  Scenario: Optional match as the first clause binds when possible
    When executing query:
      """
      OPTIONAL MATCH (p:P {name: 'a'}) RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
    And no side effects

  Scenario: Optional match on a missing label yields one null row
    When executing query:
      """
      OPTIONAL MATCH (z:Zzz) RETURN z
      """
    Then the result should be, in any order:
      | z    |
      | null |
    And no side effects

  Scenario: Aggregation counts optional nulls as zero
    When executing query:
      """
      MATCH (p:P) OPTIONAL MATCH (p)-[:KNOWS]->(x)
      RETURN p.name AS p, count(x) AS c
      """
    Then the result should be, in any order:
      | p   | c |
      | 'a' | 1 |
      | 'b' | 1 |
      | 'c' | 0 |
    And no side effects

  Scenario: Optional match with WHERE inside the optional part
    When executing query:
      """
      MATCH (p:P) OPTIONAL MATCH (p)-[:KNOWS]->(x) WHERE x.name = 'c'
      RETURN p.name AS p, x.name AS x
      """
    Then the result should be, in any order:
      | p   | x    |
      | 'a' | null |
      | 'b' | 'c'  |
      | 'c' | null |
    And no side effects

  Scenario: Optional match property map referencing an outer variable
    When executing query:
      """
      UNWIND ['a', 'zz'] AS nm
      OPTIONAL MATCH (v:P {name: nm})
      RETURN nm, v.name AS vn
      """
    Then the result should be, in any order:
      | nm   | vn   |
      | 'a'  | 'a'  |
      | 'zz' | null |
    And no side effects

  Scenario: Optional match WHERE referencing an outer non-pattern variable
    When executing query:
      """
      MATCH (a:P {name: 'a'})
      UNWIND [0, 1] AS t
      OPTIONAL MATCH (a)-[r:KNOWS]->(y) WHERE id(r) >= t
      RETURN t, y.name AS y
      """
    Then the result should be, in any order:
      | t | y   |
      | 0 | 'b' |
      | 1 | 'b' |
    And no side effects

  Scenario: Named paths in optional matches
    Given an empty graph
    And having executed:
      """
      CREATE (a:A)-[:X]->(b:B)
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH p = (a)-[:Y]->(b:B)
      RETURN p
      """
    Then the result should be, in any order:
      | p    |
      | null |
    And no side effects

  Scenario: Named paths inside optional matches with node predicates
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'A'}), (b:B {name: 'B'})
      """
    When executing query:
      """
      MATCH (a:A), (b:B)
      OPTIONAL MATCH p = (a)-[:X]->(b)
      RETURN p
      """
    Then the result should be, in any order:
      | p    |
      | null |
    And no side effects

  Scenario: Variable length optional relationships
    Given an empty graph
    And having executed:
      """
      CREATE (s:Single), (a:A), (b:B), (c:C),
             (s)-[:REL]->(a), (s)-[:REL]->(b), (a)-[:REL]->(c), (b)-[:LOOP]->(b)
      """
    When executing query:
      """
      MATCH (a:Single)
      OPTIONAL MATCH (a)-[*]->(b)
      RETURN b.nonexistent AS b, labels(b) AS l
      """
    Then the result should be, in any order:
      | b    | l     |
      | null | ['A'] |
      | null | ['B'] |
      | null | ['B'] |
      | null | ['C'] |
    And no side effects

  Scenario: Variable length optional relationships with length predicates
    Given an empty graph
    And having executed:
      """
      CREATE (s:Single), (a:A), (b:B), (s)-[:REL]->(a), (a)-[:REL]->(b)
      """
    When executing query:
      """
      MATCH (a:Single)
      OPTIONAL MATCH (a)-[*3..]->(b)
      RETURN labels(b) AS l
      """
    Then the result should be, in any order:
      | l    |
      | null |
    And no side effects

  Scenario: Variable length optional relationships with bound nodes
    Given an empty graph
    And having executed:
      """
      CREATE (s:Single), (c:C), (s)-[:REL]->(:A)-[:REL]->(c)
      """
    When executing query:
      """
      MATCH (a:Single), (x:C)
      OPTIONAL MATCH (a)-[*]->(x)
      RETURN labels(x) AS l
      """
    Then the result should be, in any order:
      | l     |
      | ['C'] |
    And no side effects

  Scenario: Variable length optional relationships with bound nodes, no matches
    Given an empty graph
    And having executed:
      """
      CREATE (a:Single), (x:C)
      """
    When executing query:
      """
      MATCH (a:Single), (x:C)
      OPTIONAL MATCH p = (a)-[*]->(x)
      RETURN p
      """
    Then the result should be, in any order:
      | p    |
      | null |
    And no side effects
