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
