Feature: AggregationAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N {x: 2}), (:N {x: 3}), (:N {x: 4}), (:N)
      """

  Scenario: Count star versus count of a property
    When executing query:
      """
      MATCH (n:N) RETURN count(*) AS all_rows, count(n.x) AS non_null
      """
    Then the result should be, in any order:
      | all_rows | non_null |
      | 5        | 4        |
    And no side effects

  Scenario: Sum min max avg over a column with nulls
    When executing query:
      """
      MATCH (n:N)
      RETURN sum(n.x) AS s, min(n.x) AS lo, max(n.x) AS hi, avg(n.x) AS a
      """
    Then the result should be, in any order:
      | s  | lo | hi | a   |
      | 10 | 1  | 4  | 2.5 |
    And no side effects

  Scenario: Collect skips nulls
    When executing query:
      """
      MATCH (n:N) RETURN size(collect(n.x)) AS c
      """
    Then the result should be, in any order:
      | c |
      | 4 |
    And no side effects

  Scenario: Collect produces a list, order-insensitive
    When executing query:
      """
      MATCH (n:N) WHERE n.x IS NOT NULL RETURN collect(n.x) AS xs
      """
    Then the result should be, in any order, ignoring element order for lists:
      | xs           |
      | [1, 2, 3, 4] |
    And no side effects

  Scenario: Aggregation over an empty match is a single zero row
    When executing query:
      """
      MATCH (n:Zzz) RETURN count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |
    And no side effects

  Scenario: Grouping key with null groups together
    When executing query:
      """
      MATCH (n:N)
      WITH CASE WHEN n.x <= 2 THEN n.x ELSE null END AS k
      RETURN k, count(*) AS c
      """
    Then the result should be, in any order:
      | k    | c |
      | 1    | 1 |
      | 2    | 1 |
      | null | 3 |
    And no side effects

  Scenario: Count distinct
    Given an empty graph
    And having executed:
      """
      CREATE (a:P), (b:P), (c:P),
             (a)-[:KNOWS]->(b), (b)-[:KNOWS]->(c)
      """
    When executing query:
      """
      MATCH ()-[r:KNOWS]->() RETURN count(DISTINCT type(r)) AS t
      """
    Then the result should be, in any order:
      | t |
      | 1 |
    And no side effects

  Scenario: Standard deviation of a known sample
    Given an empty graph
    And having executed:
      """
      CREATE (:V {x: 2.0}), (:V {x: 4.0}), (:V {x: 6.0})
      """
    When executing query:
      """
      MATCH (v:V) RETURN stDev(v.x) AS sd
      """
    Then the result should be, in any order:
      | sd  |
      | 2.0 |
    And no side effects

  Scenario: Percentiles over a group
    Given an empty graph
    And having executed:
      """
      CREATE (:V {x: 1.0}), (:V {x: 2.0}), (:V {x: 3.0}), (:V {x: 4.0})
      """
    When executing query:
      """
      MATCH (v:V)
      RETURN percentileDisc(v.x, 0.5) AS pd, percentileCont(v.x, 0.5) AS pc
      """
    Then the result should be, in any order:
      | pd  | pc  |
      | 2.0 | 2.5 |
    And no side effects

  Scenario: Min and max over strings
    Given an empty graph
    And having executed:
      """
      CREATE (:S {v: 'b'}), (:S {v: 'a'}), (:S {v: 'c'})
      """
    When executing query:
      """
      MATCH (s:S) RETURN min(s.v) AS lo, max(s.v) AS hi
      """
    Then the result should be, in any order:
      | lo  | hi  |
      | 'a' | 'c' |
    And no side effects

  Scenario: Handle aggregation on functions
    Given an empty graph
    And having executed:
      """
      CREATE (a:L), (b1), (b2), (a)-[:A]->(b1), (a)-[:A]->(b2)
      """
    When executing query:
      """
      MATCH p = (a:L)-[*]->(b)
      RETURN b, avg(length(p)) AS avg
      """
    Then the result should be, in any order:
      | b  | avg |
      | () | 1.0 |
      | () | 1.0 |
    And no side effects

  Scenario: Aggregates in aggregates
    Given any graph
    When executing query:
      """
      RETURN count(count(*)) AS c
      """
    Then a SyntaxError should be raised at compile time: NestedAggregation
    And no side effects

  Scenario: Multiple aggregates on same variable
    Given an empty graph
    And having executed:
      """
      CREATE ()
      """
    When executing query:
      """
      MATCH (n)
      RETURN count(n) AS a, collect(n) AS b
      """
    Then the result should be, in any order:
      | a | b    |
      | 1 | [()] |
    And no side effects

  Scenario: Aggregation of named paths
    Given an empty graph
    And having executed:
      """
      CREATE (a:A), (b:B), (c:C), (d:D), (e:E), (f:F),
             (a)-[:R]->(b), (c)-[:R]->(d), (d)-[:R]->(e), (e)-[:R]->(f)
      """
    When executing query:
      """
      MATCH p = (a)-[*]->(b)
      RETURN collect(length(p)) AS paths, length(p) AS l
      ORDER BY l
      """
    Then the result should be, ignoring element order for lists:
      | paths        | l |
      | [1, 1, 1, 1] | 1 |
      | [2, 2]       | 2 |
      | [3]          | 3 |
    And no side effects

  Scenario: Aggregation with `min()`
    Given an empty graph
    And having executed:
      """
      CREATE (a:T {name: 'a'}), (b:T {name: 'b'}), (c:T {name: 'c'}),
             (a)-[:R]->(b), (b)-[:R]->(c)
      """
    When executing query:
      """
      MATCH p = (a:T {name: 'a'})-[:R*]->(other:T)
      WHERE other <> a
      WITH a, other, min(length(p)) AS len
      RETURN a.name AS name, collect(other.name) AS others, len
      """
    Then the result should be, ignoring element order for lists:
      | name | others     | len |
      | 'a'  | ['b']      | 1   |
      | 'a'  | ['c']      | 2   |
    And no side effects

  Scenario: Handle subexpression in aggregation also occurring as standalone expression with nested aggregation in a literal map
    Given an empty graph
    And having executed:
      """
      CREATE (:A), (:B {prop: 42})
      """
    When executing query:
      """
      MATCH (a:A), (b:B)
      RETURN coalesce(a.prop, b.prop) AS foo,
             b.prop AS bar,
             {y: count(b)} AS baz
      """
    Then the result should be, in any order:
      | foo | bar | baz    |
      | 42  | 42  | {y: 1} |
    And no side effects

  Scenario: Projection during aggregation in WITH before MERGE and after WITH with predicate
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS i
      WITH i
      WHERE i > 1
      WITH count(i) AS c
      MERGE (n:N {v: c})
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 1 |
