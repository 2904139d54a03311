Feature: FunctionsAcceptance

  Scenario: String functions
    Given any graph
    When executing query:
      """
      RETURN toUpper('ab') AS u, toLower('AB') AS d,
             substring('hello', 1, 3) AS s, size('hello') AS n,
             reverse('ab') AS r, trim('  x  ') AS t
      """
    Then the result should be, in any order:
      | u    | d    | s     | n | r    | t   |
      | 'AB' | 'ab' | 'ell' | 5 | 'ba' | 'x' |
    And no side effects

  Scenario: String predicates
    Given any graph
    When executing query:
      """
      RETURN 'hello' STARTS WITH 'he' AS a, 'hello' ENDS WITH 'lo' AS b,
             'hello' CONTAINS 'ell' AS c, 'hello' =~ 'h.*' AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | true | true | true | true |
    And no side effects

  Scenario: Split and replace
    Given any graph
    When executing query:
      """
      RETURN split('a,b,c', ',') AS parts, replace('aba', 'a', 'x') AS rep
      """
    Then the result should be, in any order:
      | parts           | rep   |
      | ['a', 'b', 'c'] | 'xbx' |
    And no side effects

  Scenario: Numeric functions
    Given any graph
    When executing query:
      """
      RETURN abs(-3) AS a, sign(-3) AS s, round(2.5) AS r,
             floor(2.9) AS f, ceil(2.1) AS c, sqrt(16.0) AS q
      """
    Then the result should be, in any order:
      | a | s  | r   | f   | c   | q   |
      | 3 | -1 | 3.0 | 2.0 | 3.0 | 4.0 |
    And no side effects

  Scenario: Conversion functions
    Given any graph
    When executing query:
      """
      RETURN toInteger('42') AS i, toFloat('2.5') AS f, toString(7) AS s,
             toBoolean('true') AS b
      """
    Then the result should be, in any order:
      | i  | f   | s   | b    |
      | 42 | 2.5 | '7' | true |
    And no side effects

  Scenario: Conversions of unparseable strings are null
    Given any graph
    When executing query:
      """
      RETURN toBoolean('x') AS b, toInteger('abc') AS i, toFloat('z') AS f
      """
    Then the result should be, in any order:
      | b    | i    | f    |
      | null | null | null |
    And no side effects

  Scenario: Meta functions on entities
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'})-[:KNOWS {w: 1}]->(:B {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:A)-[r]->(b)
      RETURN labels(a) AS l, type(r) AS t, keys(r) AS rk
      """
    Then the result should be, in any order:
      | l     | t       | rk    |
      | ['A'] | 'KNOWS' | ['w'] |
    And no side effects

  Scenario: Coalesce picks the first non-null
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N)
      """
    When executing query:
      """
      MATCH (n:N) RETURN coalesce(n.x, -1) AS x
      """
    Then the result should be, in any order:
      | x  |
      | 1  |
      | -1 |
    And no side effects

  Scenario: Exists on a property
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N)
      """
    When executing query:
      """
      MATCH (n:N) WHERE exists(n.x) RETURN n.x AS x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
    And no side effects

  Scenario: Properties function renders the property map
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a', num: 1})
      """
    When executing query:
      """
      MATCH (a:A) RETURN properties(a) AS m
      """
    Then the result should be, in any order:
      | m                      |
      | {name: 'a', num: 1}    |
    And no side effects

  Scenario: Functions should return null if they get path containing unbound
    Given an empty graph
    And having executed:
      """
      CREATE (:Start)
      """
    When executing query:
      """
      MATCH (a:Start)
      OPTIONAL MATCH p = (a)-[r]->()
      RETURN length(nodes(p)) AS nodes, length(relationships(p)) AS rels,
             type(r) AS t
      """
    Then the result should be, in any order:
      | nodes | rels | t    |
      | null  | null | null |
    And no side effects

  Scenario: `type()` handling Any type
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:T1]->(:B), (:B)-[:T2]->(:C)
      """
    When executing query:
      """
      MATCH ()-[r]->()
      WITH r AS anything
      RETURN type(anything) AS t
      """
    Then the result should be, in any order:
      | t    |
      | 'T1' |
      | 'T2' |
    And no side effects

  Scenario: `labels()` should accept type Any
    Given an empty graph
    And having executed:
      """
      CREATE (:Foo), (:Foo:Bar)
      """
    When executing query:
      """
      MATCH (a)
      WITH a AS anything
      RETURN labels(anything) AS l
      """
    Then the result should be, ignoring element order for lists:
      | l              |
      | ['Foo']        |
      | ['Foo', 'Bar'] |
    And no side effects
  Scenario: `type()` failing on invalid arguments #1
    Given any graph
    When executing query:
      """
      RETURN type(1) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `type()` failing on invalid arguments #2
    Given any graph
    When executing query:
      """
      RETURN type('s') AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `type()` failing on invalid arguments #3
    Given any graph
    When executing query:
      """
      RETURN type([1]) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `type()` failing on invalid arguments #4
    Given any graph
    When executing query:
      """
      RETURN type({a: 1}) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `type()` failing on invalid arguments #5
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})
      """
    When executing query:
      """
      MATCH (n:A) RETURN type(n) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `percentileCont()` failing on bad arguments #1
    Given an empty graph
    And having executed:
      """
      CREATE (:N {num: 1}), (:N {num: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN percentileCont(n.num, 1.5) AS p
      """
    Then an ArgumentError should be raised at compile time
    And no side effects

  Scenario: `percentileCont()` failing on bad arguments #2
    Given an empty graph
    And having executed:
      """
      CREATE (:N {num: 1}), (:N {num: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN percentileCont(n.num, -0.5) AS p
      """
    Then an ArgumentError should be raised at compile time
    And no side effects

  Scenario: `percentileCont()` failing on bad arguments #3
    Given an empty graph
    And having executed:
      """
      CREATE (:N {num: 1}), (:N {num: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN percentileCont(n.num, 100) AS p
      """
    Then an ArgumentError should be raised at compile time
    And no side effects

  Scenario: `percentileDisc()` failing on bad arguments #1
    Given an empty graph
    And having executed:
      """
      CREATE (:N {num: 1}), (:N {num: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN percentileDisc(n.num, 1.5) AS p
      """
    Then an ArgumentError should be raised at compile time
    And no side effects

  Scenario: `percentileDisc()` failing on bad arguments #2
    Given an empty graph
    And having executed:
      """
      CREATE (:N {num: 1}), (:N {num: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN percentileDisc(n.num, -0.5) AS p
      """
    Then an ArgumentError should be raised at compile time
    And no side effects

  Scenario: `percentileDisc()` failing on bad arguments #3
    Given an empty graph
    And having executed:
      """
      CREATE (:N {num: 1}), (:N {num: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN percentileDisc(n.num, 100) AS p
      """
    Then an ArgumentError should be raised at compile time
    And no side effects

  Scenario: `percentileDisc()` failing in more involved query
    Given an empty graph
    And having executed:
      """
      CREATE (:N {num: 1}), (:N {num: 2}), (:N {num: 3})
      """
    When executing query:
      """
      MATCH (n:N) WITH n ORDER BY n.num LIMIT 2
      RETURN percentileDisc(n.num, 10.0) AS p
      """
    Then an ArgumentError should be raised at compile time
    And no side effects

  Scenario: `properties()` failing on an integer literal
    Given any graph
    When executing query:
      """
      RETURN properties(1) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `properties()` failing on a string literal
    Given any graph
    When executing query:
      """
      RETURN properties('foo') AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `properties()` failing on a list of booleans
    Given any graph
    When executing query:
      """
      RETURN properties([true, false]) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `labels()` failing on a path
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})-[:X]->(:B)
      """
    When executing query:
      """
      MATCH p = (a:A)-->() RETURN labels(p) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `labels()` failing on invalid arguments
    Given any graph
    When executing query:
      """
      RETURN labels(1) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects
