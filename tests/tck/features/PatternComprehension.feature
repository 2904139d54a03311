Feature: PatternComprehension

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'a', num: 1}), (b:B {name: 'b', num: 2}),
             (c:C {name: 'c', num: 3}),
             (a)-[:KNOWS {w: 1}]->(b), (b)-[:KNOWS {w: 2}]->(c)
      """

  Scenario: Project neighbor names
    When executing query:
      """
      MATCH (a:A) RETURN [(a)-[:KNOWS]->(b) | b.name] AS l
      """
    Then the result should be, in any order:
      | l     |
      | ['b'] |
    And no side effects

  Scenario: Empty comprehension for an unmatched pattern
    When executing query:
      """
      MATCH (c:C) RETURN [(c)-[:KNOWS]->(x) | x.name] AS l
      """
    Then the result should be, in any order:
      | l  |
      | [] |
    And no side effects

  Scenario: Comprehension predicate filters members
    When executing query:
      """
      MATCH (a:A) RETURN [(a)-[:KNOWS]->(b) WHERE b.num > 5 | b.name] AS l
      """
    Then the result should be, in any order:
      | l  |
      | [] |
    And no side effects

  Scenario: Size of a pattern comprehension is the degree
    When executing query:
      """
      MATCH (n) RETURN n.name AS n, size([(n)-[:KNOWS]->(m) | m.name]) AS deg
      """
    Then the result should be, in any order:
      | n   | deg |
      | 'a' | 1   |
      | 'b' | 1   |
      | 'c' | 0   |
    And no side effects

  Scenario: Returning a pattern comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (a:A), (b:B {x: 1}), (c:B {x: 2}), (a)-[:HAS]->(b), (a)-[:HAS]->(c)
      """
    When executing query:
      """
      MATCH (n:A)
      RETURN [p = (n)-->(b) | b.x] AS ps
      """
    Then the result should be, ignoring element order for lists:
      | ps     |
      | [1, 2] |
    And no side effects

  Scenario: Returning a pattern comprehension with label predicate
    Given an empty graph
    And having executed:
      """
      CREATE (n:A), (m1:B {x: 1}), (m2:C {x: 2}),
             (n)-[:T]->(m1), (n)-[:T]->(m2)
      """
    When executing query:
      """
      MATCH (n:A)
      RETURN [(n)-->(b:B) | b.x] AS x
      """
    Then the result should be, in any order:
      | x   |
      | [1] |
    And no side effects

  Scenario: Returning a pattern comprehension with bound nodes
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'a'})-[:T]->(b:B {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:A), (b:B)
      RETURN [p = (a)-[*]->(b) | p] AS paths
      """
    Then the result should be, in any order:
      | paths                                         |
      | [<(:A {name: 'a'})-[:T]->(:B {name: 'b'})>]   |
    And no side effects

  Scenario: Using a pattern comprehension in a WITH
    Given an empty graph
    And having executed:
      """
      CREATE (a:A), (b:B {x: 1}), (c:B {x: 2}), (a)-[:HAS]->(b), (a)-[:HAS]->(c)
      """
    When executing query:
      """
      MATCH (n:A)-->(b)
      WITH [(n)-->(o:B) | o.x] AS ps, count(b) AS c
      RETURN ps, c
      """
    Then the result should be, ignoring element order for lists:
      | ps     | c |
      | [1, 2] | 2 |
    And no side effects

  Scenario: Using a variable-length pattern comprehension in a WITH
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'a'})-[:T]->(b:B {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:A), (b:B)
      WITH [(a)-[*]->(b) | 1] AS paths, a, b
      RETURN a.name AS a, b.name AS b, size(paths) AS c
      """
    Then the result should be, in any order:
      | a   | b   | c |
      | 'a' | 'b' | 1 |
    And no side effects

  Scenario: Using pattern comprehension in RETURN
    Given an empty graph
    And having executed:
      """
      CREATE (a:Start), (:Start), (b:B), (c:C), (a)-[:T]->(b), (a)-[:T]->(c)
      """
    When executing query:
      """
      MATCH (n:Start)
      RETURN size([(n)-->() | 1]) AS deg ORDER BY deg
      """
    Then the result should be, in order:
      | deg |
      | 0   |
      | 2   |
    And no side effects

  Scenario: Aggregating on pattern comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (a:Start), (:Start), (b:B), (a)-[:T]->(b)
      """
    When executing query:
      """
      MATCH (n:Start)
      RETURN count([(n)-[:T]->() | 1]) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |
    And no side effects

  Scenario: Using pattern comprehension to test existence
    Given an empty graph
    And having executed:
      """
      CREATE (a:X {prop: 1}), (b:X {prop: 2}), (c:Y), (a)-[:T]->(c)
      """
    When executing query:
      """
      MATCH (n:X)
      RETURN n.prop AS prop, size([(n)--() | 1]) > 0 AS b
      """
    Then the result should be, in any order:
      | prop | b     |
      | 1    | true  |
      | 2    | false |
    And no side effects

  Scenario: Pattern comprehension inside list comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (a:A), (b:B {x: 5}), (a)-[:T]->(b)
      """
    When executing query:
      """
      MATCH (n:A)
      RETURN [x IN [(n)-->(b) | b.x] WHERE x > 1 | x * 10] AS r
      """
    Then the result should be, in any order:
      | r    |
      | [50] |
    And no side effects

  Scenario: Get node degree via size of pattern comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (x:X), (x)-[:T]->(), (x)-[:T]->(), (x)-[:T]->()
      """
    When executing query:
      """
      MATCH (a:X)
      RETURN size([(a)-->() | 1]) AS length
      """
    Then the result should be, in any order:
      | length |
      | 3      |
    And no side effects

  Scenario: Get node degree via size of pattern comprehension that specifies a relationship type
    Given an empty graph
    And having executed:
      """
      CREATE (x:X), (x)-[:T]->(), (x)-[:T]->(), (x)-[:OTHER]->()
      """
    When executing query:
      """
      MATCH (a:X)
      RETURN size([(a)-[:T]->() | 1]) AS length
      """
    Then the result should be, in any order:
      | length |
      | 2      |
    And no side effects

  Scenario: Get node degree via size of pattern comprehension that specifies multiple relationship types
    Given an empty graph
    And having executed:
      """
      CREATE (x:X), (x)-[:T]->(), (x)-[:T]->(), (x)-[:OTHER]->()
      """
    When executing query:
      """
      MATCH (a:X)
      RETURN size([(a)-[:T|OTHER]->() | 1]) AS length
      """
    Then the result should be, in any order:
      | length |
      | 3      |
    And no side effects

  Scenario: Introducing new node variable in pattern comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (n:N), (m:M {prop: 'value'}), (n)-[:T]->(m)
      """
    When executing query:
      """
      MATCH (n:N)
      RETURN [(n)-[:T]->(m) | m.prop] AS result
      """
    Then the result should be, in any order:
      | result    |
      | ['value'] |
    And no side effects

  Scenario: Introducing new relationship variable in pattern comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (n:N), (m:M), (n)-[:T {prop: 'value'}]->(m)
      """
    When executing query:
      """
      MATCH (n:N)
      RETURN [(n)-[r:T]->() | r.prop] AS result
      """
    Then the result should be, in any order:
      | result    |
      | ['value'] |
    And no side effects

  Scenario: Pattern comprehension and ORDER BY
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {time: 10}), (b:B {time: 20}), (a)-[:T]->(b)
      """
    When executing query:
      """
      MATCH (liker)
      RETURN [(liker)--() | 1] AS isNew
      ORDER BY liker.time
      """
    Then the result should be, in any order:
      | isNew |
      | [1]   |
      | [1]   |
    And no side effects
