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
