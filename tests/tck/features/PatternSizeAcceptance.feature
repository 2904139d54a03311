Feature: PatternSizeAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'a'}), (b:B {name: 'b'}), (c:C {name: 'c'}),
             (a)-[:KNOWS]->(b), (b)-[:KNOWS]->(c)
      """

  Scenario: Size of a pattern expression counts matches
    When executing query:
      """
      MATCH (n) RETURN n.name AS n, size((n)-[:KNOWS]->()) AS c
      """
    Then the result should be, in any order:
      | n   | c |
      | 'a' | 1 |
      | 'b' | 1 |
      | 'c' | 0 |
    And no side effects

  Scenario: Size of a pattern expression in WHERE
    When executing query:
      """
      MATCH (n) WHERE size((n)-[:KNOWS]->()) = 1 RETURN n.name AS r
      """
    Then the result should be, in any order:
      | r   |
      | 'a' |
      | 'b' |
    And no side effects

  Scenario: Exists with a variable length pattern
    When executing query:
      """
      MATCH (a:A) WHERE exists((a)-[*1..2]->()) RETURN a.name AS r
      """
    Then the result should be, in any order:
      | r   |
      | 'a' |
    And no side effects

  Scenario: isEmpty on lists and strings
    Given any graph
    When executing query:
      """
      RETURN isEmpty([]) AS a, isEmpty('x') AS b, isEmpty('') AS c
      """
    Then the result should be, in any order:
      | a    | b     | c    |
      | true | false | true |
    And no side effects

  Scenario: Negated pattern predicate in a projection
    When executing query:
      """
      MATCH (n) RETURN n.name AS n, NOT exists((n)-[:KNOWS]->()) AS sink
      """
    Then the result should be, in any order:
      | n   | sink  |
      | 'a' | false |
      | 'b' | false |
      | 'c' | true  |
    And no side effects
