Feature: LabelAndTypeAcceptance

  Scenario: Conjunctive label pattern matches only both-labeled nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:A:B {name: 'ab'}), (:A {name: 'a'}), (:B {name: 'b'})
      """
    When executing query:
      """
      MATCH (n:A:B) RETURN n.name AS r
      """
    Then the result should be, in any order:
      | r    |
      | 'ab' |
    And no side effects

  Scenario: Relationship type alternation
    Given an empty graph
    And having executed:
      """
      CREATE (a:P)-[:KNOWS]->(b:P), (b)-[:LIKES]->(c:P), (c)-[:HATES]->(a)
      """
    When executing query:
      """
      MATCH ()-[r:KNOWS|LIKES]->() RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |
    And no side effects

  Scenario: Rebound variable must satisfy both labels
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'}), (:B {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:A) MATCH (a:B) RETURN a.name AS r
      """
    Then the result should be empty
    And no side effects

  Scenario: Anonymous fixed-length variable expand
    Given an empty graph
    And having executed:
      """
      CREATE (:X {n: 'a'})-[:K]->({n: 'b'})-[:K]->({n: 'c'})
      """
    When executing query:
      """
      MATCH (:X)-[*2]->(z) RETURN z.n AS r
      """
    Then the result should be, in any order:
      | r   |
      | 'c' |
    And no side effects

  Scenario: WITH star keeps all variables in scope
    Given an empty graph
    And having executed:
      """
      CREATE (:A {num: 1})
      """
    When executing query:
      """
      MATCH (a:A) WITH * RETURN a.num AS r
      """
    Then the result should be, in any order:
      | r |
      | 1 |
    And no side effects
