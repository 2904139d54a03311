Feature: MatchAcceptance

  Scenario: Return single node
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'})
      """
    When executing query:
      """
      MATCH (n) RETURN n
      """
    Then the result should be, in any order:
      | n                |
      | (:A {name: 'a'}) |
    And no side effects

  Scenario: Match on an empty graph returns nothing
    Given an empty graph
    When executing query:
      """
      MATCH (n) RETURN n
      """
    Then the result should be empty
    And no side effects

  Scenario: Filter nodes by label
    Given an empty graph
    And having executed:
      """
      CREATE (:A {num: 1}), (:B {num: 2}), (:A:B {num: 3})
      """
    When executing query:
      """
      MATCH (n:A) RETURN n.num AS num
      """
    Then the result should be, in any order:
      | num |
      | 1   |
      | 3   |
    And no side effects

  Scenario: Match node and relationship with properties
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'x'})-[:KNOWS {since: 2000}]->(b:P {name: 'y'})
      """
    When executing query:
      """
      MATCH (a)-[r:KNOWS]->(b) RETURN a, r, b
      """
    Then the result should be, in any order:
      | a                 | r                       | b                 |
      | (:P {name: 'x'})  | [:KNOWS {since: 2000}]  | (:P {name: 'y'})  |
    And no side effects

  Scenario: Undirected match counts both orientations
    Given an empty graph
    And having executed:
      """
      CREATE (a:X {v: 1})-[:R]->(b:X {v: 2}), (b)-[:R]->(c:X {v: 3})
      """
    When executing query:
      """
      MATCH (m:X)--(o:X) WHERE m.v = 2 RETURN o.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 3 |
    And no side effects
