Feature: EqualityAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N {x: 2}), (:N {x: 3}), (:N {x: 4}), (:N)
      """

  Scenario: Equality across incomparable types is false
    When executing query:
      """
      MATCH (n:N) WHERE n.x = '1' RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |
    And no side effects

  Scenario: Inequality across incomparable types is true
    When executing query:
      """
      MATCH (n:N) WHERE n.x <> '1' RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 4 |
    And no side effects

  Scenario: Equality with a null operand is null
    When executing query:
      """
      MATCH (n:N) WHERE n.x IS NULL AND (n.x = 'a') IS NULL
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |
    And no side effects

  Scenario: List equality is element-wise
    Given any graph
    When executing query:
      """
      RETURN [1, 2] = [1, 2] AS eq, [1, 2] = [2, 1] AS ne
      """
    Then the result should be, in any order:
      | eq   | ne    |
      | true | false |
    And no side effects

  Scenario: Reserved property names on relationships stay properties
    Given an empty graph
    And having executed:
      """
      CREATE (x {n: 'x'})-[:R {id: 7, source: 8, target: 9}]->(y {n: 'y'})
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN r.id AS i, r.source AS s, r.target AS t
      """
    Then the result should be, in any order:
      | i | s | t |
      | 7 | 8 | 9 |
    And no side effects
