Feature: WithAcceptance2

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:M {x: 1, y: 'a'}), (:M {x: 2, y: 'b'}), (:M {x: 3, y: 'a'})
      """

  Scenario: Grouped collect then unwind restores rows
    When executing query:
      """
      MATCH (n:M) WITH n.y AS y, collect(n.x) AS xs UNWIND xs AS x
      RETURN y, x
      """
    Then the result should be, in any order:
      | y   | x |
      | 'a' | 1 |
      | 'a' | 3 |
      | 'b' | 2 |
    And no side effects

  Scenario: Aggregate in WITH feeds a second MATCH
    When executing query:
      """
      MATCH (n:M) WITH max(n.x) AS mx
      MATCH (m:M) WHERE m.x = mx RETURN m.y AS y
      """
    Then the result should be, in any order:
      | y   |
      | 'a' |
    And no side effects

  Scenario: LIMIT in WITH bounds the rematch
    When executing query:
      """
      MATCH (n:M) WITH n LIMIT 2
      MATCH (m:M) WHERE m.x = n.x RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |
    And no side effects

  Scenario: Aggregate inside a larger expression
    When executing query:
      """
      MATCH (n:M) RETURN sum(n.x) / count(*) AS avg_int, count(*) + 1 AS c1
      """
    Then the result should be, in any order:
      | avg_int | c1 |
      | 2       | 4  |
    And no side effects

  Scenario: Unwind a list of maps and project a key
    Given any graph
    When executing query:
      """
      UNWIND [{a: 1}, {a: 2}] AS m RETURN m.a AS a
      """
    Then the result should be, in any order:
      | a |
      | 1 |
      | 2 |
    And no side effects
