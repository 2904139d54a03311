Feature: AggregationNulls

  Scenario: Aggregates over an empty match
    Given an empty graph
    And having executed:
      """
      CREATE (:X)
      """
    When executing query:
      """
      MATCH (q:Nope) RETURN count(q) AS c, sum(q.x) AS s,
             size(collect(q.x)) AS l
      """
    Then the result should be, in any order:
      | c | s | l |
      | 0 | 0 | 0 |
    And no side effects

  Scenario: Sum of all nulls is zero
    Given any graph
    When executing query:
      """
      UNWIND [null, null] AS x RETURN sum(x) AS s
      """
    Then the result should be, in any order:
      | s |
      | 0 |
    And no side effects

  Scenario: Min and max skip nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N {x: 4}), (:N)
      """
    When executing query:
      """
      MATCH (n:N) RETURN min(n.x) AS lo, max(n.x) AS hi
      """
    Then the result should be, in any order:
      | lo | hi |
      | 1  | 4  |
    And no side effects
