Feature: Aggregation

  Scenario: `max()` over mixed numeric values
    Given any graph
    When executing query:
      """
      UNWIND [1, 2.0, 5, 3.2, 0.1] AS x
      RETURN max(x) AS max
      """
    Then the result should be, in any order:
      | max |
      | 5.0 |
    And no side effects

  Scenario: `min()` over mixed numeric values
    Given any graph
    When executing query:
      """
      UNWIND [1, 2.0, 5, 3.2, 0.1] AS x
      RETURN min(x) AS min
      """
    Then the result should be, in any order:
      | min |
      | 0.1 |
    And no side effects

  Scenario: `count()` with `DISTINCT` and `null`
    Given any graph
    When executing query:
      """
      UNWIND [1, 1, null, 2] AS x
      RETURN count(DISTINCT x) AS cd, count(x) AS c, count(*) AS star
      """
    Then the result should be, in any order:
      | cd | c | star |
      | 2  | 3 | 4    |
    And no side effects
  Scenario: `min()` over mixed values
    Given any graph
    When executing query:
      """
      UNWIND [1, 'a'] AS x RETURN min(x) AS m
      """
    Then the result should be, in any order:
      | m |
      | 1 |
    And no side effects

  Scenario: `max()` over mixed values
    Given any graph
    When executing query:
      """
      UNWIND [1, 'a'] AS x RETURN max(x) AS m
      """
    Then the result should be, in any order:
      | m   |
      | 'a' |
    And no side effects
