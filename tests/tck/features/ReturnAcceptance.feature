Feature: ReturnAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N {x: 2}), (:N {x: 3}), (:N {x: 4}), (:N)
      """

  Scenario: Return a literal expression without a match
    When executing query:
      """
      RETURN 1 + 2 AS x
      """
    Then the result should be, in any order:
      | x |
      | 3 |
    And no side effects

  Scenario: Return distinct property values
    When executing query:
      """
      MATCH (a:N), (b:N) WHERE a.x = b.x RETURN DISTINCT a.x AS x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
      | 2 |
      | 3 |
      | 4 |
    And no side effects

  Scenario: Order by descending with limit
    When executing query:
      """
      MATCH (n:N) WHERE n.x IS NOT NULL
      RETURN n.x AS x ORDER BY n.x DESC LIMIT 2
      """
    Then the result should be, in order:
      | x |
      | 4 |
      | 3 |
    And no side effects

  Scenario: Skip and limit combine after ordering
    When executing query:
      """
      MATCH (n:N) WHERE n.x IS NOT NULL
      RETURN n.x AS x ORDER BY n.x SKIP 1 LIMIT 2
      """
    Then the result should be, in order:
      | x |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Arithmetic operators in the projection
    When executing query:
      """
      MATCH (n:N) WHERE n.x = 3
      RETURN n.x * 2 + 1 AS y, n.x % 2 AS m, n.x ^ 2 AS p
      """
    Then the result should be, in any order:
      | y | m | p   |
      | 7 | 1 | 9.0 |
    And no side effects

  Scenario: Nulls sort last ascending
    When executing query:
      """
      MATCH (n:N) RETURN n.x AS x ORDER BY n.x
      """
    Then the result should be, in order:
      | x    |
      | 1    |
      | 2    |
      | 3    |
      | 4    |
      | null |
    And no side effects

  Scenario: Nulls sort first descending
    When executing query:
      """
      MATCH (n:N) RETURN n.x AS x ORDER BY n.x DESC LIMIT 1
      """
    Then the result should be, in order:
      | x    |
      | null |
    And no side effects

  Scenario: Order by an expression over an alias
    When executing query:
      """
      MATCH (n:N) WHERE n.x IS NOT NULL
      WITH n.x AS x
      RETURN x ORDER BY -x LIMIT 2
      """
    Then the result should be, in order:
      | x |
      | 4 |
      | 3 |
    And no side effects

  Scenario: String concatenation
    When executing query:
      """
      RETURN 'a' + 'b' AS s
      """
    Then the result should be, in any order:
      | s    |
      | 'ab' |
    And no side effects

  Scenario: Hex octal and scientific literals
    When executing query:
      """
      RETURN 0x1F AS h, 0o17 AS o, 1e3 AS e, .5 AS d
      """
    Then the result should be, in any order:
      | h  | o  | e      | d   |
      | 31 | 15 | 1000.0 | 0.5 |
    And no side effects
