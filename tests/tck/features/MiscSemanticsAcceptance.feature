Feature: MiscSemanticsAcceptance

  Scenario: Float equality is exact
    Given any graph
    When executing query:
      """
      RETURN 0.1 + 0.2 = 0.3 AS r
      """
    Then the result should be, in any order:
      | r     |
      | false |
    And no side effects

  Scenario: Quantifiers over empty lists
    Given any graph
    When executing query:
      """
      RETURN any(x IN [] WHERE x) AS a, all(x IN [] WHERE x) AS b
      """
    Then the result should be, in any order:
      | a     | b    |
      | false | true |
    And no side effects

  Scenario: DISTINCT treats null as a value
    Given any graph
    When executing query:
      """
      UNWIND [1, null, 1, null] AS x RETURN DISTINCT x AS x
      """
    Then the result should be, in any order:
      | x    |
      | 1    |
      | null |
    And no side effects

  Scenario: WITH may shadow its own alias
    Given any graph
    When executing query:
      """
      WITH 1 AS x WITH x + 1 AS x RETURN x
      """
    Then the result should be, in any order:
      | x |
      | 2 |
    And no side effects

  Scenario: Three part UNION dedupes across all parts
    Given any graph
    When executing query:
      """
      RETURN 1 AS x UNION RETURN 2 AS x UNION RETURN 1 AS x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
      | 2 |
    And no side effects

  Scenario: LIMIT zero returns nothing
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1})
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.x AS x LIMIT 0
      """
    Then the result should be empty
    And no side effects

  Scenario: SKIP beyond the row count returns nothing
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1})
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.x AS x SKIP 10
      """
    Then the result should be empty
    And no side effects

  Scenario: Map subscript with a null key is null
    Given any graph
    When executing query:
      """
      RETURN {a: 1}[null] AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects

  Scenario: Split delimiter is literal not regex
    Given any graph
    When executing query:
      """
      RETURN split('a.b.c', '.') AS r
      """
    Then the result should be, in any order:
      | r               |
      | ['a', 'b', 'c'] |
    And no side effects

  Scenario: Descending range
    Given any graph
    When executing query:
      """
      RETURN range(3, 0, -1) AS r
      """
    Then the result should be, in any order:
      | r            |
      | [3, 2, 1, 0] |
    And no side effects

  Scenario: SKIP and LIMIT accept constant expressions
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N {x: 2}), (:N {x: 3}), (:N {x: 4})
      """
    When executing query:
      """
      MATCH (n:N) RETURN n.x AS x ORDER BY x SKIP 1 + 0 LIMIT 4 / 2
      """
    Then the result should be, in order:
      | x |
      | 2 |
      | 3 |
    And no side effects
