Feature: ListOperations

  Scenario: Indexing from the front and the back
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3][0] AS hd, [1, 2, 3][-1] AS lst, [1, 2, 3][1..3] AS sl
      """
    Then the result should be, in any order:
      | hd | lst | sl     |
      | 1  | 3   | [2, 3] |
    And no side effects

  Scenario: Out-of-range indexes are null
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3][3] AS a, [1, 2, 3][-4] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: Head last tail size
    Given any graph
    When executing query:
      """
      RETURN head([1, 2, 3]) AS h, last([1, 2, 3]) AS l,
             tail([1, 2, 3]) AS t, size([1, 2, 3]) AS s
      """
    Then the result should be, in any order:
      | h | l | t      | s |
      | 1 | 3 | [2, 3] | 3 |
    And no side effects

  Scenario: List functions on null or empty input
    Given any graph
    When executing query:
      """
      RETURN size(null) AS s, head(null) AS h, head([]) AS he,
             last([]) AS le, tail(null) AS t
      """
    Then the result should be, in any order:
      | s    | h    | he   | le   | t    |
      | null | null | null | null | null |
    And no side effects

  Scenario: List comprehension with filter and projection
    Given any graph
    When executing query:
      """
      RETURN [x IN range(1, 5) WHERE x % 2 = 0 | x * 10] AS xs
      """
    Then the result should be, in any order:
      | xs       |
      | [20, 40] |
    And no side effects

  Scenario: Comprehension keeps nulls out via the predicate
    Given any graph
    When executing query:
      """
      RETURN [x IN [1, null, 3] WHERE x > 0 | x] AS lc,
             reduce(a = 0, x IN [1, null] | a + x) AS r
      """
    Then the result should be, in any order:
      | lc     | r    |
      | [1, 3] | null |
    And no side effects

  Scenario: Reduce accumulates left to right
    Given any graph
    When executing query:
      """
      RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS total
      """
    Then the result should be, in any order:
      | total |
      | 6     |
    And no side effects

  Scenario: Quantifier predicates over lists
    Given any graph
    When executing query:
      """
      RETURN any(x IN [1, 2] WHERE x > 1) AS a,
             all(x IN [1, 2] WHERE x > 1) AS b,
             none(x IN [1, 2] WHERE x > 2) AS c,
             single(x IN [1, 2] WHERE x = 2) AS d
      """
    Then the result should be, in any order:
      | a    | b     | c    | d    |
      | true | false | true | true |
    And no side effects

  Scenario: Range with a wrong-direction step is empty
    Given any graph
    When executing query:
      """
      RETURN range(1, 0) AS a, size(range(5, 1, 1)) AS b
      """
    Then the result should be, in any order:
      | a  | b |
      | [] | 0 |
    And no side effects

  Scenario: List concatenation and membership
    Given any graph
    When executing query:
      """
      RETURN [1, 2] + [3] AS cat, 2 IN [1, 2] AS yes, 5 IN [1, 2] AS no
      """
    Then the result should be, in any order:
      | cat       | yes  | no    |
      | [1, 2, 3] | true | false |
    And no side effects

  Scenario: Lists stored as node properties round-trip
    Given an empty graph
    And having executed:
      """
      CREATE (:L {xs: [1, 2, 3]})
      """
    When executing query:
      """
      MATCH (l:L) RETURN l.xs AS xs, l.xs[1] AS second
      """
    Then the result should be, in any order:
      | xs        | second |
      | [1, 2, 3] | 2      |
    And no side effects
