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

  Scenario: IN should return true when types of LHS and RHS match - singleton list
    Given any graph
    When executing query:
      """
      RETURN 1 IN [1] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: IN should return true when types of LHS and RHS match - list
    Given any graph
    When executing query:
      """
      RETURN 3 IN [1, 2, 3] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: IN should return false when matching a number with a string
    Given any graph
    When executing query:
      """
      RETURN 1 IN ['1', '2'] AS r
      """
    Then the result should be, in any order:
      | r     |
      | false |
    And no side effects

  Scenario: IN should return false when matching a number with a string - list version
    Given any graph
    When executing query:
      """
      RETURN [1, 2] IN [['1', '2']] AS r
      """
    Then the result should be, in any order:
      | r     |
      | false |
    And no side effects

  Scenario: IN should return true when LHS and RHS contain a nested list
    Given any graph
    When executing query:
      """
      RETURN [[1, 2, 3]] IN [[[1, 2, 3]], [[4]]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: IN should return true when LHS and RHS contain a nested list - singleton version
    Given any graph
    When executing query:
      """
      RETURN [[1, 2, 3]] IN [[[1, 2, 3]]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: IN should return true when LHS and RHS contain nested lists
    Given any graph
    When executing query:
      """
      RETURN [[1, 2], [3, 4]] IN [[[5, 6]], [[1, 2], [3, 4]]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: IN should return true when LHS and RHS contain nested list with multiple empty lists
    Given any graph
    When executing query:
      """
      RETURN [[], []] IN [[[5]], [[], []]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: IN should return true when both LHS and RHS contain a nested list alongside a scalar element
    Given any graph
    When executing query:
      """
      RETURN [[1, 2], [3]] IN [[[1, 2], [3]]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: IN should work with an empty list when comparing nested lists
    Given any graph
    When executing query:
      """
      RETURN [] IN [[]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: IN should work with an empty list in the presence of other list elements: matching
    Given any graph
    When executing query:
      """
      RETURN [] IN [[1], []] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: IN with different length lists should return false
    Given any graph
    When executing query:
      """
      RETURN [1, 2] IN [[1, 2, 3]] AS r
      """
    Then the result should be, in any order:
      | r     |
      | false |
    And no side effects

  Scenario: IN should return false if different length lists compared, even if the extra element is null
    Given any graph
    When executing query:
      """
      RETURN [1, 2] IN [[1, 2, null]] AS r
      """
    Then the result should be, in any order:
      | r     |
      | false |
    And no side effects

  Scenario: IN should return false if different length lists with nested elements compared, even if the extra element is null
    Given any graph
    When executing query:
      """
      RETURN [[1, 2], [3]] IN [[[1, 2], [3], null]] AS r
      """
    Then the result should be, in any order:
      | r     |
      | false |
    And no side effects

  Scenario: IN should return false when order of elements in LHS list and RHS list don't match
    Given any graph
    When executing query:
      """
      RETURN [1, 2] IN [[2, 1]] AS r
      """
    Then the result should be, in any order:
      | r     |
      | false |
    And no side effects

  Scenario: IN should return null if comparison with null is required
    Given any graph
    When executing query:
      """
      RETURN 4 IN [1, 2, null] AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects

  Scenario: IN should return null if comparison with null is required, list version
    Given any graph
    When executing query:
      """
      RETURN [1, 2] IN [[null, 2]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects

  Scenario: IN should return null if comparison with null is required, list version 2
    Given any graph
    When executing query:
      """
      RETURN [1, 2] IN [[3], [1, null]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects

  Scenario: IN should return null if LHS and RHS are null - list version
    Given any graph
    When executing query:
      """
      RETURN [null] IN [[null]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects

  Scenario: IN should return null when comparing two so-called identical lists where one element is null
    Given any graph
    When executing query:
      """
      RETURN [1, null] IN [[1, null]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects

  Scenario: IN should return true if correct list found despite other lists having nulls
    Given any graph
    When executing query:
      """
      RETURN [1, 2] IN [[null, 3], [1, 2]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: IN should return true if correct list found despite null being another element within containing list
    Given any graph
    When executing query:
      """
      RETURN [1, 2] IN [null, [1, 2]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: Equality between list and literal should return false
    Given any graph
    When executing query:
      """
      RETURN [1, 2] = 'foo' AS r
      """
    Then the result should be, in any order:
      | r     |
      | false |
    And no side effects

  Scenario: Equality of nested lists of different length should return false despite nulls
    Given any graph
    When executing query:
      """
      RETURN [[1]] = [[1], [null]] AS r
      """
    Then the result should be, in any order:
      | r     |
      | false |
    And no side effects

  Scenario: Equality between different lists with null should return false
    Given any graph
    When executing query:
      """
      RETURN [1, 2] = [null, 'foo'] AS r
      """
    Then the result should be, in any order:
      | r     |
      | false |
    And no side effects

  Scenario: Equality between almost equal lists with null should return null
    Given any graph
    When executing query:
      """
      RETURN [1, 2] = [null, 2] AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects

  Scenario: Equality between different nested lists with null should return false
    Given any graph
    When executing query:
      """
      RETURN [[1, 2], [1, 3]] = [[1, 2], [null, 9]] AS r
      """
    Then the result should be, in any order:
      | r     |
      | false |
    And no side effects

  Scenario: Equality between almost equal nested lists with null should return null
    Given any graph
    When executing query:
      """
      RETURN [[1, 2], [1, 3]] = [[1, 2], [null, 3]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects

  Scenario: Collect and filter using a list comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Apa'}), (:Person {name: 'Bob'})
      """
    When executing query:
      """
      MATCH (n:Person)
      WITH collect(n.name) AS names
      RETURN [name IN names WHERE name CONTAINS 'p'] AS narrow
      """
    Then the result should be, in any order:
      | narrow  |
      | ['Apa'] |
    And no side effects

  Scenario: Collect and extract using a list comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Apa'}), (:Person {name: 'Bob'})
      """
    When executing query:
      """
      MATCH (n:Person)
      WITH collect(n.name) AS names
      RETURN [name IN names | name + '!'] AS escalated
      """
    Then the result should be, in any order:
      | escalated         |
      | ['Apa!', 'Bob!']  |
    And no side effects

  Scenario: Returning nested expressions based on list property
    Given an empty graph
    And having executed:
      """
      CREATE (:N {list: [1, 2, 3]})
      """
    When executing query:
      """
      MATCH (n:N)
      RETURN size(n.list) AS s, n.list[0] AS first, tail(n.list) AS rest
      """
    Then the result should be, in any order:
      | s | first | rest   |
      | 3 | 1     | [2, 3] |
    And no side effects

  Scenario: List slice with negative range
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3][-3..-1] AS r
      """
    Then the result should be, in any order:
      | r      |
      | [1, 2] |
    And no side effects

  Scenario: List slice with invalid range
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3][3..1] AS r
      """
    Then the result should be, in any order:
      | r  |
      | [] |
    And no side effects

  Scenario: List slice with exceeding range
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3][1..10] AS r
      """
    Then the result should be, in any order:
      | r      |
      | [2, 3] |
    And no side effects

  Scenario: List slice with parameterised invalid range
    Given any graph
    And parameters are:
      | from | 3 |
      | to   | 1 |
    When executing query:
      """
      RETURN [1, 2, 3][$from..$to] AS r
      """
    Then the result should be, in any order:
      | r  |
      | [] |
    And no side effects
  Scenario: IN should return true when both LHS and RHS contain nested lists
    Given any graph
    When executing query:
      """
      RETURN [[1, 2], [3, 4]] IN [[[1, 2], [3, 4]], [[5, 6]]] AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects
  Scenario: Fail at runtime when attempting to index with a String into a List
    Given any graph
    When executing query:
      """
      WITH ['a', 'b'] AS l RETURN l['foo'] AS x
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Fail at runtime when trying to index into a list with a list
    Given any graph
    When executing query:
      """
      WITH [1, 2] AS l RETURN l[[0]] AS x
      """
    Then a TypeError should be raised at any time
    And no side effects

  Scenario: Fail at compile time when attempting to index with a non-integer into a list
    Given any graph
    When executing query:
      """
      WITH [1, 2] AS l RETURN l[0.5] AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: Setting and returning the size of a list property
    Given an empty graph
    And having executed:
      """
      CREATE ()
      """
    When executing query:
      """
      MATCH (n)
      SET n.x = [1, 2, 3]
      RETURN size(n.x) AS len
      """
    Then the result should be, in any order:
      | len |
      | 3   |
    And the side effects should be:
      | +properties | 1 |
