Feature: ReturnAcceptance2

  Scenario: Return all variables
    Given an empty graph
    And having executed:
      """
      CREATE (:Start)-[:T]->()
      """
    When executing query:
      """
      MATCH p = (a:Start)-->(b) RETURN *
      """
    Then the result should be, in any order:
      | a        | b  | p                    |
      | (:Start) | () | <(:Start)-[:T]->()>  |
    And no side effects

  Scenario: Concatenating and returning the size of literal lists
    Given any graph
    When executing query:
      """
      RETURN size([[], []] + [[]]) AS l
      """
    Then the result should be, in any order:
      | l |
      | 3 |
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
      RETURN tail(tail(n.list)) AS t, size(tail(n.list)) AS s
      """
    Then the result should be, in any order:
      | t   | s |
      | [3] | 2 |
    And no side effects

  Scenario: Arithmetic expressions should propagate null values
    Given any graph
    When executing query:
      """
      RETURN 1 + (2 - (3 * (4 / (5 ^ (6 % null))))) AS a
      """
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects

  Scenario: Projecting an arithmetic expression with aggregation
    Given an empty graph
    And having executed:
      """
      CREATE (:X {id: 42})
      """
    When executing query:
      """
      MATCH (a:X)
      RETURN a.id AS id, count(a) + 3 AS count
      """
    Then the result should be, in any order:
      | id | count |
      | 42 | 4     |
    And no side effects

  Scenario: Multiple aliasing and backreferencing
    Given any graph
    When executing query:
      """
      WITH 1 AS a, 2 AS b
      WITH a AS b, b AS tmp
      WITH b AS a, tmp AS c
      RETURN a, c
      """
    Then the result should be, in any order:
      | a | c |
      | 1 | 2 |
    And no side effects

  Scenario: Concatenating lists of same type
    Given any graph
    When executing query:
      """
      RETURN [1, 10, 100] + [4, 5] AS foo
      """
    Then the result should be, in any order:
      | foo               |
      | [1, 10, 100, 4, 5] |
    And no side effects

  Scenario: Appending lists of same type
    Given any graph
    When executing query:
      """
      RETURN [1, 10, 100] + 4 AS foo
      """
    Then the result should be, in any order:
      | foo              |
      | [1, 10, 100, 4]  |
    And no side effects

  Scenario: Limiting amount of rows when there are fewer left than the LIMIT argument
    Given an empty graph
    And having executed:
      """
      CREATE (:X {id: 1}), (:X {id: 2}), (:X {id: 3})
      """
    When executing query:
      """
      MATCH (p:X) RETURN p.id AS id ORDER BY id LIMIT 10
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |
      | 3  |
    And no side effects
  Scenario: DISTINCT inside aggregation should work with nested lists of maps in maps
    Given any graph
    When executing query:
      """
      UNWIND [1, 2] AS i
      RETURN count(DISTINCT [{a: {b: 1}}, {a: {b: 2}}]) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |
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
      SET n.x = [10, 20]
      RETURN size(n.x) AS len
      """
    Then the result should be, in any order:
      | len |
      | 2   |
    And the side effects should be:
      | +properties | 1 |

  Scenario: Fail when sorting on variable removed by DISTINCT
    Given an empty graph
    And having executed:
      """
      CREATE ({name: 'A', age: 13}), ({name: 'B', age: 12}), ({name: 'C', age: 11})
      """
    When executing query:
      """
      MATCH (a)
      RETURN DISTINCT a.name AS name
      ORDER BY a.age
      """
    Then a SyntaxError should be raised at compile time: UndefinedVariable

  Scenario: Do not fail when returning type of deleted relationships
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:T]->(:B)
      """
    When executing query:
      """
      MATCH ()-[r]->()
      DELETE r
      RETURN type(r) AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'T' |
    And the side effects should be:
      | -relationships | 1 |

  Scenario: Fail when returning labels of deleted nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:A)
      """
    When executing query:
      """
      MATCH (n)
      DELETE n
      RETURN labels(n)
      """
    Then a EntityNotFound should be raised at runtime: DeletedEntityAccess

  Scenario: Fail when returning properties of deleted nodes
    Given an empty graph
    And having executed:
      """
      CREATE ({p: 0})
      """
    When executing query:
      """
      MATCH (n)
      DELETE n
      RETURN n.p
      """
    Then a EntityNotFound should be raised at runtime: DeletedEntityAccess

  Scenario: Fail when returning properties of deleted relationships
    Given an empty graph
    And having executed:
      """
      CREATE ()-[:T {p: 0}]->()
      """
    When executing query:
      """
      MATCH ()-[r]->()
      DELETE r
      RETURN r.p
      """
    Then a EntityNotFound should be raised at runtime: DeletedEntityAccess
