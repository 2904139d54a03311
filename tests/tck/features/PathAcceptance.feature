Feature: PathAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {n: 1})-[:R {w: 1}]->(b:B {n: 2}),
             (b)-[:R {w: 2}]->(c:C {n: 3})
      """

  Scenario: Length of a named path
    When executing query:
      """
      MATCH p = (a:A)-->(b) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 1 |
    And no side effects

  Scenario: Named path over two hops
    When executing query:
      """
      MATCH p = (:A)-->()-->(c:C) RETURN length(p) AS l, c.n AS n
      """
    Then the result should be, in any order:
      | l | n |
      | 2 | 3 |
    And no side effects

  Scenario: Variable length relationship list is bound
    When executing query:
      """
      MATCH (a:A)-[rs:R*1..2]->(x) RETURN size(rs) AS hops, x.n AS n
      """
    Then the result should be, in any order:
      | hops | n |
      | 1    | 2 |
      | 2    | 3 |
    And no side effects

  Scenario: Pattern comprehension collects projected values
    When executing query:
      """
      MATCH (a:A) RETURN [(a)-[:R]->(x) | x.n] AS ns
      """
    Then the result should be, in any order:
      | ns  |
      | [2] |
    And no side effects

  Scenario: Pattern comprehension with a predicate
    When executing query:
      """
      MATCH (b:B) RETURN [(b)-[r:R]->(x) WHERE r.w > 1 | x.n] AS ns
      """
    Then the result should be, in any order:
      | ns  |
      | [3] |
    And no side effects

  Scenario: Existential subquery
    When executing query:
      """
      MATCH (a:A) WHERE EXISTS { MATCH (a)-->(b) } RETURN a.n AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |
    And no side effects

  Scenario: Existential subquery with an inner WHERE
    When executing query:
      """
      MATCH (n)
      WHERE EXISTS { (n)-[r:R]->(x) WHERE r.w > 1 }
      RETURN n.n AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
    And no side effects

  Scenario: Negated existential subquery in a projection
    When executing query:
      """
      MATCH (n)
      RETURN n.n AS n, NOT EXISTS { MATCH (n)-->() } AS sink
      """
    Then the result should be, in any order:
      | n | sink  |
      | 1 | false |
      | 2 | false |
      | 3 | true  |
    And no side effects

  Scenario: Direct property access on an indexed path element
    When executing query:
      """
      MATCH p = (a:A)-->(b) RETURN nodes(p)[0].n AS r
      """
    Then the result should be, in any order:
      | r |
      | 1 |
    And no side effects

  Scenario: Indexed path elements support negative and out-of-range indexes
    When executing query:
      """
      MATCH p = (:A)-->()-->(c:C)
      RETURN nodes(p)[-1].n AS last, relationships(p)[0].w AS w0,
             nodes(p)[9] IS NULL AS oob
      """
    Then the result should be, in any order:
      | last | w0 | oob  |
      | 3    | 1  | true |
    And no side effects

  Scenario: Direction of traversed relationship is not significant for path equality, simple
    Given an empty graph
    And having executed:
      """
      CREATE (n:A)-[:T]->(n)
      """
    When executing query:
      """
      MATCH p1 = (:A)-->()
      MATCH p2 = (:A)<--()
      RETURN p1 = p2 AS e
      """
    Then the result should be, in any order:
      | e    |
      | true |
    And no side effects
