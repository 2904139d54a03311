Feature: InlinePredicateAcceptance

  Scenario: Inline WHERE on a node pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:A {v: 2}), (:A {v: 3})
      """
    When executing query:
      """
      MATCH (n:A WHERE n.v > 1)
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Inline WHERE on a relationship pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1})-[:R {w: 5}]->(:A {v: 2}),
             (:A {v: 3})-[:R {w: 1}]->(:A {v: 4})
      """
    When executing query:
      """
      MATCH (n)-[r:R WHERE r.w > 1]->(m)
      RETURN m.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |
    And no side effects

  Scenario: Inline WHERE referencing another pattern variable
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1})-[:R]->(:A {v: 2}), (:A {v: 3})-[:R]->(:A {v: 3})
      """
    When executing query:
      """
      MATCH (n:A)-[:R]->(m:A WHERE m.v = n.v)
      RETURN m.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 3 |
    And no side effects

  Scenario: Inline WHERE on a variable-length relationship is rejected
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:R {w: 1}]->(:A)
      """
    When executing query:
      """
      MATCH (n)-[r:R*1..2 WHERE r.w > 0]->(m)
      RETURN m
      """
    Then a SyntaxError should be raised at compile time: InvalidRelationshipWhere

  Scenario: COUNT subquery in a projection
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {v: 1})-[:R]->(:B), (a)-[:R]->(:B), (:A {v: 2})
      """
    When executing query:
      """
      MATCH (n:A)
      RETURN n.v AS v, COUNT { (n)-->() } AS c
      """
    Then the result should be, in any order:
      | v | c |
      | 1 | 2 |
      | 2 | 0 |
    And no side effects

  Scenario: COUNT subquery in a WHERE clause
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {v: 1})-[:R]->(:B), (a)-[:R]->(:B), (:A {v: 2})-[:R]->(:B)
      """
    When executing query:
      """
      MATCH (n:A)
      WHERE COUNT { (n)-->(:B) } > 1
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
    And no side effects
