Feature: TriadicSelection

  Scenario: Nested pattern predicate under OR
    Given an empty graph
    And having executed:
      """
      CREATE ({id: 1, age: 21}), ({id: 2, age: 18, foo: true}),
             ({id: 3, age: 18, foo: true})-[:KNOWS]->(:Foo),
             ({id: 4, age: 18, foo: false})-[:KNOWS]->(:Foo)
      """
    When executing query:
      """
      MATCH (a)
      WHERE a.age > 20 OR ( (a)-[:KNOWS]->(:Foo) AND a.foo = true )
      RETURN a.id AS i
      """
    Then the result should be, in any order:
      | i |
      | 1 |
      | 3 |
    And no side effects

  Scenario: Pattern predicate referencing an outer property
    Given an empty graph
    And having executed:
      """
      CREATE ({id: 1, val: 0})-[:REL]->({id: 3, val: 2}),
             ({id: 2, val: 0})-[:REL]->({id: 3, val: 1})
      """
    When executing query:
      """
      MATCH (a) WHERE (a)-->({val: a.val + 2}) RETURN a.id AS i
      """
    Then the result should be, in any order:
      | i |
      | 1 |
    And no side effects

  Scenario: Exists pattern in the projection
    Given an empty graph
    And having executed:
      """
      CREATE (:P {id: 1})-[:KNOWS]->(:P {id: 2})
      """
    When executing query:
      """
      MATCH (a:P) RETURN a.id AS i, exists((a)-[:KNOWS]->(:P)) AS f
      """
    Then the result should be, in any order:
      | i | f     |
      | 1 | true  |
      | 2 | false |
    And no side effects
