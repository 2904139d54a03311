Feature: MergeNodeAcceptance

  Scenario: Merge node when no nodes exist
    Given an empty graph
    When executing query:
      """
      MERGE (a)
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |
    And the side effects should be:
      | +nodes | 1 |

  Scenario: Merge node with label
    Given an empty graph
    When executing query:
      """
      MERGE (a:TheLabel)
      RETURN labels(a) AS labels
      """
    Then the result should be, in any order:
      | labels       |
      | ['TheLabel'] |
    And the side effects should be:
      | +nodes  | 1 |
      | +labels | 1 |

  Scenario: Merge node with label add label on create
    Given an empty graph
    When executing query:
      """
      MERGE (a:TheLabel)
      ON CREATE SET a:Foo
      RETURN labels(a) AS labels
      """
    Then the result should be, in any order, ignoring element order for lists:
      | labels              |
      | ['TheLabel', 'Foo'] |
    And the side effects should be:
      | +nodes  | 1 |
      | +labels | 2 |

  Scenario: Merge node with label add property on create
    Given an empty graph
    When executing query:
      """
      MERGE (a:TheLabel)
      ON CREATE SET a.prop = 42
      RETURN a.prop AS p
      """
    Then the result should be, in any order:
      | p  |
      | 42 |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 1 |

  Scenario: Merge node with label when it exists
    Given an empty graph
    And having executed:
      """
      CREATE (:TheLabel {id: 1})
      """
    When executing query:
      """
      MERGE (a:TheLabel)
      RETURN a.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |
    And no side effects

  Scenario: Merge node should create when it doesn't match, properties
    Given an empty graph
    And having executed:
      """
      CREATE ({prop: 42})
      """
    When executing query:
      """
      MERGE (a {prop: 43})
      RETURN a.prop AS p
      """
    Then the result should be, in any order:
      | p  |
      | 43 |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Merge node should create when it doesn't match, properties and label
    Given an empty graph
    And having executed:
      """
      CREATE (:TheLabel {prop: 42})
      """
    When executing query:
      """
      MERGE (a:TheLabel {prop: 43})
      RETURN a.prop AS p
      """
    Then the result should be, in any order:
      | p  |
      | 43 |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 1 |

  Scenario: Merge node with prop and label
    Given an empty graph
    And having executed:
      """
      CREATE (:TheLabel {prop: 42})
      """
    When executing query:
      """
      MERGE (a:TheLabel {prop: 42})
      RETURN a.prop AS p
      """
    Then the result should be, in any order:
      | p  |
      | 42 |
    And no side effects

  Scenario: Merge node with label add label on match when it exists
    Given an empty graph
    And having executed:
      """
      CREATE (:TheLabel)
      """
    When executing query:
      """
      MERGE (a:TheLabel)
      ON MATCH SET a:Foo
      RETURN labels(a) AS labels
      """
    Then the result should be, in any order, ignoring element order for lists:
      | labels              |
      | ['TheLabel', 'Foo'] |
    And the side effects should be:
      | +labels | 1 |

  Scenario: Merge node with label add property on update when it exists
    Given an empty graph
    And having executed:
      """
      CREATE (:TheLabel)
      """
    When executing query:
      """
      MERGE (a:TheLabel)
      ON CREATE SET a.prop = 42
      RETURN a.prop AS p
      """
    Then the result should be, in any order:
      | p    |
      | null |
    And no side effects

  Scenario: Merge node and set property on match
    Given an empty graph
    And having executed:
      """
      CREATE (:TheLabel)
      """
    When executing query:
      """
      MERGE (a:TheLabel)
      ON MATCH SET a.prop = 42
      RETURN a.prop AS p
      """
    Then the result should be, in any order:
      | p  |
      | 42 |
    And the side effects should be:
      | +properties | 1 |

  Scenario: Should work when finding multiple elements
    Given an empty graph
    And having executed:
      """
      CREATE (:X), (:X)
      """
    When executing query:
      """
      MERGE (a:X)
      RETURN count(a) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |
    And no side effects

  Scenario: Should handle argument properly
    Given an empty graph
    And having executed:
      """
      CREATE ({x: 42}),
             ({x: 1042})
      """
    When executing query:
      """
      WITH 42 AS x
      MERGE (c:N {x: x})
      RETURN c.x AS cx
      """
    Then the result should be, in any order:
      | cx |
      | 42 |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 1 |

  Scenario: Should handle arguments properly with only write clauses
    Given an empty graph
    When executing query:
      """
      CREATE (a {p: 1})
      MERGE ({v: a.p})
      """
    Then the result should be empty
    And the side effects should be:
      | +nodes      | 2 |
      | +properties | 2 |

  Scenario: Should be able to merge using property from match
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {bornIn: 'New York'})
      CREATE (:Person {bornIn: 'Ohio'})
      CREATE (:Person {bornIn: 'New Jersey'})
      CREATE (:Person {bornIn: 'New York'})
      CREATE (:Person {bornIn: 'Ohio'})
      """
    When executing query:
      """
      MATCH (person:Person)
      MERGE (city:City {name: person.bornIn})
      RETURN person.bornIn AS bornIn
      """
    Then the result should be, in any order:
      | bornIn       |
      | 'New York'   |
      | 'Ohio'       |
      | 'New Jersey' |
      | 'New York'   |
      | 'Ohio'       |
    And the side effects should be:
      | +nodes      | 3 |
      | +labels     | 3 |
      | +properties | 3 |

  Scenario: Should be able to use properties from match in ON CREATE
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {bornIn: 'New York'})
      """
    When executing query:
      """
      MATCH (person:Person)
      MERGE (city:City)
      ON CREATE SET city.name = person.bornIn
      RETURN city.name AS name
      """
    Then the result should be, in any order:
      | name       |
      | 'New York' |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 1 |
      | +properties | 1 |

  Scenario: Should be able to use properties from match in ON MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {bornIn: 'New York'})
      CREATE (:City)
      """
    When executing query:
      """
      MATCH (person:Person)
      MERGE (city:City)
      ON MATCH SET city.name = person.bornIn
      RETURN city.name AS name
      """
    Then the result should be, in any order:
      | name       |
      | 'New York' |
    And the side effects should be:
      | +properties | 1 |

  Scenario: Should be able to use properties from match in ON MATCH and ON CREATE
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {bornIn: 'New York'}), (:City)
      """
    When executing query:
      """
      MATCH (person:Person)
      MERGE (city:City)
      ON MATCH SET city.name = person.bornIn
      ON CREATE SET city.name = person.bornIn
      RETURN city.name AS name
      """
    Then the result should be, in any order:
      | name       |
      | 'New York' |
    And the side effects should be:
      | +properties | 1 |

  Scenario: Should be able to set labels on match
    Given an empty graph
    And having executed:
      """
      CREATE ()
      """
    When executing query:
      """
      MERGE (a)
      ON MATCH SET a:L
      """
    Then the result should be empty
    And the side effects should be:
      | +labels | 1 |

  Scenario: Should be able to set labels on match and on create
    Given an empty graph
    And having executed:
      """
      CREATE (), ()
      """
    When executing query:
      """
      MATCH ()
      MERGE (a:Foo)
      ON MATCH SET a:L
      ON CREATE SET a:M
      """
    Then the result should be empty
    And the side effects should be:
      | +nodes  | 1 |
      | +labels | 2 |

  Scenario: Merge must properly handle multiple labels
    Given an empty graph
    And having executed:
      """
      CREATE (:L:A {prop: 42})
      """
    When executing query:
      """
      MERGE (test:L:B {prop: 42})
      RETURN labels(test) AS labels
      """
    Then the result should be, in any order, ignoring element order for lists:
      | labels     |
      | ['L', 'B'] |
    And the side effects should be:
      | +nodes      | 1 |
      | +labels     | 2 |
      | +properties | 1 |

  Scenario: Merge followed by multiple creates
    Given an empty graph
    When executing query:
      """
      MERGE (t:T {id: 42})
      CREATE (f:R)
      CREATE (t)-[:REL]->(f)
      """
    Then the result should be empty
    And the side effects should be:
      | +nodes         | 2 |
      | +relationships | 1 |
      | +labels        | 2 |
      | +properties    | 1 |

  Scenario: Unwind combined with merge
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS int
      MERGE (n {id: int})
      RETURN count(*) AS count
      """
    Then the result should be, in any order:
      | count |
      | 4     |
    And the side effects should be:
      | +nodes      | 4 |
      | +properties | 4 |

  Scenario: Merges should not be able to match on deleted nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:A {value: 1}),
             (:A {value: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      DELETE a
      MERGE (a2:A)
      RETURN a2.value AS value
      """
    Then the result should be, in any order:
      | value |
      | null  |
      | null  |
    And the side effects should be:
      | +nodes  | 1 |
      | -nodes  | 2 |
      | +labels | 1 |
      | -labels | 2 |
      | -properties | 2 |

  Scenario: ON CREATE on created nodes
    Given an empty graph
    When executing query:
      """
      CREATE (a)
      MERGE (a)-[:KNOWS]->(b:B)
      ON CREATE SET b.created = 1
      """
    Then the result should be empty
    And the side effects should be:
      | +nodes         | 2 |
      | +relationships | 1 |
      | +labels        | 1 |
      | +properties    | 1 |

  Scenario: Should support updates while merging
    Given an empty graph
    And having executed:
      """
      UNWIND [0, 1, 2] AS x
      UNWIND [0, 1, 2] AS y
      CREATE ({x: x, y: y})
      """
    When executing query:
      """
      MATCH (foo {x: 1, y: 1})
      SET foo.x = 2
      WITH foo
      MATCH (bar {x: 2, y: 1})
      MERGE (baz {x: 2, y: 2})
      RETURN bar.x AS x, baz.y AS y
      """
    Then the result should be, in any order:
      | x | y |
      | 2 | 2 |
      | 2 | 2 |
    And the side effects should be:
      | +properties | 1 |
      | -properties | 1 |
