Feature: SetAcceptance

  Scenario: Set a property
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'Andres'})
      """
    When executing query:
      """
      MATCH (n:A)
      WHERE n.name = 'Andres'
      SET n.name = 'Michael'
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name      |
      | 'Michael' |
    And the side effects should be:
      | +properties | 1 |
      | -properties | 1 |

  Scenario: Set a property to an expression
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'Andres'})
      """
    When executing query:
      """
      MATCH (n:A)
      WHERE n.name = 'Andres'
      SET n.name = n.name + ' was here'
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name                |
      | 'Andres was here'   |
    And the side effects should be:
      | +properties | 1 |
      | -properties | 1 |

  Scenario: Set a property by selecting the node using a simple expression
    Given an empty graph
    And having executed:
      """
      CREATE ()
      """
    When executing query:
      """
      MATCH (n)
      SET (n).name = 'neo4j'
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'neo4j' |
    And the side effects should be:
      | +properties | 1 |

  Scenario: Set a property by selecting the relationship using a simple expression
    Given an empty graph
    And having executed:
      """
      CREATE ()-[:REL]->()
      """
    When executing query:
      """
      MATCH ()-[r:REL]->()
      SET (r).name = 'neo4j'
      RETURN r.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'neo4j' |
    And the side effects should be:
      | +properties | 1 |

  Scenario: Setting a property to null removes the property
    Given an empty graph
    And having executed:
      """
      CREATE ({name: 'Michael', age: 35})
      """
    When executing query:
      """
      MATCH (n)
      WHERE n.name = 'Michael'
      SET n.name = null
      RETURN n.age AS age
      """
    Then the result should be, in any order:
      | age |
      | 35  |
    And the side effects should be:
      | -properties | 1 |

  Scenario: Setting a node property to null removes the existing property
    Given an empty graph
    And having executed:
      """
      CREATE (:A {property1: 23, property2: 46})
      """
    When executing query:
      """
      MATCH (n:A)
      SET n.property1 = null
      RETURN n.property1 AS p1, n.property2 AS p2
      """
    Then the result should be, in any order:
      | p1   | p2 |
      | null | 46 |
    And the side effects should be:
      | -properties | 1 |

  Scenario: Setting a relationship property to null removes the existing property
    Given an empty graph
    And having executed:
      """
      CREATE ()-[:REL {property1: 12, property2: 24}]->()
      """
    When executing query:
      """
      MATCH ()-[r:REL]->()
      SET r.property1 = null
      RETURN r.property1 AS p1, r.property2 AS p2
      """
    Then the result should be, in any order:
      | p1   | p2 |
      | null | 24 |
    And the side effects should be:
      | -properties | 1 |

  Scenario: Add a label to a node
    Given an empty graph
    And having executed:
      """
      CREATE ()
      """
    When executing query:
      """
      MATCH (n)
      SET n:Foo
      RETURN n
      """
    Then the result should be, in any order:
      | n      |
      | (:Foo) |
    And the side effects should be:
      | +labels | 1 |

  Scenario: Adding a list property
    Given an empty graph
    And having executed:
      """
      CREATE (:A)
      """
    When executing query:
      """
      MATCH (n:A)
      SET n.x = [1, 2, 3]
      RETURN [i IN n.x | i / 2.0] AS x
      """
    Then the result should be, in any order:
      | x               |
      | [0.5, 1.0, 1.5] |
    And the side effects should be:
      | +properties | 1 |

  Scenario: Concatenate elements onto a list property
    Given an empty graph
    When executing query:
      """
      CREATE (a {numbers: [1, 2, 3]})
      SET a.numbers = a.numbers + [4, 5]
      RETURN a.numbers AS numbers
      """
    Then the result should be, in any order:
      | numbers         |
      | [1, 2, 3, 4, 5] |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Concatenate elements in reverse onto a list property
    Given an empty graph
    When executing query:
      """
      CREATE (a {numbers: [3, 4, 5]})
      SET a.numbers = [1, 2] + a.numbers
      RETURN a.numbers AS numbers
      """
    Then the result should be, in any order:
      | numbers         |
      | [1, 2, 3, 4, 5] |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: Overwrite values when using +=
    Given an empty graph
    And having executed:
      """
      CREATE (:X {foo: 'A', bar: 'B'})
      """
    When executing query:
      """
      MATCH (n:X {foo: 'A'})
      SET n += {bar: 'C'}
      RETURN n.foo AS foo, n.bar AS bar
      """
    Then the result should be, in any order:
      | foo | bar |
      | 'A' | 'C' |
    And the side effects should be:
      | +properties | 1 |
      | -properties | 1 |

  Scenario: Retain old values when using +=
    Given an empty graph
    And having executed:
      """
      CREATE (:X {foo: 'A'})
      """
    When executing query:
      """
      MATCH (n:X {foo: 'A'})
      SET n += {bar: 'B'}
      RETURN n.foo AS foo, n.bar AS bar
      """
    Then the result should be, in any order:
      | foo | bar |
      | 'A' | 'B' |
    And the side effects should be:
      | +properties | 1 |

  Scenario: Explicit null values in a map remove old values
    Given an empty graph
    And having executed:
      """
      CREATE (:X {foo: 'A', bar: 'B'})
      """
    When executing query:
      """
      MATCH (n:X {foo: 'A'})
      SET n += {foo: null}
      RETURN n.foo AS foo, n.bar AS bar
      """
    Then the result should be, in any order:
      | foo  | bar |
      | null | 'B' |
    And the side effects should be:
      | -properties | 1 |

  Scenario: Non-existent values in a property map are removed with SET =
    Given an empty graph
    And having executed:
      """
      CREATE (:X {foo: 'A', bar: 'B'})
      """
    When executing query:
      """
      MATCH (n:X {foo: 'A'})
      SET n = {foo: 'B', baz: 'C'}
      RETURN n.foo AS foo, n.bar AS bar, n.baz AS baz
      """
    Then the result should be, in any order:
      | foo | bar  | baz |
      | 'B' | null | 'C' |
    And the side effects should be:
      | +properties | 2 |
      | -properties | 2 |
