Feature: ForeachAcceptance

  Scenario: Executing CREATE in FOREACH over a literal list
    Given an empty graph
    When executing query:
      """
      FOREACH (i IN [1, 2, 3] | CREATE (:N {v: i}))
      """
    Then the result should be empty
    And the side effects should be:
      | +nodes      | 3 |
      | +labels     | 3 |
      | +properties | 3 |

  Scenario: Setting properties on collected nodes in FOREACH
    Given an empty graph
    And having executed:
      """
      CREATE ({x: 1}), ({x: 2})
      """
    When executing query:
      """
      MATCH (n)
      WITH collect(n) AS ns
      FOREACH (m IN ns | SET m.flag = true)
      """
    Then the result should be empty
    And the side effects should be:
      | +properties | 2 |

  Scenario: Setting properties on path nodes in FOREACH
    Given an empty graph
    And having executed:
      """
      CREATE (:S)-[:R]->(:M)-[:R]->(:E)
      """
    When executing query:
      """
      MATCH p = (:S)-->()-->(:E)
      FOREACH (n IN nodes(p) | SET n.seen = 1)
      """
    Then the result should be empty
    And the side effects should be:
      | +properties | 3 |

  Scenario: Nested FOREACH
    Given an empty graph
    When executing query:
      """
      FOREACH (i IN [1, 2] | FOREACH (j IN [1, 2] | CREATE (:P {i: i, j: j})))
      """
    Then the result should be empty
    And the side effects should be:
      | +nodes      | 4 |
      | +labels     | 4 |
      | +properties | 8 |

  Scenario: FOREACH over a null list is a no-op
    Given an empty graph
    And having executed:
      """
      CREATE ({x: 1})
      """
    When executing query:
      """
      MATCH (n)
      FOREACH (i IN n.missing | SET n.y = 1)
      """
    Then the result should be empty
    And no side effects

  Scenario: Clauses after FOREACH see its writes
    Given an empty graph
    When executing query:
      """
      FOREACH (i IN [1, 2, 3] | CREATE (:Q {v: i}))
      WITH 1 AS one
      MATCH (q:Q)
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |
    And the side effects should be:
      | +nodes      | 3 |
      | +labels     | 3 |
      | +properties | 3 |

  Scenario: Deleting collected nodes in FOREACH
    Given an empty graph
    And having executed:
      """
      CREATE (:A), (:A)
      """
    When executing query:
      """
      MATCH (a:A)
      WITH collect(a) AS xs
      FOREACH (x IN xs | DELETE x)
      """
    Then the result should be empty
    And the side effects should be:
      | -nodes  | 2 |
      | -labels | 2 |

  Scenario: MERGE inside FOREACH deduplicates by merge key
    Given an empty graph
    When executing query:
      """
      FOREACH (i IN [1, 1, 2] | MERGE (:M {v: i}))
      """
    Then the result should be empty
    And the side effects should be:
      | +nodes      | 2 |
      | +labels     | 2 |
      | +properties | 2 |

  Scenario: FOREACH over a non-list value fails
    Given an empty graph
    When executing query:
      """
      FOREACH (i IN 42 | CREATE ())
      """
    Then a TypeError should be raised at compile time: InvalidArgumentType

  Scenario: FOREACH variable must not shadow a bound variable
    Given an empty graph
    And having executed:
      """
      CREATE ()
      """
    When executing query:
      """
      MATCH (n)
      FOREACH (n IN [1] | CREATE ())
      """
    Then a SyntaxError should be raised at compile time: VariableAlreadyBound
