Feature: RemoveAcceptance

  Scenario: Should ignore nulls
    Given an empty graph
    And having executed:
      """
      CREATE ({prop: 42})
      """
    When executing query:
      """
      MATCH (n)
      OPTIONAL MATCH (n)-[r]->()
      REMOVE r.prop
      RETURN n.prop AS p
      """
    Then the result should be, in any order:
      | p  |
      | 42 |
    And no side effects

  Scenario: Remove a single label
    Given an empty graph
    And having executed:
      """
      CREATE (:L {prop: 42})
      """
    When executing query:
      """
      MATCH (n)
      REMOVE n:L
      RETURN n.prop AS p
      """
    Then the result should be, in any order:
      | p  |
      | 42 |
    And the side effects should be:
      | -labels | 1 |

  Scenario: Remove multiple labels
    Given an empty graph
    And having executed:
      """
      CREATE (:L1:L2:L3 {prop: 42})
      """
    When executing query:
      """
      MATCH (n)
      REMOVE n:L1:L3
      RETURN labels(n) AS l
      """
    Then the result should be, in any order:
      | l      |
      | ['L2'] |
    And the side effects should be:
      | -labels | 2 |

  Scenario: Remove a single node property
    Given an empty graph
    And having executed:
      """
      CREATE (:L {prop: 42})
      """
    When executing query:
      """
      MATCH (n)
      REMOVE n.prop
      RETURN n.prop AS p
      """
    Then the result should be, in any order:
      | p    |
      | null |
    And the side effects should be:
      | -properties | 1 |

  Scenario: Remove multiple node properties
    Given an empty graph
    And having executed:
      """
      CREATE (:L {prop: 42, a: 'a', b: 'B'})
      """
    When executing query:
      """
      MATCH (n)
      REMOVE n.prop, n.a
      RETURN size(keys(n)) AS props
      """
    Then the result should be, in any order:
      | props |
      | 1     |
    And the side effects should be:
      | -properties | 2 |

  Scenario: Remove a single relationship property
    Given an empty graph
    And having executed:
      """
      CREATE ()-[:X {prop: 42}]->()
      """
    When executing query:
      """
      MATCH ()-[r]->()
      REMOVE r.prop
      RETURN r.prop AS p
      """
    Then the result should be, in any order:
      | p    |
      | null |
    And the side effects should be:
      | -properties | 1 |

  Scenario: Remove multiple relationship properties
    Given an empty graph
    And having executed:
      """
      CREATE ()-[:X {prop: 42, a: 'a', b: 'B'}]->()
      """
    When executing query:
      """
      MATCH ()-[r]->()
      REMOVE r.prop, r.a
      RETURN size(keys(r)) AS props
      """
    Then the result should be, in any order:
      | props |
      | 1     |
    And the side effects should be:
      | -properties | 2 |

  Scenario: Remove a missing property should be a valid operation
    Given an empty graph
    And having executed:
      """
      CREATE (), (), ()
      """
    When executing query:
      """
      MATCH (n)
      REMOVE n.prop
      RETURN sum(size(keys(n))) AS totalNumberOfProps
      """
    Then the result should be, in any order:
      | totalNumberOfProps |
      | 0                  |
    And no side effects
