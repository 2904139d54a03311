Feature: SkipLimitAcceptanceTest

  Scenario: SKIP with an expression that does not depend on variables
    Given an empty graph
    And having executed:
      """
      CREATE (:A {count: 1}), (:A {count: 2}), (:A {count: 3}),
             (:A {count: 4})
      """
    When executing query:
      """
      MATCH (n:A) RETURN n.count AS count ORDER BY count SKIP 1 + 1
      """
    Then the result should be, in order:
      | count |
      | 3     |
      | 4     |
    And no side effects

  Scenario: LIMIT with an expression that does not depend on variables
    Given an empty graph
    And having executed:
      """
      CREATE (:A {count: 1}), (:A {count: 2}), (:A {count: 3}),
             (:A {count: 4})
      """
    When executing query:
      """
      MATCH (n:A) RETURN n.count AS count ORDER BY count LIMIT 10 / 5
      """
    Then the result should be, in order:
      | count |
      | 1     |
      | 2     |
    And no side effects

  Scenario: SKIP with a parameter
    Given an empty graph
    And having executed:
      """
      CREATE (:A {count: 1}), (:A {count: 2}), (:A {count: 3})
      """
    And parameters are:
      | s | 1 |
    When executing query:
      """
      MATCH (n:A) RETURN n.count AS count ORDER BY count SKIP $s
      """
    Then the result should be, in order:
      | count |
      | 2     |
      | 3     |
    And no side effects

  Scenario: Negative SKIP should fail
    Given any graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x RETURN x SKIP -1
      """
    Then a SyntaxError should be raised at compile time: NegativeIntegerArgument
    And no side effects

  Scenario: Fractional LIMIT should fail
    Given any graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x RETURN x LIMIT 1.5
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentType
    And no side effects
  Scenario: SKIP with an expression that depends on variables should fail
    Given an empty graph
    And having executed:
      """
      CREATE ({count: 1})
      """
    When executing query:
      """
      MATCH (n) RETURN n.count AS count SKIP n.count
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: LIMIT with an expression that depends on variables should fail
    Given an empty graph
    And having executed:
      """
      CREATE ({count: 1})
      """
    When executing query:
      """
      MATCH (n) RETURN n.count AS count LIMIT n.count
      """
    Then a SyntaxError should be raised at compile time
    And no side effects
