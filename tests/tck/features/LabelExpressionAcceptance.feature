Feature: LabelExpressionAcceptance

  Scenario: Matching with a label disjunction
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:B {v: 2}), (:C {v: 3}), (:A:B {v: 4})
      """
    When executing query:
      """
      MATCH (n:A|B)
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
      | 4 |
    And no side effects

  Scenario: Matching with a label conjunction using ampersand
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:B {v: 2}), (:A:B {v: 4})
      """
    When executing query:
      """
      MATCH (n:A&B)
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 4 |
    And no side effects

  Scenario: Matching with a label negation
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:B {v: 2}), (:C {v: 3})
      """
    When executing query:
      """
      MATCH (n:!C)
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Nested label expression with parentheses
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:B {v: 2}), (:C {v: 3}), (:A:B {v: 4})
      """
    When executing query:
      """
      MATCH (n:(A|C)&!B)
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 3 |
    And no side effects

  Scenario: Label expression on a pattern endpoint
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1})-[:R]->(:T), (:B {v: 2})-[:R]->(:T), (:C {v: 3})-[:R]->(:T)
      """
    When executing query:
      """
      MATCH (n:A|B)-[:R]->(:T)
      RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Label expressions cannot create nodes
    Given an empty graph
    When executing query:
      """
      CREATE (:A|B)
      """
    Then a SyntaxError should be raised at compile time: InvalidLabelExpression
