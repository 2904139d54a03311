Feature: ComparisonAcceptance

  Scenario Outline: Numeric comparison across int and float
    Given any graph
    When executing query:
      """
      RETURN <lhs> < <rhs> AS lt
      """
    Then the result should be, in any order:
      | lt       |
      | <result> |
    And no side effects

    Examples:
      | lhs | rhs | result |
      | 1   | 4.0 | true   |
      | 4   | 1.0 | false  |
      | 1.5 | 2   | true   |
      | 2   | 2.0 | false  |

  Scenario: String comparison is lexicographic
    Given any graph
    When executing query:
      """
      RETURN 'a' < 'b' AS ab, 'abc' < 'abd' AS abc, 'Z' < 'a' AS za
      """
    Then the result should be, in any order:
      | ab   | abc  | za   |
      | true | true | true |
    And no side effects

  Scenario: Boolean comparison false before true
    Given any graph
    When executing query:
      """
      RETURN false < true AS ft
      """
    Then the result should be, in any order:
      | ft   |
      | true |
    And no side effects

  Scenario: Three-valued comparison chain keeps definite answers
    Given an empty graph
    And having executed:
      """
      CREATE (:A {val: 4})-[:REL]->(:B {val2: 1.0}),
             (:A {val: 1})-[:REL]->(:B {val2: 4.0})
      """
    When executing query:
      """
      MATCH (a:A)-->(b:B) WHERE a.val < b.val2 RETURN a.val AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
    And no side effects
