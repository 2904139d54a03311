Feature: MathEdgeAcceptance

  Scenario: Float division by zero is IEEE infinity not an error
    Given any graph
    When executing query:
      """
      RETURN 1.0 / 0.0 > 1e308 AS p, -1.0 / 0.0 < -1e308 AS n,
             toString(0.0 / 0.0) AS nan, (1.0 / null) IS NULL AS dn
      """
    Then the result should be, in any order:
      | p    | n    | nan   | dn   |
      | true | true | 'NaN' | true |
    And no side effects

  Scenario: Negative zero divisor flips the infinity sign
    Given any graph
    When executing query:
      """
      RETURN 1.0 / -0.0 < -1e308 AS a, -1.0 / -0.0 > 1e308 AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | true | true |
    And no side effects

  Scenario: Float modulo by zero is NaN
    Given any graph
    When executing query:
      """
      RETURN toString(7.5 % 0.0) AS r
      """
    Then the result should be, in any order:
      | r     |
      | 'NaN' |
    And no side effects

  Scenario: Integer division by zero raises an error
    Given any graph
    When executing query:
      """
      RETURN 1 / 0 AS r
      """
    Then a ArithmeticError should be raised at runtime: DivideByZero
    And no side effects

  Scenario: Adding null to a list nulls the result
    Given any graph
    When executing query:
      """
      RETURN ([1, 2] + null) IS NULL AS a, (null + [1]) IS NULL AS b,
             [1, 2] + 3 AS c
      """
    Then the result should be, in any order:
      | a    | b    | c         |
      | true | true | [1, 2, 3] |
    And no side effects

  Scenario: Rounding halves moves away from zero
    Given any graph
    When executing query:
      """
      RETURN round(2.5) AS p, round(-2.5) AS n
      """
    Then the result should be, in any order:
      | p   | n    |
      | 3.0 | -3.0 |
    And no side effects
