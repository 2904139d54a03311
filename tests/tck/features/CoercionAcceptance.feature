Feature: CoercionAcceptance

  Scenario: toInteger truncates floats toward zero
    Given any graph
    When executing query:
      """
      RETURN toInteger(3.9) AS a, toInteger(-3.9) AS b
      """
    Then the result should be, in any order:
      | a | b  |
      | 3 | -3 |
    And no side effects

  Scenario: toString renders numbers booleans and lists
    Given any graph
    When executing query:
      """
      RETURN toString(3) AS i, toString(3.5) AS f, toString(true) AS b
      """
    Then the result should be, in any order:
      | i   | f     | b      |
      | '3' | '3.5' | 'true' |
    And no side effects

  Scenario: toFloat of an integer widens
    Given any graph
    When executing query:
      """
      RETURN toFloat(3) AS r
      """
    Then the result should be, in any order:
      | r   |
      | 3.0 |
    And no side effects
