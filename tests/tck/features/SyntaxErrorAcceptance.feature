Feature: SyntaxErrorAcceptance

  Scenario: Using a non-existent function
    Given any graph
    When executing query:
      """
      MATCH (a) RETURN foo(a)
      """
    Then a SyntaxError should be raised at compile time: UnknownFunction
    And no side effects

  Scenario: Using `rand()` in aggregations
    Given any graph
    When executing query:
      """
      RETURN count(rand())
      """
    Then a SyntaxError should be raised at compile time: NonConstantExpression
    And no side effects

  Scenario: Supplying invalid hexadecimal literal 1
    Given any graph
    When executing query:
      """
      RETURN 0x23G34
      """
    Then a SyntaxError should be raised at compile time: InvalidNumberLiteral
    And no side effects

  Scenario: Supplying invalid hexadecimal literal 2
    Given any graph
    When executing query:
      """
      RETURN 0x23j
      """
    Then a SyntaxError should be raised at compile time: InvalidNumberLiteral
    And no side effects
