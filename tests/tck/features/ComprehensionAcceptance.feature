Feature: ComprehensionAcceptance

  Scenario: Nested list comprehensions
    Given any graph
    When executing query:
      """
      RETURN [x IN [1, 2] | [y IN [10] | x + y]] AS r
      """
    Then the result should be, in any order:
      | r            |
      | [[11], [12]] |
    And no side effects

  Scenario: Comprehension variable shadows an outer alias
    Given any graph
    When executing query:
      """
      WITH 5 AS x RETURN [x IN [1, 2] | x * 2] AS r, x
      """
    Then the result should be, in any order:
      | r      | x |
      | [2, 4] | 5 |
    And no side effects

  Scenario: Reduce concatenates strings
    Given any graph
    When executing query:
      """
      RETURN reduce(s = '', i IN range(1, 3) | s + 'ab') AS r
      """
    Then the result should be, in any order:
      | r        |
      | 'ababab' |
    And no side effects
