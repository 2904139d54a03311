Feature: SliceAcceptance

  Scenario: Open-ended and open-start slices
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3][1..] AS a, [1, 2, 3][..2] AS b, [1, 2, 3][-2..] AS c
      """
    Then the result should be, in any order:
      | a      | b      | c      |
      | [2, 3] | [1, 2] | [2, 3] |
    And no side effects

  Scenario: Substring beyond the end is empty
    Given any graph
    When executing query:
      """
      RETURN substring('abc', 5, 2) AS a, substring('abc', 1) AS b
      """
    Then the result should be, in any order:
      | a  | b    |
      | '' | 'bc' |
    And no side effects

  Scenario: Reverse of a list
    Given any graph
    When executing query:
      """
      RETURN reverse([1, 2, 3]) AS r
      """
    Then the result should be, in any order:
      | r         |
      | [3, 2, 1] |
    And no side effects
