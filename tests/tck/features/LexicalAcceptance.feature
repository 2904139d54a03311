Feature: LexicalAcceptance

  Scenario: Escaped quotes in string literals
    Given any graph
    When executing query:
      """
      RETURN 'it\'s' AS a, "qu\"ote" AS b
      """
    Then the result should be, in any order:
      | a      | b       |
      | 'it\'s' | 'qu"ote' |
    And no side effects

  Scenario: Unicode strings count characters not bytes
    Given any graph
    When executing query:
      """
      RETURN size('héllo') AS n
      """
    Then the result should be, in any order:
      | n |
      | 5 |
    And no side effects

  Scenario: Backtick-quoted identifiers
    Given any graph
    When executing query:
      """
      WITH 1 AS `weird name` RETURN `weird name` AS r
      """
    Then the result should be, in any order:
      | r |
      | 1 |
    And no side effects

  Scenario: Reserved-looking property names parse
    Given any graph
    When executing query:
      """
      WITH {order: 1, match: 2} AS m RETURN m.order AS o, m.match AS mt
      """
    Then the result should be, in any order:
      | o | mt |
      | 1 | 2  |
    And no side effects
