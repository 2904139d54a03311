Feature: StartsWithAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:Label {name: 'ABCDEF'}), (:Label {name: 'AB'}),
             (:Label {name: 'abcdef'})
      """

  Scenario: Finding exact matches with STARTS WITH
    When executing query:
      """
      MATCH (a:Label) WHERE a.name STARTS WITH 'ABC' RETURN a.name AS name
      """
    Then the result should be, in any order:
      | name     |
      | 'ABCDEF' |
    And no side effects

  Scenario: Finding exact matches with ENDS WITH
    When executing query:
      """
      MATCH (a:Label) WHERE a.name ENDS WITH 'DEF' RETURN a.name AS name
      """
    Then the result should be, in any order:
      | name     |
      | 'ABCDEF' |
    And no side effects

  Scenario: Finding exact matches with CONTAINS
    When executing query:
      """
      MATCH (a:Label) WHERE a.name CONTAINS 'CDE' RETURN a.name AS name
      """
    Then the result should be, in any order:
      | name     |
      | 'ABCDEF' |
    And no side effects

  Scenario: Handling non-string operands for STARTS WITH
    When executing query:
      """
      RETURN 1 STARTS WITH 'a' AS a, 'a' STARTS WITH 1 AS b,
             1.5 STARTS WITH 'a' AS c, true STARTS WITH 'a' AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |
    And no side effects

  Scenario: Handling non-string operands for CONTAINS
    When executing query:
      """
      RETURN 1 CONTAINS 'a' AS a, 'a' CONTAINS 1 AS b,
             1.5 CONTAINS 'a' AS c, true CONTAINS 'a' AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |
    And no side effects

  Scenario: Handling non-string operands for ENDS WITH
    When executing query:
      """
      RETURN 1 ENDS WITH 'a' AS a, 'a' ENDS WITH 1 AS b,
             1.5 ENDS WITH 'a' AS c, true ENDS WITH 'a' AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |
    And no side effects

  Scenario: NOT with STARTS WITH
    When executing query:
      """
      MATCH (a:Label) WHERE NOT a.name STARTS WITH 'ABC'
      RETURN a.name AS name
      """
    Then the result should be, in any order:
      | name     |
      | 'AB'     |
      | 'abcdef' |
    And no side effects
