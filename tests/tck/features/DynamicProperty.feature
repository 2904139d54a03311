Feature: DynamicProperty

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a', num: 1})
      """

  Scenario: Dynamic property lookup with a literal key
    When executing query:
      """
      MATCH (n:A) RETURN n['name'] AS r
      """
    Then the result should be, in any order:
      | r   |
      | 'a' |
    And no side effects

  Scenario: Dynamic property lookup of a missing key is null
    When executing query:
      """
      MATCH (n:A) RETURN n['zzz'] AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects

  Scenario: Dynamic property lookup with a computed key
    When executing query:
      """
      MATCH (n:A) WITH 'nu' + 'm' AS k, n RETURN n[k] AS r
      """
    Then the result should be, in any order:
      | r |
      | 1 |
    And no side effects
