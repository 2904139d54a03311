Feature: MapProjection

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a', num: 1})
      """

  Scenario: Map projection with a computed entry
    When executing query:
      """
      MATCH (x:A) WITH x {.name, double: x.num * 2} AS m
      RETURN m.name AS name, m.double AS d
      """
    Then the result should be, in any order:
      | name | d |
      | 'a'  | 2 |
    And no side effects

  Scenario: Map projection with all properties
    When executing query:
      """
      MATCH (x:A) RETURN x {.*} AS m
      """
    Then the result should be, in any order:
      | m                   |
      | {name: 'a', num: 1} |
    And no side effects

  Scenario: Properties function field access
    When executing query:
      """
      MATCH (x:A) RETURN properties(x).num AS num
      """
    Then the result should be, in any order:
      | num |
      | 1   |
    And no side effects
