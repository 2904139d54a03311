Feature: NullEntityFunctions

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:C {name: 'c'})
      """

  Scenario: Meta functions of an unmatched optional entity are null
    When executing query:
      """
      MATCH (c:C) OPTIONAL MATCH (c)-[r:KNOWS]->(x)
      RETURN labels(x) IS NULL AS l, keys(x) IS NULL AS k,
             properties(x) IS NULL AS p, type(r) IS NULL AS t,
             id(x) IS NULL AS i
      """
    Then the result should be, in any order:
      | l    | k    | p    | t    | i    |
      | true | true | true | true | true |
    And no side effects

  Scenario: Labels of an optional match on a schema-unknown label
    When executing query:
      """
      OPTIONAL MATCH (z:Zzz) RETURN labels(z) IS NULL AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |
    And no side effects

  Scenario: Meta functions of a matched entity are non-null
    When executing query:
      """
      MATCH (c:C)
      RETURN labels(c) AS l, keys(c) AS k, properties(c) AS p
      """
    Then the result should be, in any order:
      | l     | k        | p             |
      | ['C'] | ['name'] | {name: 'c'}   |
    And no side effects
