Feature: ListComprehension

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {prop: 'a'}), (b:B {prop: 'b'}), (c:C {prop: 'c'}),
             (a)-[:T]->(b), (a)-[:T]->(c)
      """

  Scenario: Returning a list comprehension
    When executing query:
      """
      MATCH (n:A)-->(m)
      WITH collect(m.prop) AS props
      RETURN [p IN props WHERE p <> 'b' | p + '!'] AS r
      """
    Then the result should be, in any order:
      | r      |
      | ['c!'] |
    And no side effects

  Scenario: Using a list comprehension in a WITH
    When executing query:
      """
      MATCH (n:A)-->(m)
      WITH [x IN ['b', 'x'] WHERE x CONTAINS 'b'] AS props, m
      RETURN props AS r, m.prop AS p
      """
    Then the result should be, in any order:
      | r     | p   |
      | ['b'] | 'b' |
      | ['b'] | 'c' |
    And no side effects

  Scenario: Using a list comprehension in a WHERE
    When executing query:
      """
      MATCH (n:A)-->(m)
      WHERE m.prop IN [x IN ['b', 'x'] WHERE x = 'b']
      RETURN m.prop AS r
      """
    Then the result should be, in any order:
      | r   |
      | 'b' |
    And no side effects
