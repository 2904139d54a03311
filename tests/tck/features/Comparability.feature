Feature: Comparability

  Scenario: Comparing strings and integers using > in an AND'd predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:Root)-[:T]->(:Child {var: 0}),
             (:Root2)-[:T]->(:Child2 {var: 'xx'})
      """
    When executing query:
      """
      MATCH (:Root)-->(i:Child)
      WHERE exists(i.var) AND i.var > 'x'
      RETURN i.var AS var
      """
    Then the result should be empty
    And no side effects

  Scenario: Comparing strings and integers using > in a OR'd predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:Root)-[:T]->(:Child {var: 0}),
             (:Root2)-[:T]->(:Child2 {var: 'xx'})
      """
    When executing query:
      """
      MATCH (:Root)-->(i:Child)
      WHERE NOT exists(i.var) OR i.var > 'x'
      RETURN i.var AS var
      """
    Then the result should be empty
    And no side effects

  Scenario: Comparing across types yields null, except numbers #1
    Given any graph
    When executing query:
      """
      RETURN 1 < '1' AS a, 1 <= '1' AS b, 1 > '1' AS c, 1 >= '1' AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |
    And no side effects

  Scenario: Comparing across types yields null, except numbers #2
    Given any graph
    When executing query:
      """
      RETURN true < 'a' AS a, false > 1 AS b, 'a' <= false AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | null | null | null |
    And no side effects

  Scenario: Comparing across types yields null, except numbers #3
    Given any graph
    When executing query:
      """
      RETURN [1] < 1 AS a, [1] >= 'a' AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: Comparing across types yields null, except numbers #4
    Given any graph
    When executing query:
      """
      RETURN 1 < 2.5 AS a, 2 <= 2.0 AS b, 3 > 2.9 AS c, 1.0 >= 1 AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | true | true | true | true |
    And no side effects
