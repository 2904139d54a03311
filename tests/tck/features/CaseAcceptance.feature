Feature: CaseAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N {x: 2}), (:N {x: 3}), (:N {x: 4}), (:N)
      """

  Scenario: Searched case with else
    When executing query:
      """
      MATCH (n:N)
      RETURN CASE WHEN n.x <= 2 THEN 'lo' WHEN n.x > 2 THEN 'hi'
             ELSE 'none' END AS bucket
      """
    Then the result should be, in any order:
      | bucket |
      | 'lo'   |
      | 'lo'   |
      | 'hi'   |
      | 'hi'   |
      | 'none' |
    And no side effects

  Scenario: Simple case form
    When executing query:
      """
      MATCH (n:N) WHERE n.x IS NOT NULL
      RETURN CASE n.x WHEN 1 THEN 'one' ELSE 'many' END AS w
      """
    Then the result should be, in any order:
      | w      |
      | 'one'  |
      | 'many' |
      | 'many' |
      | 'many' |
    And no side effects

  Scenario: Null conditions take the else branch
    Given any graph
    When executing query:
      """
      RETURN CASE WHEN null THEN 1 ELSE 2 END AS a,
             CASE null WHEN null THEN 1 ELSE 2 END AS b
      """
    Then the result should be, in any order:
      | a | b |
      | 2 | 2 |
    And no side effects

  Scenario: Case without else defaults to null
    Given any graph
    When executing query:
      """
      RETURN CASE WHEN false THEN 1 END AS a
      """
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects
