Feature: ParameterAcceptance

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N {x: 2}), (:N {x: 3})
      """

  Scenario: Scalar parameter in a predicate
    And parameters are:
      | t | 1 |
    When executing query:
      """
      MATCH (n:N) WHERE n.x > $t RETURN n.x AS x
      """
    Then the result should be, in any order:
      | x |
      | 2 |
      | 3 |
    And no side effects

  Scenario: List parameter with IN
    And parameters are:
      | xs | [1, 3] |
    When executing query:
      """
      MATCH (n:N) WHERE n.x IN $xs RETURN n.x AS x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
      | 3 |
    And no side effects

  Scenario: String parameter in the projection
    And parameters are:
      | greeting | 'hi' |
    When executing query:
      """
      RETURN $greeting + '!' AS s
      """
    Then the result should be, in any order:
      | s     |
      | 'hi!' |
    And no side effects
