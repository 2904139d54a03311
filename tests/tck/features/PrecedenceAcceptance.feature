Feature: PrecedenceAcceptance

  Scenario: Unary minus binds looser than exponent
    Given any graph
    When executing query:
      """
      RETURN -2 ^ 2 AS a, 2 ^ -1 AS b, 2 ^ 3 ^ 2 AS e
      """
    Then the result should be, in any order:
      | a    | b   | e     |
      | -4.0 | 0.5 | 512.0 |
    And no side effects

  Scenario: AND binds tighter than OR
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N {x: 2}), (:N {x: 3})
      """
    When executing query:
      """
      MATCH (n:N) WHERE n.x = 1 OR n.x = 2 AND n.x < 2 RETURN n.x AS x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
    And no side effects

  Scenario: Integer division truncates and mixed division floats
    Given any graph
    When executing query:
      """
      RETURN 5 / 2 AS a, 5.0 / 2 AS b, 7 % 3 AS m, -7 % 3 AS nm
      """
    Then the result should be, in any order:
      | a | b   | m | nm |
      | 2 | 2.5 | 1 | -1 |
    And no side effects

  Scenario: XOR truth table
    Given any graph
    When executing query:
      """
      RETURN true XOR false AS a, true XOR true AS b, false XOR false AS c
      """
    Then the result should be, in any order:
      | a    | b     | c     |
      | true | false | false |
    And no side effects
