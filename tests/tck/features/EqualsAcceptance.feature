Feature: EqualsAcceptance

  Scenario: Any-typed string comparison
    Given an empty graph
    And having executed:
      """
      CREATE (:X {val: 'Apa'}), (:X {val: 'Bob'})
      """
    When executing query:
      """
      MATCH (n:X) WHERE n.val = 'Apa' RETURN n.val AS v
      """
    Then the result should be, in any order:
      | v     |
      | 'Apa' |
    And no side effects

  Scenario: Number-typed comparison against string is decided
    Given any graph
    When executing query:
      """
      RETURN 1 = '1' AS a, 1 <> '1' AS b, '1' = 1 AS c
      """
    Then the result should be, in any order:
      | a     | b    | c     |
      | false | true | false |
    And no side effects

  Scenario: Comparing nodes to nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:A {p: 1})
      """
    When executing query:
      """
      MATCH (a:A), (b:A) WHERE a = b RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |
    And no side effects
