Feature: NullAcceptance

  Scenario: Null propagation through scalar operators
    Given any graph
    When executing query:
      """
      RETURN 1 + null AS a, null AND false AS b, null OR true AS c,
             null XOR true AS d, NOT null AS e, 'a' + null AS f
      """
    Then the result should be, in any order:
      | a    | b     | c    | d    | e    | f    |
      | null | false | true | null | null | null |
    And no side effects

  Scenario: IS NULL and IS NOT NULL
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N)
      """
    When executing query:
      """
      MATCH (n:N)
      RETURN n.x IS NULL AS isn, n.x IS NOT NULL AS isnn
      """
    Then the result should be, in any order:
      | isn   | isnn  |
      | false | true  |
      | true  | false |
    And no side effects

  Scenario: Null comparisons are null and filter rows
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1}), (:N)
      """
    When executing query:
      """
      MATCH (n:N) WHERE n.x > 0 RETURN n.x AS x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
    And no side effects

  Scenario: IN with a null member keeps definite matches
    Given any graph
    When executing query:
      """
      UNWIND [1, 2] AS i
      WITH i WHERE i IN [1, null]
      RETURN i
      """
    Then the result should be, in any order:
      | i |
      | 1 |
    And no side effects

  Scenario: IN an empty list is false even for null
    Given any graph
    When executing query:
      """
      RETURN null IN [] AS a, 1 IN [] AS b
      """
    Then the result should be, in any order:
      | a     | b     |
      | false | false |
    And no side effects

  Scenario: Cross-type equality is decided not null
    Given any graph
    When executing query:
      """
      RETURN 1 = '1' AS a, true = 1 AS b, 1 = 1.0 AS c
      """
    Then the result should be, in any order:
      | a     | b     | c    |
      | false | false | true |
    And no side effects

  Scenario: Incomparable types compare to null
    Given an empty graph
    And having executed:
      """
      CREATE (:A {val: 4})-[:REL]->(:B {val2: 'string'})
      """
    When executing query:
      """
      MATCH (a:A)-->(b:B) WHERE a.val < b.val2 RETURN a.val AS v
      """
    Then the result should be empty
    And no side effects

  Scenario: Property of a null entity is null
    Given an empty graph
    And having executed:
      """
      CREATE (:C {name: 'c'})
      """
    When executing query:
      """
      MATCH (c:C) OPTIONAL MATCH (c)-[:KNOWS]->(x)
      RETURN c.name AS c, x.name AS x
      """
    Then the result should be, in any order:
      | c   | x    |
      | 'c' | null |
    And no side effects

  Scenario: Property existence check on null node
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (n:Missing)
      RETURN n.prop IS NULL AS isNull
      """
    Then the result should be, in any order:
      | isNull |
      | true   |
    And no side effects

  Scenario: Ignore null when setting property
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (a:DoesNotExist)
      SET a.prop = 42
      RETURN a
      """
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects

  Scenario: Ignore null when removing property
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (a:DoesNotExist)
      REMOVE a.prop
      RETURN a
      """
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects

  Scenario: Ignore null when setting properties using an appending map
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (a:DoesNotExist)
      SET a += {prop: 42}
      RETURN a
      """
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects

  Scenario: Ignore null when setting properties using an overriding map
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (a:DoesNotExist)
      SET a = {prop: 42}
      RETURN a
      """
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects

  Scenario: Ignore null when setting label
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (a:DoesNotExist)
      SET a:L
      RETURN a
      """
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects

  Scenario: Ignore null when removing label
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (a:DoesNotExist)
      REMOVE a:L
      RETURN a
      """
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects

  Scenario: Ignore null when deleting node
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (a:DoesNotExist)
      DELETE a
      RETURN a
      """
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects

  Scenario: Ignore null when deleting relationship
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH ()-[r:DoesNotExist]-()
      DELETE r
      RETURN r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects
