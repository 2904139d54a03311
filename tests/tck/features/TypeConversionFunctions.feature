Feature: TypeConversionFunctions

  Scenario: `toInteger()` handling mixed number types
    Given any graph
    When executing query:
      """
      UNWIND [2, 2.9, -1.5, 42.0] AS n
      RETURN toInteger(n) AS i
      """
    Then the result should be, in any order:
      | i  |
      | 2  |
      | 2  |
      | -1 |
      | 42 |
    And no side effects

  Scenario: `toInteger()` on a string that is not a number
    Given any graph
    When executing query:
      """
      RETURN toInteger('foo') AS i, toInteger('42') AS j, toInteger('3.5') AS k
      """
    Then the result should be, in any order:
      | i    | j  | k |
      | null | 42 | 3 |
    And no side effects

  Scenario: `toInteger()` on a boolean is invalid
    Given any graph
    When executing query:
      """
      RETURN toInteger(true)
      """
    Then a TypeError should be raised at compile time: InvalidArgumentValue
    And no side effects

  Scenario: `toFloat()` on mixed number types
    Given any graph
    When executing query:
      """
      UNWIND [1, 2.5, -3] AS n
      RETURN toFloat(n) AS f
      """
    Then the result should be, in any order:
      | f    |
      | 1.0  |
      | 2.5  |
      | -3.0 |
    And no side effects

  Scenario: `toFloat()` on a string that is not a number
    Given any graph
    When executing query:
      """
      RETURN toFloat('foo') AS f, toFloat('1.5') AS g, toFloat('2') AS h
      """
    Then the result should be, in any order:
      | f    | g   | h   |
      | null | 1.5 | 2.0 |
    And no side effects

  Scenario: `toFloat()` on a list is invalid
    Given any graph
    When executing query:
      """
      RETURN toFloat([1.0])
      """
    Then a TypeError should be raised at compile time: InvalidArgumentValue
    And no side effects

  Scenario: `toBoolean()` on valid literal string
    Given any graph
    When executing query:
      """
      RETURN toBoolean('true') AS t, toBoolean('FALSE') AS f,
             toBoolean('foo') AS x, toBoolean(true) AS b
      """
    Then the result should be, in any order:
      | t    | f     | x    | b    |
      | true | false | null | true |
    And no side effects

  Scenario: `toBoolean()` on invalid types #1
    Given any graph
    When executing query:
      """
      RETURN toBoolean(1)
      """
    Then a TypeError should be raised at compile time: InvalidArgumentValue
    And no side effects

  Scenario: `toBoolean()` on invalid types #2
    Given any graph
    When executing query:
      """
      RETURN toBoolean(1.5)
      """
    Then a TypeError should be raised at compile time: InvalidArgumentValue
    And no side effects

  Scenario: `toBoolean()` on invalid types #3
    Given any graph
    When executing query:
      """
      RETURN toBoolean([true])
      """
    Then a TypeError should be raised at compile time: InvalidArgumentValue
    And no side effects

  Scenario: `toBoolean()` on invalid types #4
    Given any graph
    When executing query:
      """
      RETURN toBoolean({x: true})
      """
    Then a TypeError should be raised at compile time: InvalidArgumentValue
    And no side effects
  Scenario: `toInteger()` handling Any type
    Given any graph
    When executing query:
      """
      UNWIND [{v: '42'}, {v: 42}] AS m RETURN toInteger(m.v) AS x
      """
    Then the result should be, in any order:
      | x  |
      | 42 |
      | 42 |
    And no side effects

  Scenario: `toFloat()` handling Any type
    Given any graph
    When executing query:
      """
      UNWIND [{v: '0.5'}, {v: 0.5}] AS m RETURN toFloat(m.v) AS x
      """
    Then the result should be, in any order:
      | x   |
      | 0.5 |
      | 0.5 |
    And no side effects

  Scenario: `toString()` should work on Any type
    Given any graph
    When executing query:
      """
      UNWIND [{v: 1}, {v: 'a'}, {v: true}] AS m RETURN toString(m.v) AS x
      """
    Then the result should be, in any order:
      | x      |
      | '1'    |
      | 'a'    |
      | 'true' |
    And no side effects
  Scenario: `toInteger()` failing on invalid arguments #1
    Given any graph
    When executing query:
      """
      RETURN toInteger(true) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toInteger()` failing on invalid arguments #2
    Given any graph
    When executing query:
      """
      RETURN toInteger([1, 2]) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toInteger()` failing on invalid arguments #3
    Given any graph
    When executing query:
      """
      RETURN toInteger({a: 1}) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toInteger()` failing on invalid arguments #4
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})
      """
    When executing query:
      """
      MATCH (n:A) RETURN toInteger(n) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toInteger()` failing on invalid arguments #5
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})-[:X]->(:B)
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN toInteger(r) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toInteger()` failing on invalid arguments #6
    Given any graph
    When executing query:
      """
      RETURN toInteger([]) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toFloat()` failing on invalid arguments #1
    Given any graph
    When executing query:
      """
      RETURN toFloat(false) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toFloat()` failing on invalid arguments #2
    Given any graph
    When executing query:
      """
      RETURN toFloat([0.5]) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toFloat()` failing on invalid arguments #3
    Given any graph
    When executing query:
      """
      RETURN toFloat({a: 0.5}) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toFloat()` failing on invalid arguments #4
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})
      """
    When executing query:
      """
      MATCH (n:A) RETURN toFloat(n) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toFloat()` failing on invalid arguments #5
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})-[:X]->(:B)
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN toFloat(r) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toFloat()` failing on invalid arguments #6
    Given any graph
    When executing query:
      """
      RETURN toFloat([true]) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toString()` failing on invalid arguments #1
    Given any graph
    When executing query:
      """
      RETURN toString([1, 2]) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toString()` failing on invalid arguments #2
    Given any graph
    When executing query:
      """
      RETURN toString({a: 1}) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toString()` failing on invalid arguments #3
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})
      """
    When executing query:
      """
      MATCH (n:A) RETURN toString(n) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toString()` failing on invalid arguments #4
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'A'})-[:X]->(:B)
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN toString(r) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: `toString()` failing on invalid arguments #5
    Given any graph
    When executing query:
      """
      RETURN toString([]) AS x
      """
    Then a TypeError should be raised at compile time
    And no side effects
