Feature: ProcedureCallAcceptance

  Scenario: Standalone call to procedure that takes no arguments
    Given an empty graph
    And there exists a procedure test.labels() :: (label :: STRING?):
      | label |
      | 'A'   |
      | 'B'   |
      | 'C'   |
    When executing query:
      """
      CALL test.labels()
      """
    Then the result should be, in any order:
      | label |
      | 'A'   |
      | 'B'   |
      | 'C'   |
    And no side effects

  Scenario: Standalone call to VOID procedure that takes no arguments
    Given an empty graph
    And there exists a procedure test.doNothing() :: VOID:
      | |
    When executing query:
      """
      CALL test.doNothing()
      """
    Then the result should be empty
    And no side effects

  Scenario: Standalone call to VOID procedure that takes no arguments, called with implicit arguments
    Given an empty graph
    And there exists a procedure test.doNothing() :: VOID:
      | |
    When executing query:
      """
      CALL test.doNothing
      """
    Then the result should be empty
    And no side effects

  Scenario: Standalone call to procedure that takes no arguments and yields no results
    Given an empty graph
    And there exists a procedure test.doNothing() :: (none :: INTEGER?):
      | none |
    When executing query:
      """
      CALL test.doNothing()
      """
    Then the result should be empty
    And no side effects

  Scenario: Standalone call to procedure that takes no arguments and yields no results, called with implicit arguments
    Given an empty graph
    And there exists a procedure test.doNothing() :: (none :: INTEGER?):
      | none |
    When executing query:
      """
      CALL test.doNothing
      """
    Then the result should be empty
    And no side effects

  Scenario: Standalone call to procedure with explicit arguments
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?, id :: INTEGER?) :: (city :: STRING?, country_code :: INTEGER?):
      | name     | id | city     | country_code |
      | 'Andres' | 1  | 'Malmo'  | 46           |
      | 'Tobias' | 1  | 'Malmo'  | 46           |
      | 'Mats'   | 1  | 'Malmo'  | 46           |
      | 'Stefan' | 1  | 'Berlin' | 49           |
      | 'Stefan' | 2  | 'Europe' | null         |
      | null     | 1  | 'York'   | 28           |
    When executing query:
      """
      CALL test.my.proc('Stefan', 1)
      """
    Then the result should be, in any order:
      | city     | country_code |
      | 'Berlin' | 49           |
    And no side effects

  Scenario: Standalone call to procedure with implicit arguments
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?, id :: INTEGER?) :: (city :: STRING?, country_code :: INTEGER?):
      | name     | id | city     | country_code |
      | 'Andres' | 1  | 'Malmo'  | 46           |
      | 'Stefan' | 1  | 'Berlin' | 49           |
    And parameters are:
      | name | 'Stefan' |
      | id   | 1        |
    When executing query:
      """
      CALL test.my.proc
      """
    Then the result should be, in any order:
      | city     | country_code |
      | 'Berlin' | 49           |
    And no side effects

  Scenario: Standalone call to procedure with null argument
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?, id :: INTEGER?) :: (city :: STRING?, country_code :: INTEGER?):
      | name     | id | city     | country_code |
      | 'Andres' | 1  | 'Malmo'  | 46           |
      | null     | 1  | 'York'   | 28           |
    When executing query:
      """
      CALL test.my.proc(null, 1)
      """
    Then the result should be, in any order:
      | city   | country_code |
      | 'York' | 28           |
    And no side effects

  Scenario: Standalone call to procedure with argument of type INTEGER accepts value of type FLOAT
    Given an empty graph
    And there exists a procedure test.my.proc(in :: INTEGER?) :: (out :: STRING?):
      | in | out    |
      | 42 | 'wisdom' |
    When executing query:
      """
      CALL test.my.proc(42.0)
      """
    Then the result should be, in any order:
      | out      |
      | 'wisdom' |
    And no side effects

  Scenario: Standalone call to procedure with argument of type FLOAT accepts value of type INTEGER
    Given an empty graph
    And there exists a procedure test.my.proc(in :: FLOAT?) :: (out :: STRING?):
      | in   | out      |
      | 42.0 | 'wisdom' |
    When executing query:
      """
      CALL test.my.proc(42)
      """
    Then the result should be, in any order:
      | out      |
      | 'wisdom' |
    And no side effects

  Scenario: Standalone call to procedure with argument of type NUMBER accepts value of type INTEGER
    Given an empty graph
    And there exists a procedure test.my.proc(in :: NUMBER?) :: (out :: STRING?):
      | in | out      |
      | 42 | 'wisdom' |
    When executing query:
      """
      CALL test.my.proc(42)
      """
    Then the result should be, in any order:
      | out      |
      | 'wisdom' |
    And no side effects

  Scenario: Standalone call to procedure with argument of type NUMBER accepts value of type FLOAT
    Given an empty graph
    And there exists a procedure test.my.proc(in :: NUMBER?) :: (out :: STRING?):
      | in   | out      |
      | 42.0 | 'wisdom' |
    When executing query:
      """
      CALL test.my.proc(42.0)
      """
    Then the result should be, in any order:
      | out      |
      | 'wisdom' |
    And no side effects

  Scenario: In-query call to procedure that takes no arguments
    Given an empty graph
    And there exists a procedure test.labels() :: (label :: STRING?):
      | label |
      | 'A'   |
      | 'B'   |
      | 'C'   |
    When executing query:
      """
      CALL test.labels() YIELD label
      RETURN label
      """
    Then the result should be, in any order:
      | label |
      | 'A'   |
      | 'B'   |
      | 'C'   |
    And no side effects

  Scenario: In-query call to VOID procedure that takes no arguments
    Given an empty graph
    And there exists a procedure test.doNothing() :: VOID:
      | |
    When executing query:
      """
      UNWIND [1, 2] AS i
      CALL test.doNothing()
      RETURN i
      """
    Then the result should be, in any order:
      | i |
      | 1 |
      | 2 |
    And no side effects

  Scenario: In-query call to VOID procedure does not consume rows
    Given an empty graph
    And there exists a procedure test.doNothing() :: VOID:
      | |
    When executing query:
      """
      UNWIND ['a', 'b', 'c'] AS x
      CALL test.doNothing()
      RETURN count(x) AS c
      """
    Then the result should be, in any order:
      | c |
      | 3 |
    And no side effects

  Scenario: In-query call to procedure that takes no arguments and yields no results
    Given an empty graph
    And there exists a procedure test.doNothing() :: (none :: INTEGER?):
      | none |
    When executing query:
      """
      UNWIND [1, 2] AS i
      CALL test.doNothing() YIELD none
      RETURN i, none
      """
    Then the result should be empty
    And no side effects

  Scenario: In-query call to procedure with explicit arguments
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?, id :: INTEGER?) :: (city :: STRING?, country_code :: INTEGER?):
      | name     | id | city     | country_code |
      | 'Andres' | 1  | 'Malmo'  | 46           |
      | 'Stefan' | 1  | 'Berlin' | 49           |
    When executing query:
      """
      UNWIND ['Andres', 'Stefan'] AS n
      CALL test.my.proc(n, 1) YIELD city, country_code
      RETURN n, city, country_code
      """
    Then the result should be, in any order:
      | n        | city     | country_code |
      | 'Andres' | 'Malmo'  | 46           |
      | 'Stefan' | 'Berlin' | 49           |
    And no side effects

  Scenario: In-query call to procedure with explicit arguments that drops all result fields
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?, id :: INTEGER?) :: (city :: STRING?, country_code :: INTEGER?):
      | name     | id | city     | country_code |
      | 'Andres' | 1  | 'Malmo'  | 46           |
      | 'Stefan' | 1  | 'Berlin' | 49           |
    When executing query:
      """
      UNWIND ['Andres', 'Stefan'] AS n
      CALL test.my.proc(n, 1) YIELD city
      WITH n
      RETURN n
      """
    Then the result should be, in any order:
      | n        |
      | 'Andres' |
      | 'Stefan' |
    And no side effects

  Scenario: In-query call to procedure with null argument
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?, id :: INTEGER?) :: (city :: STRING?, country_code :: INTEGER?):
      | name | id | city   | country_code |
      | null | 1  | 'York' | 28           |
    When executing query:
      """
      WITH null AS nm
      CALL test.my.proc(nm, 1) YIELD city
      RETURN city
      """
    Then the result should be, in any order:
      | city   |
      | 'York' |
    And no side effects

  Scenario: In-query call to procedure with argument of type INTEGER accepts value of type FLOAT
    Given an empty graph
    And there exists a procedure test.my.proc(in :: INTEGER?) :: (out :: STRING?):
      | in | out      |
      | 42 | 'wisdom' |
    When executing query:
      """
      WITH 42.0 AS x
      CALL test.my.proc(x) YIELD out
      RETURN out
      """
    Then the result should be, in any order:
      | out      |
      | 'wisdom' |
    And no side effects

  Scenario: In-query call to procedure with argument of type FLOAT accepts value of type INTEGER
    Given an empty graph
    And there exists a procedure test.my.proc(in :: FLOAT?) :: (out :: STRING?):
      | in   | out      |
      | 42.0 | 'wisdom' |
    When executing query:
      """
      WITH 42 AS x
      CALL test.my.proc(x) YIELD out
      RETURN out
      """
    Then the result should be, in any order:
      | out      |
      | 'wisdom' |
    And no side effects

  Scenario: In-query call to procedure with argument of type NUMBER accepts value of type INTEGER
    Given an empty graph
    And there exists a procedure test.my.proc(in :: NUMBER?) :: (out :: STRING?):
      | in | out      |
      | 42 | 'wisdom' |
    When executing query:
      """
      WITH 42 AS x
      CALL test.my.proc(x) YIELD out
      RETURN out
      """
    Then the result should be, in any order:
      | out      |
      | 'wisdom' |
    And no side effects

  Scenario: In-query call to procedure with argument of type NUMBER accepts value of type FLOAT
    Given an empty graph
    And there exists a procedure test.my.proc(in :: NUMBER?) :: (out :: STRING?):
      | in   | out      |
      | 42.0 | 'wisdom' |
    When executing query:
      """
      WITH 42.0 AS x
      CALL test.my.proc(x) YIELD out
      RETURN out
      """
    Then the result should be, in any order:
      | out      |
      | 'wisdom' |
    And no side effects

  Scenario: Calling the same procedure twice using the same outputs in each call
    Given an empty graph
    And there exists a procedure test.labels() :: (label :: STRING?):
      | label |
      | 'A'   |
      | 'B'   |
      | 'C'   |
    When executing query:
      """
      CALL test.labels() YIELD label
      WITH collect(label) AS first
      CALL test.labels() YIELD label
      RETURN first, count(label) AS second
      """
    Then the result should be, in any order:
      | first           | second |
      | ['A', 'B', 'C'] | 3      |
    And no side effects
  Scenario: Standalone call to unknown procedure should fail
    Given an empty graph
    When executing query:
      """
      CALL test.unknown.procedure()
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: In-query call to unknown procedure should fail
    Given an empty graph
    When executing query:
      """
      CALL test.unknown.procedure() YIELD out RETURN out
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Standalone call to procedure should fail if input type is wrong
    Given an empty graph
    And there exists a procedure test.my.proc(in :: INTEGER?) :: (out :: STRING?):
      | in | out      |
      | 42 | 'wisdom' |
    When executing query:
      """
      CALL test.my.proc(true)
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: In-query call to procedure should fail if input type is wrong
    Given an empty graph
    And there exists a procedure test.my.proc(in :: INTEGER?) :: (out :: STRING?):
      | in | out      |
      | 42 | 'wisdom' |
    When executing query:
      """
      CALL test.my.proc(true) YIELD out RETURN out
      """
    Then a TypeError should be raised at compile time
    And no side effects

  Scenario: Standalone call to procedure should fail if explicit argument is missing
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?, id :: INTEGER?) :: (city :: STRING?):
      | name     | id | city    |
      | 'Andres' | 1  | 'Malmo' |
    When executing query:
      """
      CALL test.my.proc('Andres')
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: In-query call to procedure should fail if explicit argument is missing
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?, id :: INTEGER?) :: (city :: STRING?):
      | name     | id | city    |
      | 'Andres' | 1  | 'Malmo' |
    When executing query:
      """
      CALL test.my.proc('Andres') YIELD city RETURN city
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Standalone call to procedure should fail if too many explicit argument are given
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?) :: (city :: STRING?):
      | name     | city    |
      | 'Andres' | 'Malmo' |
    When executing query:
      """
      CALL test.my.proc('Andres', 1, 2)
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: In-query call to procedure should fail if too many explicit argument are given
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?) :: (city :: STRING?):
      | name     | city    |
      | 'Andres' | 'Malmo' |
    When executing query:
      """
      CALL test.my.proc('Andres', 1, 2) YIELD city RETURN city
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: Standalone call to procedure should fail if implicit argument is missing
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?, id :: INTEGER?) :: (city :: STRING?):
      | name     | id | city    |
      | 'Andres' | 1  | 'Malmo' |
    And parameters are:
      | name | 'Andres' |
    When executing query:
      """
      CALL test.my.proc
      """
    Then a ParameterMissing should be raised at compile time
    And no side effects

  Scenario: In-query call to procedure that takes arguments fails when trying to pass them implicitly
    Given an empty graph
    And there exists a procedure test.my.proc(name :: STRING?) :: (city :: STRING?):
      | name     | city    |
      | 'Andres' | 'Malmo' |
    And parameters are:
      | name | 'Andres' |
    When executing query:
      """
      UNWIND [1] AS i
      CALL test.my.proc YIELD city
      RETURN city
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: In-query call to procedure that has outputs fails if no outputs are yielded
    Given an empty graph
    And there exists a procedure test.my.proc(in :: INTEGER?) :: (out :: STRING?):
      | in | out      |
      | 42 | 'wisdom' |
    When executing query:
      """
      UNWIND [1] AS i
      CALL test.my.proc(42)
      RETURN i
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: In-query call to procedure that both takes arguments and has outputs fails if the arguments are passed implicitly and no outputs are yielded
    Given an empty graph
    And there exists a procedure test.my.proc(in :: INTEGER?) :: (out :: STRING?):
      | in | out      |
      | 42 | 'wisdom' |
    And parameters are:
      | in | 42 |
    When executing query:
      """
      UNWIND [1] AS i
      CALL test.my.proc
      RETURN i
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: In-query procedure call should fail if shadowing an already bound variable
    Given an empty graph
    And there exists a procedure test.labels() :: (label :: STRING?):
      | label |
      | 'A'   |
    When executing query:
      """
      WITH 'x' AS label
      CALL test.labels() YIELD label
      RETURN label
      """
    Then a SyntaxError should be raised at compile time
    And no side effects

  Scenario: In-query procedure call should fail if one of the argument expressions uses an aggregation function
    Given an empty graph
    And there exists a procedure test.my.proc(in :: INTEGER?) :: (out :: STRING?):
      | in | out      |
      | 42 | 'wisdom' |
    When executing query:
      """
      MATCH (n)
      CALL test.my.proc(count(n)) YIELD out
      RETURN out
      """
    Then a SyntaxError should be raised at compile time
    And no side effects
