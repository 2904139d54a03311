Feature: CallSubqueryAcceptance

  Scenario: Post-UNION processing with CALL subquery
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'alice'}), (:P {name: 'bob'}), (:Q {name: 'carol'})
      """
    When executing query:
      """
      CALL {
        MATCH (p:P) RETURN p.name AS name
        UNION ALL
        MATCH (q:Q) RETURN q.name AS name
      }
      RETURN name
      ORDER BY name
      """
    Then the result should be, in order:
      | name    |
      | 'alice' |
      | 'bob'   |
      | 'carol' |
    And no side effects

  Scenario: Correlated aggregating subquery returns a row for empty input
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'alice', age: 30}), (:P {name: 'bob', age: 20})
      """
    When executing query:
      """
      MATCH (p:P)
      CALL {
        WITH p
        MATCH (o:P) WHERE o.age < p.age
        RETURN count(*) AS younger, collect(o.name) AS names
      }
      RETURN p.name AS name, younger, names
      ORDER BY name
      """
    Then the result should be, in order:
      | name    | younger | names   |
      | 'alice' | 1       | ['bob'] |
      | 'bob'   | 0       | []      |
    And no side effects

  Scenario: Correlated returning subquery multiplies and filters rows
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'alice'}), (:P {name: 'bob'}), (:P {name: 'carol'})
      """
    When executing query:
      """
      MATCH (p:P)
      CALL {
        WITH p
        MATCH (o:P) WHERE o.name < p.name
        RETURN o.name AS earlier
      }
      RETURN p.name AS name, earlier
      """
    Then the result should be, in any order:
      | name    | earlier |
      | 'bob'   | 'alice' |
      | 'carol' | 'alice' |
      | 'carol' | 'bob'   |
    And no side effects

  Scenario: Uncorrelated subquery cross-joins its result
    Given an empty graph
    And having executed:
      """
      CREATE (:Q {name: 'x'}), (:Q {name: 'y'})
      """
    When executing query:
      """
      MATCH (q:Q)
      CALL {
        RETURN 1 AS one
      }
      RETURN q.name AS name, one
      """
    Then the result should be, in any order:
      | name | one |
      | 'x'  | 1   |
      | 'y'  | 1   |
    And no side effects

  Scenario: Unit write subquery runs once per row
    Given an empty graph
    And having executed:
      """
      CREATE (:A), (:A)
      """
    When executing query:
      """
      MATCH (a:A)
      CALL {
        CREATE (:X)
      }
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
    And the side effects should be:
      | +nodes  | 2 |
      | +labels | 2 |

  Scenario: Correlated write subquery reads the imported variable
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:A {v: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      CALL {
        WITH a
        CREATE (:B {w: a.v})
      }
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
    And the side effects should be:
      | +nodes      | 2 |
      | +labels     | 2 |
      | +properties | 2 |

  Scenario: Importing WITH must list bare variables
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      CALL {
        WITH a.v AS v
        RETURN v AS w
      }
      RETURN w
      """
    Then a SyntaxError should be raised at compile time: ImportingWithSubqueryInvalid

  Scenario: Subquery output must not shadow an outer variable
    Given an empty graph
    And having executed:
      """
      CREATE (:A)
      """
    When executing query:
      """
      MATCH (a:A)
      CALL {
        RETURN 1 AS a
      }
      RETURN a
      """
    Then a SyntaxError should be raised at compile time: VariableAlreadyBound

  Scenario: Returning entities from a correlated subquery
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'bob'})-[:KNOWS]->(:P {name: 'alice'})
      """
    When executing query:
      """
      MATCH (p:P {name: 'bob'})
      CALL {
        WITH p
        MATCH (p)-[:KNOWS]->(o)
        RETURN o
      }
      RETURN o.name AS friend
      """
    Then the result should be, in any order:
      | friend  |
      | 'alice' |
    And no side effects
