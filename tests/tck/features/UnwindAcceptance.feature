Feature: UnwindAcceptance

  Scenario: Unwind a list literal
    Given any graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS i RETURN i
      """
    Then the result should be, in any order:
      | i |
      | 1 |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Unwind null produces no rows
    Given any graph
    When executing query:
      """
      UNWIND null AS i RETURN i
      """
    Then the result should be empty
    And no side effects

  Scenario: Unwind an empty list produces no rows
    Given any graph
    When executing query:
      """
      UNWIND [] AS i RETURN i
      """
    Then the result should be empty
    And no side effects

  Scenario: Unwind a range with a step
    Given any graph
    When executing query:
      """
      UNWIND range(1, 10, 3) AS i RETURN i
      """
    Then the result should be, in any order:
      | i  |
      | 1  |
      | 4  |
      | 7  |
      | 10 |
    And no side effects

  Scenario: Nested lists flatten through two unwinds
    Given any graph
    When executing query:
      """
      UNWIND [[1, 2], [3]] AS xs UNWIND xs AS x RETURN x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Unwind keeps duplicates which DISTINCT then removes
    Given any graph
    When executing query:
      """
      UNWIND [1, 1, 2] AS i RETURN DISTINCT i
      """
    Then the result should be, in any order:
      | i |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Unwind then aggregate
    Given any graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS i RETURN sum(i) AS s, count(*) AS c
      """
    Then the result should be, in any order:
      | s  | c |
      | 10 | 4 |
    And no side effects

  Scenario: Unwind a collected list round-trips
    Given an empty graph
    And having executed:
      """
      CREATE (:W {v: 1}), (:W {v: 2})
      """
    When executing query:
      """
      MATCH (w:W) WITH collect(w.v) AS vs UNWIND vs AS v RETURN v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Unwinding a collected expression
    Given an empty graph
    And having executed:
      """
      CREATE (:E {row: 1}), (:E {row: 2})
      """
    When executing query:
      """
      MATCH (row:E)
      WITH collect(row.row) AS rows
      UNWIND rows AS x
      RETURN x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Unwind does not remove variables from scope
    Given an empty graph
    And having executed:
      """
      CREATE (s:S {name: 's'})-[:X]->(:X {name: 'x'}), (s)-[:Y]->(:Y {name: 'y'})
      """
    When executing query:
      """
      MATCH (a:S)-[:X]->(b1)
      WITH a, collect(b1.name) AS bees
      UNWIND bees AS b2
      MATCH (a)-[:Y]->(c)
      RETURN b2 AS b, c.name AS c
      """
    Then the result should be, in any order:
      | b   | c   |
      | 'x' | 'y' |
    And no side effects

  Scenario: Creating nodes from an unwound parameter list
    Given an empty graph
    And having executed:
      """
      CREATE (:Year {year: 2016})
      """
    And parameters are:
      | events | [{year: 2016, id: 1}, {year: 2016, id: 2}] |
    When executing query:
      """
      UNWIND $events AS event
      MATCH (y:Year {year: event.year})
      MERGE (e:Event {id: event.id})
      MERGE (y)<-[:IN]-(e)
      RETURN e.id AS x
      ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |
    And the side effects should be:
      | +nodes         | 2 |
      | +relationships | 2 |
      | +labels        | 2 |
      | +properties    | 2 |

  Scenario: Unwind with merge
    Given an empty graph
    And parameters are:
      | props | [{login: 'login1', name: 'name1'}, {login: 'login2', name: 'name2'}] |
    When executing query:
      """
      UNWIND $props AS prop
      MERGE (p:Person {login: prop.login})
      SET p.name = prop.name
      RETURN p.name AS name, p.login AS login
      """
    Then the result should be, in any order:
      | name    | login    |
      | 'name1' | 'login1' |
      | 'name2' | 'login2' |
    And the side effects should be:
      | +nodes      | 2 |
      | +labels     | 2 |
      | +properties | 4 |
