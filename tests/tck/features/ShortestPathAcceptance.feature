Feature: ShortestPathAcceptance

  Scenario: Finding a single shortest path
    Given an empty graph
    And having executed:
      """
      CREATE (a:S)-[:R]->(b1:N)-[:R]->(c:E),
             (a)-[:R]->(d:N)-[:R]->(e:N)-[:R]->(c)
      """
    When executing query:
      """
      MATCH p = shortestPath((a:S)-[:R*]->(c:E))
      RETURN length(p) AS len
      """
    Then the result should be, in any order:
      | len |
      | 2   |
    And no side effects

  Scenario: Finding all shortest paths
    Given an empty graph
    And having executed:
      """
      CREATE (a:S {name: 'a'})-[:R]->(:N {name: 'b1'})-[:R]->(c:E {name: 'c'}),
             (a)-[:R]->(:N {name: 'b2'})-[:R]->(c),
             (a)-[:R]->(:N {name: 'd'})-[:R]->(:N {name: 'e'})-[:R]->(c)
      """
    When executing query:
      """
      MATCH p = allShortestPaths((a:S)-[:R*]->(c:E))
      RETURN [n IN nodes(p) | n.name] AS names
      """
    Then the result should be, in any order:
      | names              |
      | ['a', 'b1', 'c']   |
      | ['a', 'b2', 'c']   |
    And no side effects

  Scenario: Undirected shortest path
    Given an empty graph
    And having executed:
      """
      CREATE (a:S)-[:R]->(:N)-[:R]->(c:E)
      """
    When executing query:
      """
      MATCH p = shortestPath((c:E)-[:R*]-(a:S))
      RETURN length(p) AS len
      """
    Then the result should be, in any order:
      | len |
      | 2   |
    And no side effects

  Scenario: Shortest path respecting the upper bound
    Given an empty graph
    And having executed:
      """
      CREATE (a:S)-[:R]->(:N)-[:R]->(:N)-[:R]->(c:E)
      """
    When executing query:
      """
      MATCH p = shortestPath((a:S)-[:R*..2]->(c:E))
      RETURN length(p) AS len
      """
    Then the result should be empty
    And no side effects

  Scenario: No path means no match row
    Given an empty graph
    And having executed:
      """
      CREATE (:S), (:E)
      """
    When executing query:
      """
      MATCH p = shortestPath((a:S)-[:R*]->(c:E))
      RETURN length(p) AS len
      """
    Then the result should be empty
    And no side effects

  Scenario: Shortest path binds the relationship list variable
    Given an empty graph
    And having executed:
      """
      CREATE (a:S)-[:R {w: 1}]->(:N)-[:R {w: 2}]->(c:E)
      """
    When executing query:
      """
      MATCH p = shortestPath((a:S)-[r:R*]->(c:E))
      RETURN size(r) AS n, [x IN r | x.w] AS ws
      """
    Then the result should be, in any order:
      | n | ws     |
      | 2 | [1, 2] |
    And no side effects

  Scenario: Zero-length shortest path when endpoints coincide
    Given an empty graph
    And having executed:
      """
      CREATE (:Both:S:E)
      """
    When executing query:
      """
      MATCH p = shortestPath((a:S)-[:R*0..]->(c:E))
      RETURN length(p) AS len
      """
    Then the result should be, in any order:
      | len |
      | 0   |
    And no side effects

  Scenario: Fail on unsupported minimal length
    Given an empty graph
    And having executed:
      """
      CREATE (:S), (:E)
      """
    When executing query:
      """
      MATCH p = shortestPath((a:S)-[:R*3..]->(c:E))
      RETURN length(p) AS len
      """
    Then a SyntaxError should be raised at compile time: InvalidShortestPathMinLength
