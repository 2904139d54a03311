Feature: PathFunctions

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'a', num: 1}), (b:B {name: 'b', num: 2}),
             (c:C {name: 'c', num: 3}),
             (a)-[:KNOWS {w: 1}]->(b), (b)-[:KNOWS {w: 2}]->(c)
      """

  Scenario: Path length over two hops
    When executing query:
      """
      MATCH p = (a:A)-[:KNOWS]->()-[:KNOWS]->() RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 2 |
    And no side effects

  Scenario: Comprehension over the nodes of a path
    When executing query:
      """
      MATCH p = (a:A)-[:KNOWS]->(b) RETURN [n IN nodes(p) | n.name] AS ns
      """
    Then the result should be, in any order:
      | ns         |
      | ['a', 'b'] |
    And no side effects

  Scenario: Comprehension over the relationships of a path
    When executing query:
      """
      MATCH p = (a:A)-[:KNOWS]->()-[:KNOWS]->()
      RETURN [r IN relationships(p) | r.w] AS ws
      """
    Then the result should be, in any order:
      | ws     |
      | [1, 2] |
    And no side effects

  Scenario: Quantifier over path relationships in WHERE
    When executing query:
      """
      MATCH p = (x)-[:KNOWS]->()-[:KNOWS]->(z)
      WHERE all(r IN relationships(p) WHERE r.w <= 2)
      RETURN x.name AS x, z.name AS z
      """
    Then the result should be, in any order:
      | x   | z   |
      | 'a' | 'c' |
    And no side effects

  Scenario: Node and relationship counts along a variable-length path
    When executing query:
      """
      MATCH p = (a:A)-[:KNOWS*1..2]->(x)
      RETURN size(nodes(p)) AS n, size(relationships(p)) AS r
      """
    Then the result should be, in any order:
      | n | r |
      | 2 | 1 |
      | 3 | 2 |
    And no side effects

  Scenario: startNode and endNode agree with the matched endpoints
    When executing query:
      """
      MATCH (x)-[r:KNOWS {w: 1}]->(y)
      RETURN startNode(r) = id(x) AS s, endNode(r) = id(y) AS e
      """
    Then the result should be, in any order:
      | s    | e    |
      | true | true |
    And no side effects

  Scenario: id is stable across clauses in one query
    When executing query:
      """
      MATCH (x:A)-[:KNOWS]->(y) WITH x, y
      MATCH (x2) WHERE id(x2) = id(x) RETURN x2.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
    And no side effects
