Feature: LargeCreateQuery

  Scenario: Generate the movie graph correctly
    Given an empty graph
    When executing query:
      """
      CREATE (m1:Movie {title: 'The Matrix', released: 1999}),
             (m2:Movie {title: 'Cloud Atlas', released: 2012}),
             (m3:Movie {title: 'Speed Racer', released: 2008}),
             (m4:Movie {title: 'The Replacements', released: 2000}),
             (m5:Movie {title: 'Unforgiven', released: 1992}),
             (m6:Movie {title: 'Apollo 13', released: 1995}),
             (p1:Person {name: 'Keanu Reeves', born: 1964}),
             (p2:Person {name: 'Carrie-Anne Moss', born: 1967}),
             (p3:Person {name: 'Laurence Fishburne', born: 1961}),
             (p4:Person {name: 'Hugo Weaving', born: 1960}),
             (p5:Person {name: 'Tom Hanks', born: 1956}),
             (p6:Person {name: 'Clint Eastwood', born: 1930}),
             (p7:Person {name: 'Gene Hackman', born: 1930}),
             (p8:Person {name: 'Lana Wachowski', born: 1965}),
             (p1)-[:ACTED_IN {roles: ['Neo']}]->(m1),
             (p1)-[:ACTED_IN {roles: ['Shane Falco']}]->(m4),
             (p2)-[:ACTED_IN {roles: ['Trinity']}]->(m1),
             (p2)-[:ACTED_IN {roles: ['Luisa Rey']}]->(m2),
             (p3)-[:ACTED_IN {roles: ['Morpheus']}]->(m1),
             (p3)-[:ACTED_IN {roles: ['Racer X']}]->(m3),
             (p4)-[:ACTED_IN {roles: ['Agent Smith']}]->(m1),
             (p4)-[:ACTED_IN {roles: ['Bill Smoke']}]->(m2),
             (p5)-[:ACTED_IN {roles: ['Zachry']}]->(m2),
             (p5)-[:ACTED_IN {roles: ['Jim Lovell']}]->(m6),
             (p6)-[:ACTED_IN {roles: ['Bill Munny']}]->(m5),
             (p6)-[:ACTED_IN {roles: ['Coach']}]->(m4),
             (p7)-[:ACTED_IN {roles: ['Little Bill Daggett']}]->(m5),
             (p7)-[:ACTED_IN {roles: ['Coach Stark']}]->(m4),
             (p8)-[:ACTED_IN {roles: ['Cameo']}]->(m3),
             (p8)-[:ACTED_IN {roles: ['Cameo']}]->(m2),
             (p8)-[:DIRECTED]->(m1),
             (p8)-[:DIRECTED]->(m2),
             (p8)-[:DIRECTED]->(m3),
             (p6)-[:DIRECTED]->(m5),
             (p6)-[:DIRECTED]->(m4),
             (p5)-[:DIRECTED]->(m6)
      """
    Then the result should be empty
    And the side effects should be:
      | +nodes         | 14 |
      | +relationships | 22 |
      | +labels        | 14 |
      | +properties    | 44 |

  Scenario: Many CREATE clauses
    Given an empty graph
    When executing query:
      """
      CREATE (a1:L {i: 1})
      CREATE (a2:L {i: 2})
      CREATE (a3:L {i: 3})
      CREATE (a4:L {i: 4})
      CREATE (a5:L {i: 5})
      CREATE (a6:L {i: 6})
      CREATE (a7:L {i: 7})
      CREATE (a8:L {i: 8})
      CREATE (a9:L {i: 9})
      CREATE (a10:L {i: 10})
      CREATE (a1)-[:R]->(a2)
      CREATE (a2)-[:R]->(a3)
      CREATE (a3)-[:R]->(a4)
      CREATE (a4)-[:R]->(a5)
      CREATE (a5)-[:R]->(a6)
      CREATE (a6)-[:R]->(a7)
      CREATE (a7)-[:R]->(a8)
      CREATE (a8)-[:R]->(a9)
      CREATE (a9)-[:R]->(a10)
      CREATE (a10)-[:R]->(a1)
      """
    Then the result should be empty
    And the side effects should be:
      | +nodes         | 10 |
      | +relationships | 10 |
      | +labels        | 10 |
      | +properties    | 10 |
