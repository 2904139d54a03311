Feature: SpatialAcceptance

  Scenario: Creating a cartesian point and reading its coordinates
    Given any graph
    When executing query:
      """
      WITH point({x: 3.0, y: 4.0}) AS p
      RETURN p.x AS x, p.y AS y, p.crs AS crs, p.srid AS srid
      """
    Then the result should be, in any order:
      | x   | y   | crs         | srid |
      | 3.0 | 4.0 | 'cartesian' | 7203 |
    And no side effects

  Scenario: Creating a geographic point and reading its coordinates
    Given any graph
    When executing query:
      """
      WITH point({latitude: 55.6, longitude: 12.6}) AS p
      RETURN p.latitude AS lat, p.longitude AS lon, p.crs AS crs, p.srid AS srid
      """
    Then the result should be, in any order:
      | lat  | lon  | crs      | srid |
      | 55.6 | 12.6 | 'wgs-84' | 4326 |
    And no side effects

  Scenario: Cartesian distance is euclidean
    Given any graph
    When executing query:
      """
      RETURN distance(point({x: 0.0, y: 0.0}), point({x: 3.0, y: 4.0})) AS d
      """
    Then the result should be, in any order:
      | d   |
      | 5.0 |
    And no side effects

  Scenario: Cartesian 3D distance is euclidean
    Given any graph
    When executing query:
      """
      RETURN distance(point({x: 0, y: 0, z: 0}), point({x: 1, y: 2, z: 2})) AS d
      """
    Then the result should be, in any order:
      | d   |
      | 3.0 |
    And no side effects

  Scenario: Geographic distance uses haversine on the WGS-84 radius
    Given any graph
    When executing query:
      """
      RETURN round(distance(point({latitude: 55.61, longitude: 12.99}), point({latitude: 55.61, longitude: 12.98}))) AS d
      """
    Then the result should be, in any order:
      | d     |
      | 629.0 |
    And no side effects

  Scenario: Distance between different coordinate systems is null
    Given any graph
    When executing query:
      """
      RETURN distance(point({x: 0, y: 0}), point({latitude: 0.0, longitude: 0.0})) AS d
      """
    Then the result should be, in any order:
      | d    |
      | null |
    And no side effects

  Scenario: Point of null is null
    Given any graph
    When executing query:
      """
      RETURN point(null) AS p, distance(point(null), point({x: 1, y: 2})) AS d
      """
    Then the result should be, in any order:
      | p    | d    |
      | null | null |
    And no side effects

  Scenario: Storing a point as a node property
    Given an empty graph
    When executing query:
      """
      CREATE (n {loc: point({x: 1.0, y: 2.0})})
      RETURN n.loc.x AS x, n.loc.crs AS crs
      """
    Then the result should be, in any order:
      | x   | crs         |
      | 1.0 | 'cartesian' |
    And the side effects should be:
      | +nodes      | 1 |
      | +properties | 1 |

  Scenario: toString on points
    Given any graph
    When executing query:
      """
      RETURN toString(point({x: 1.0, y: 2.0})) AS s
      """
    Then the result should be, in any order:
      | s |
      | 'point({x: 1.0, y: 2.0, crs: \'cartesian\'})' |
    And no side effects

  Scenario: Point with explicit srid
    Given any graph
    When executing query:
      """
      RETURN point({x: 1.0, y: 2.0, srid: 9157, z: 3.0}).crs AS crs
      """
    Then the result should be, in any order:
      | crs            |
      | 'cartesian-3d' |
    And no side effects
