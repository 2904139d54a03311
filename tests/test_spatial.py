"""Spatial point type: construction, accessors, distance, storage.

Plan discipline: every spatial expression is pure Column math — the
physical plan must contain no Python evaluation node (BatchEvalPython /
ArrowEvalPython), i.e. the whole surface stays JVM-side.
"""
import math

import pytest

from cypher_for_apache_flink_spark.graph import PropertyGraph


@pytest.fixture(scope="module")
def empty(spark):
    return PropertyGraph({}, {}, name="empty")


def rows(g, q):
    return g.cypher(q).to_maps()


def test_cartesian_point_accessors(empty):
    out = rows(empty, "WITH point({x: 3.0, y: 4.0}) AS p "
                      "RETURN p.x AS x, p.y AS y, p.crs AS crs, "
                      "p.srid AS srid, p.z AS z")
    assert out == [{"x": 3.0, "y": 4.0, "crs": "cartesian",
                    "srid": 7203, "z": None}]


def test_geographic_point_accessors(empty):
    out = rows(empty, "WITH point({latitude: 55.5, longitude: 12.5, "
                      "height: 10.0}) AS p "
                      "RETURN p.latitude AS lat, p.longitude AS lon, "
                      "p.height AS h, p.srid AS srid")
    assert out == [{"lat": 55.5, "lon": 12.5, "h": 10.0, "srid": 4979}]


def test_latitude_of_cartesian_is_null(empty):
    out = rows(empty, "RETURN point({x: 1, y: 2}).latitude AS lat")
    assert out == [{"lat": None}]


def test_cartesian_distance(empty):
    out = rows(empty, "RETURN distance(point({x: 0.0, y: 0.0}), "
                      "point({x: 3.0, y: 4.0})) AS d")
    assert out == [{"d": 5.0}]


def test_geographic_distance_matches_stdlib_haversine(empty):
    out = rows(empty,
               "RETURN distance(point({latitude: 55.61, longitude: 12.99}),"
               " point({latitude: 55.61, longitude: 12.98})) AS d")
    lat = math.radians(55.61)
    dlam = math.radians(0.01) / 2
    h = math.cos(lat) ** 2 * math.sin(dlam) ** 2
    want = 2 * 6378137.0 * math.asin(math.sqrt(h))
    assert abs(out[0]["d"] - want) < 1e-6


def test_crs_mismatch_is_null(empty):
    out = rows(empty, "RETURN distance(point({x: 0, y: 0}), "
                      "point({latitude: 0.0, longitude: 0.0})) AS d")
    assert out == [{"d": None}]


def test_point_storage_roundtrip(empty):
    r = empty.cypher("CREATE ({loc: point({x: 1.0, y: 2.0})})")
    g2 = r.graph
    out = g2.cypher("MATCH (n) RETURN n.loc.x AS x, n.loc.srid AS srid") \
        .to_maps()
    assert out == [{"x": 1.0, "srid": 7203}]


def test_spatial_plan_is_jvm_side(empty):
    df = empty.cypher(
        "WITH point({latitude: 1.0, longitude: 2.0}) AS a, "
        "point({latitude: 3.0, longitude: 4.0}) AS b "
        "RETURN distance(a, b) AS d").df
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan        # no Python UDF in the plan
