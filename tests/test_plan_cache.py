"""Session plan cache (round 8, VERDICT r7 #6).

The reference extracts literals to parameters for plan-cache friendliness
(CypherParser.scala:72, RelationalCypherSession.scala:146-149); here the
planned DataFrame itself is memoized per (skeleton, graph, params), so a
dashboard re-issuing the same queries skips parse+plan+Catalyst analysis.
"""

import pytest

from cypher_for_apache_flink_spark import CypherSession, PropertyGraph
from cypher_for_apache_flink_spark.sources.create import graph_from_create


@pytest.fixture()
def sess_graph(spark):
    g = graph_from_create(spark, "CREATE (:A {x: 1})-[:R]->(:B {x: 2})")
    s = CypherSession.for_graph(g)
    return s, g


def test_identical_query_hits(sess_graph):
    # admission on SECOND use: sighting 1 stores a marker, sighting 2
    # replans and admits, sighting 3+ hit -- one-shot queries never pin
    # an analyzed plan (round-8 heap fix)
    s, g = sess_graph
    q = "MATCH (a:A) RETURN a.x AS x"
    r1 = s.cypher(q).to_maps()
    r2 = s.cypher(q).to_maps()
    r3 = s.cypher(q).to_maps()
    assert r1 == r2 == r3 == [{"x": 1}]
    assert s.plan_cache_stats == {"hits": 1, "misses": 2}


def test_different_literal_misses(sess_graph):
    s, g = sess_graph
    assert s.cypher("MATCH (a:A) WHERE a.x < 5 RETURN a.x AS x").to_maps() \
        == [{"x": 1}]
    assert s.cypher("MATCH (a:A) WHERE a.x < 1 RETURN a.x AS x").to_maps() \
        == []
    assert s.plan_cache_stats["hits"] == 0


def test_explicit_params_key_the_cache(sess_graph):
    s, g = sess_graph
    q = "MATCH (a:A) WHERE a.x = $v RETURN a.x AS x"
    assert s.cypher(q, params={"v": 1}).to_maps() == [{"x": 1}]
    assert s.cypher(q, params={"v": 2}).to_maps() == []
    assert s.cypher(q, params={"v": 1}).to_maps() == [{"x": 1}]
    assert s.cypher(q, params={"v": 1}).to_maps() == [{"x": 1}]
    assert s.plan_cache_stats == {"hits": 1, "misses": 3}


def test_mutating_queries_not_cached(sess_graph):
    s, g = sess_graph
    r1 = s.cypher("CREATE (:C {y: 1}) RETURN 1 AS one")
    r2 = s.cypher("CREATE (:C {y: 1}) RETURN 1 AS one")
    # each execution mints a fresh result graph
    assert r1.graph is not None and r2.graph is not None
    assert r1.graph is not r2.graph
    assert s.plan_cache_stats["hits"] == 0


def test_register_invalidates(sess_graph):
    s, g = sess_graph
    q = "FROM GRAPH other MATCH (n:Z) RETURN n.z AS z"
    g2 = graph_from_create(g.node_tables.get(
        frozenset({"A"})).sparkSession if g.node_tables else None,
        "CREATE (:Z {z: 1})")
    s.register("other", g2)
    assert s.cypher(q).to_maps() == [{"z": 1}]
    g3 = graph_from_create(g2.node_tables[
        frozenset({"Z"})].sparkSession, "CREATE (:Z {z: 9})")
    s.register("other", g3)     # re-registration bumps the epoch
    assert s.cypher(q).to_maps() == [{"z": 9}]


def test_graph_identity_guards_the_hit(spark):
    # same session, same query text, DIFFERENT graph object: no stale hit
    s = CypherSession(spark)
    g1 = graph_from_create(spark, "CREATE (:A {x: 1})")
    g2 = graph_from_create(spark, "CREATE (:A {x: 2})")
    s.register("g1", g1)
    s.register("g2", g2)
    q = "MATCH (a:A) RETURN a.x AS x"
    assert s.cypher(q, graph=g1).to_maps() == [{"x": 1}]
    assert s.cypher(q, graph=g2).to_maps() == [{"x": 2}]
    assert s.cypher(q, graph=g1).to_maps() == [{"x": 1}]
    assert s.cypher(q, graph=g1).to_maps() == [{"x": 1}]
    assert s.plan_cache_stats["hits"] == 1


def test_cache_bounded(sess_graph):
    s, g = sess_graph
    s.PLAN_CACHE_MAX = 4
    for i in range(10):
        s.cypher(f"RETURN 'k{i}' AS tag, {i} AS v").to_maps()
    assert len(s._plan_cache) <= 4


def test_graph_cypher_memoizes_session(spark):
    g = graph_from_create(spark, "CREATE (:A {x: 1})")
    q = "MATCH (a:A) RETURN a.x AS x"
    assert g.cypher(q).to_maps() == [{"x": 1}]
    assert g.cypher(q).to_maps() == [{"x": 1}]
    assert g.cypher(q).to_maps() == [{"x": 1}]
    s = g.__dict__["_implicit_session"]
    assert s.plan_cache_stats["hits"] >= 1
