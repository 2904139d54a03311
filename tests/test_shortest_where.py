"""shortestPath() WHERE-clause semantics (round-8 ADVICE fix).

Neo4j finds the shortest path SATISFYING per-relationship predicates
rather than post-filtering the unconstrained shortest path.  The planner
pushes ``all()/none?(r IN relationships(p) WHERE ...)`` predicates into
the BFS edge set (plans/shortest.py edge_predicate_of); any other
predicate referencing the path raises a clear unsupported error instead
of silently returning fewer rows.
"""

import pytest

from cypher_for_apache_flink_spark.errors import PlanError
from cypher_for_apache_flink_spark.sources.create import graph_from_create


@pytest.fixture(scope="module")
def g(spark):
    # a -[w:1]-> b -[w:1]-> d  (2 hops, all cheap)
    # a -[w:9]-> d             (1 hop, expensive)
    return graph_from_create(spark, """
        CREATE (a:N {name: 'a'}), (b:N {name: 'b'}), (d:N {name: 'd'}),
               (a)-[:R {w: 1}]->(b), (b)-[:R {w: 1}]->(d),
               (a)-[:R {w: 9}]->(d)
    """)


def test_unconstrained_shortest_takes_direct_edge(g):
    out = g.cypher(
        "MATCH p = shortestPath((a:N {name: 'a'})-[:R*..5]->(d:N {name: 'd'})) "
        "RETURN length(p) AS l").to_maps()
    assert out == [{"l": 1}]


def test_rel_predicate_pushed_into_bfs(g):
    # Neo4j semantics: the shortest path whose every edge has w < 5 is the
    # 2-hop route — a post-filter of the unconstrained result would return
    # NO rows (the 1-hop path fails the predicate)
    out = g.cypher(
        "MATCH p = shortestPath((a:N {name: 'a'})-[:R*..5]->(d:N {name: 'd'})) "
        "WHERE all(r IN relationships(p) WHERE r.w < 5) "
        "RETURN length(p) AS l").to_maps()
    assert out == [{"l": 2}]


def test_none_predicate_pushed_into_bfs(g):
    out = g.cypher(
        "MATCH p = shortestPath((a:N {name: 'a'})-[:R*..5]->(d:N {name: 'd'})) "
        "WHERE none(r IN relationships(p) WHERE r.w > 5) "
        "RETURN length(p) AS l").to_maps()
    assert out == [{"l": 2}]


def test_rel_list_var_predicate_pushed(g):
    out = g.cypher(
        "MATCH shortestPath((a:N {name: 'a'})-[rs:R*..5]->(d:N {name: 'd'})) "
        "WHERE all(r IN rs WHERE r.w < 5) "
        "RETURN size(rs) AS l").to_maps()
    assert out == [{"l": 2}]


def test_endpoint_predicates_still_post_filter(g):
    out = g.cypher(
        "MATCH p = shortestPath((a:N)-[:R*..5]->(d:N)) "
        "WHERE a.name = 'a' AND d.name = 'd' "
        "RETURN length(p) AS l").to_maps()
    assert out == [{"l": 1}]


def test_unpushable_path_predicate_raises(g):
    with pytest.raises(PlanError, match="shortestPath"):
        g.cypher(
            "MATCH p = shortestPath((a:N {name: 'a'})-[:R*..5]->(d:N)) "
            "WHERE length(p) > 1 RETURN length(p) AS l")


def test_unpushable_any_predicate_raises(g):
    # any() cannot push into the edge set (it is not per-edge conjunctive)
    with pytest.raises(PlanError, match="shortestPath"):
        g.cypher(
            "MATCH p = shortestPath((a:N {name: 'a'})-[:R*..5]->(d:N)) "
            "WHERE any(r IN relationships(p) WHERE r.w > 5) "
            "RETURN length(p) AS l")


def test_correlated_rel_predicate_raises(g):
    # predicate touching the outer scope cannot be pushed either
    with pytest.raises(PlanError, match="shortestPath"):
        g.cypher(
            "MATCH p = shortestPath((a:N {name: 'a'})-[:R*..5]->(d:N)) "
            "WHERE all(r IN relationships(p) WHERE r.w < a.name) "
            "RETURN length(p) AS l")
