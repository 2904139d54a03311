"""FOREACH planning: distributed per-element mutation, scope rules.

The loop compiles to one ``explode`` over the binding table — iteration is
data-parallel, never a driver loop — and the loop variable dies with the
clause (openCypher scope rule).
"""
import pytest

from cypher_for_apache_flink_spark.errors import PlanError
from cypher_for_apache_flink_spark.graph import PropertyGraph
from cypher_for_apache_flink_spark.sources.create import graph_from_create
from cypher_for_apache_flink_spark.tck.runner import graph_side_effects


@pytest.fixture(scope="module")
def empty(spark):
    return PropertyGraph({}, {}, name="empty")


def effects(g, q):
    r = g.cypher(q)
    r.to_maps()
    return graph_side_effects(g, r.graph)


def test_foreach_create(empty):
    assert effects(empty, "FOREACH (i IN [1, 2, 3] | CREATE (:N {v: i}))") \
        == {"+nodes": 3, "+labels": 3, "+properties": 3}


def test_foreach_set_on_collected_nodes(spark):
    g = graph_from_create(spark, "CREATE ({x: 1}), ({x: 2})")
    assert effects(g, "MATCH (n) WITH collect(n) AS ns "
                      "FOREACH (m IN ns | SET m.flag = true)") \
        == {"+properties": 2}


def test_foreach_over_path_nodes(spark):
    g = graph_from_create(spark, "CREATE (:S)-[:R]->(:M)-[:R]->(:E)")
    assert effects(g, "MATCH p = (:S)-->()-->(:E) "
                      "FOREACH (n IN nodes(p) | SET n.seen = 1)") \
        == {"+properties": 3}


def test_foreach_null_list_noop(spark):
    g = graph_from_create(spark, "CREATE ({x: 1})")
    assert effects(g, "MATCH (n) FOREACH (i IN n.missing | SET n.y = 1)") \
        == {}


def test_foreach_loop_var_not_in_scope(empty):
    with pytest.raises(PlanError):
        empty.cypher("FOREACH (i IN [1] | CREATE ()) RETURN i").to_maps()


def test_foreach_shadowing_rejected(spark):
    g = graph_from_create(spark, "CREATE ()")
    with pytest.raises(PlanError):
        g.cypher("MATCH (n) FOREACH (n IN [1] | CREATE ())").to_maps()


def test_foreach_non_list_rejected(empty):
    with pytest.raises(PlanError):
        empty.cypher("FOREACH (i IN 42 | CREATE ())").to_maps()


def test_delete_from_chained_with_alias(spark):
    # shape registry carries container-entity typing across TWO hops
    g = graph_from_create(spark, "CREATE (:User {name: 'x'})")
    assert effects(g, "MATCH (u:User) WITH {key: u} AS m "
                      "WITH m DELETE m.key") \
        == {"-nodes": 1, "-labels": 1, "-properties": 1}
