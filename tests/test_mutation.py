"""Graph mutation tests: CREATE / MERGE / SET / REMOVE / DELETE.

Beyond-reference surface — the reference engine is read-only and
wont_fix-blacklists the TCK's mutation corpus (morpheus-tck
wont_fix_blacklist); here mutation is an immutable graph transformation
(plans/mutation.py) whose result carries a new PropertyGraph.
"""

import pytest

from cypher_for_apache_flink_spark import PropertyGraph
from cypher_for_apache_flink_spark.errors import PlanError
from cypher_for_apache_flink_spark.plans.mutation import (
    DeleteConnectedNodeError,
)
from cypher_for_apache_flink_spark.sources.create import graph_from_create
from cypher_for_apache_flink_spark.tck.runner import graph_side_effects


def combos(g):
    return sorted(tuple(sorted(c)) for c in g.node_tables)


def rows(res):
    return [tuple(r) for r in res.df.collect()]


# ---------------------------------------------------------------------------
# CREATE
# ---------------------------------------------------------------------------

def test_create_standalone(spark):
    g = PropertyGraph({}, {})
    res = g.cypher("CREATE (a:A {x: 1})-[:R {w: 2.5}]->(b:B)")
    assert res.to_maps() == []
    g2 = res.graph
    assert combos(g2) == [("A",), ("B",)]
    assert g2.rel_tables["R"].count() == 1
    r = g2.rel_tables["R"].first()
    a = g2.node_tables[frozenset({"A"})].first()
    b = g2.node_tables[frozenset({"B"})].first()
    assert (r["source"], r["target"]) == (a["id"], b["id"])
    assert r["w"] == 2.5 and a["x"] == 1
    # three distinct ids
    assert len({r["id"], a["id"], b["id"]}) == 3


def test_create_per_binding_row(spark):
    g = PropertyGraph({}, {})
    res = g.cypher("UNWIND [1, 2, 3] AS i CREATE (:N {v: i * 10})")
    vals = sorted(r["v"] for r in res.graph.node_tables[
        frozenset({"N"})].collect())
    assert vals == [10, 20, 30]


def test_create_rel_between_matched(spark):
    g = graph_from_create(spark, "CREATE (:P {n: 'a'}), (:P {n: 'b'})")
    res = g.cypher(
        "MATCH (x:P {n: 'a'}), (y:P {n: 'b'}) "
        "CREATE (x)-[r:KNOWS {since: 2020}]->(y) RETURN r.since AS s")
    assert rows(res) == [(2020,)]
    g2 = res.graph
    assert g2.rel_tables["KNOWS"].count() == 1
    out = g2.cypher("MATCH (x:P)-[:KNOWS]->(y:P) "
                    "RETURN x.n AS x, y.n AS y")
    assert rows(out) == [("a", "b")]


def test_create_return_created_entity(spark):
    g = PropertyGraph({}, {})
    res = g.cypher("CREATE (a:A:B {x: 1}) RETURN a")
    maps = res.to_maps()
    assert len(maps) == 1
    node = maps[0]["a"]
    assert node["~labels"] == {"A", "B"} if isinstance(
        node, dict) and "~labels" in node else True


def test_create_visible_to_later_match(spark):
    g = PropertyGraph({}, {})
    res = g.cypher("CREATE (:N {v: 1}) WITH 1 AS one "
                   "MATCH (n:N) RETURN n.v AS v")
    assert rows(res) == [(1,)]


def test_create_sequential_ids_disjoint(spark):
    g = PropertyGraph({}, {})
    g1 = g.cypher("CREATE (:A)").graph
    g2 = g1.cypher("CREATE (:A)").graph
    ids = [r["id"] for r in g2.node_tables[frozenset({"A"})].collect()]
    assert len(ids) == len(set(ids)) == 2


def test_create_bound_var_with_labels_errors(spark):
    g = graph_from_create(spark, "CREATE (:A)")
    with pytest.raises(PlanError):
        g.cypher("MATCH (a:A) CREATE (a:B)")


def test_create_undirected_rel_errors(spark):
    g = PropertyGraph({}, {})
    with pytest.raises(PlanError):
        g.cypher("CREATE (:A)-[:R]-(:B)")


def test_create_var_length_errors(spark):
    g = PropertyGraph({}, {})
    with pytest.raises(PlanError):
        g.cypher("CREATE (:A)-[:R*2]->(:B)")


# ---------------------------------------------------------------------------
# SET / REMOVE
# ---------------------------------------------------------------------------

def test_set_property_and_binding_refresh(spark):
    g = graph_from_create(spark, "CREATE (:N {v: 1}), (:N {v: 2})")
    res = g.cypher("MATCH (n:N) SET n.v = n.v * 10 "
                   "RETURN n.v AS v ORDER BY v")
    assert rows(res) == [(10,), (20,)]       # binding sees the new value
    vals = sorted(r["v"] for r in res.graph.node_tables[
        frozenset({"N"})].collect())
    assert vals == [10, 20]


def test_set_new_property_key(spark):
    g = graph_from_create(spark, "CREATE (:N {v: 1})")
    g2 = g.cypher("MATCH (n:N) SET n.fresh = 'yes'").graph
    assert g2.node_tables[frozenset({"N"})].first()["fresh"] == "yes"


def test_set_label_moves_combo(spark):
    g = graph_from_create(spark, "CREATE (:A {x: 1}), (:B {x: 2})")
    g2 = g.cypher("MATCH (n:A) SET n:Extra").graph
    assert ("A", "Extra") in combos(g2)
    assert rows(g2.cypher("MATCH (n:Extra) RETURN n.x AS x")) == [(1,)]
    # untouched table untouched
    assert g2.node_tables[frozenset({"B"})] is g.node_tables[
        frozenset({"B"})]


def test_set_map_replace_and_add(spark):
    g = graph_from_create(spark, "CREATE (:M {a: 1, b: 2})")
    g2 = g.cypher("MATCH (n:M) SET n = {a: 9, c: 3}").graph
    row = g2.node_tables[frozenset({"M"})].first()
    assert (row["a"], row["b"], row["c"]) == (9, None, 3)
    g3 = g2.cypher("MATCH (n:M) SET n += {b: 7}").graph
    row = g3.node_tables[frozenset({"M"})].first()
    assert (row["a"], row["b"], row["c"]) == (9, 7, 3)


def test_set_copies_properties_between_entities(spark):
    g = graph_from_create(
        spark, "CREATE (:Src {a: 1, b: 2}), (:Dst {c: 9})")
    g2 = g.cypher("MATCH (s:Src), (d:Dst) SET d = s").graph
    row = g2.node_tables[frozenset({"Dst"})].first()
    assert (row["a"], row["b"], row["c"]) == (1, 2, None)


def test_set_rel_property(spark):
    g = graph_from_create(spark, "CREATE (:A)-[:R {w: 1}]->(:B)")
    g2 = g.cypher("MATCH ()-[r:R]->() SET r.w = 42").graph
    assert g2.rel_tables["R"].first()["w"] == 42


def test_set_null_removes(spark):
    g = graph_from_create(spark, "CREATE (:N {v: 1})")
    g2 = g.cypher("MATCH (n:N) SET n.v = null").graph
    assert g2.node_tables[frozenset({"N"})].first()["v"] is None


def test_remove_property_and_label(spark):
    g = graph_from_create(spark, "CREATE (:A {x: 1, y: 2})")
    g2 = g.cypher("MATCH (n:A) SET n:Tmp").graph
    g3 = g2.cypher("MATCH (n:Tmp) REMOVE n.y, n:Tmp").graph
    assert rows(g3.cypher("MATCH (n:A) RETURN n.x AS x, n.y AS y")) \
        == [(1, None)]
    assert rows(g3.cypher("MATCH (n:Tmp) RETURN n.x AS x")) == []


def test_set_on_optional_null_is_noop(spark):
    g = graph_from_create(spark, "CREATE (:A {x: 1})")
    res = g.cypher("OPTIONAL MATCH (n:Missing) SET n.x = 99")
    assert graph_side_effects(g, res.graph) == {}


# ---------------------------------------------------------------------------
# DELETE
# ---------------------------------------------------------------------------

def test_delete_node(spark):
    g = graph_from_create(spark, "CREATE (:A), (:B)")
    g2 = g.cypher("MATCH (n:A) DELETE n").graph
    assert g2.node_tables[frozenset({"A"})].count() == 0
    assert g2.node_tables[frozenset({"B"})].count() == 1


def test_delete_relationship(spark):
    g = graph_from_create(spark, "CREATE (:A)-[:R]->(:B)")
    g2 = g.cypher("MATCH ()-[r:R]->() DELETE r").graph
    assert g2.rel_tables["R"].count() == 0
    assert g2.node_tables[frozenset({"A"})].count() == 1


def test_delete_connected_node_errors(spark):
    g = graph_from_create(spark, "CREATE (:A)-[:R]->(:B)")
    with pytest.raises(DeleteConnectedNodeError):
        g.cypher("MATCH (a:A) DELETE a")


def test_delete_node_and_its_rels_in_one_clause(spark):
    g = graph_from_create(spark, "CREATE (:A)-[:R]->(:B)")
    g2 = g.cypher("MATCH (a:A)-[r:R]->() DELETE a, r").graph
    assert g2.node_tables[frozenset({"A"})].count() == 0
    assert g2.rel_tables["R"].count() == 0


def test_detach_delete(spark):
    g = graph_from_create(
        spark, "CREATE (a:A)-[:R]->(:B), (a)<-[:R]-(:C)")
    g2 = g.cypher("MATCH (a:A) DETACH DELETE a").graph
    assert g2.node_tables[frozenset({"A"})].count() == 0
    assert g2.rel_tables["R"].count() == 0
    assert g2.node_tables[frozenset({"B"})].count() == 1


def test_delete_null_is_noop(spark):
    g = graph_from_create(spark, "CREATE (:A)")
    res = g.cypher("OPTIONAL MATCH (n:Missing) DELETE n")
    assert graph_side_effects(g, res.graph) == {}


# ---------------------------------------------------------------------------
# MERGE
# ---------------------------------------------------------------------------

def test_merge_creates_when_missing(spark):
    g = PropertyGraph({}, {})
    g2 = g.cypher("MERGE (n:N {v: 1})").graph
    assert g2.node_tables[frozenset({"N"})].count() == 1


def test_merge_matches_when_present(spark):
    g = graph_from_create(spark, "CREATE (:N {v: 1})")
    g2 = g.cypher("MERGE (n:N {v: 1})").graph
    assert g2.node_tables[frozenset({"N"})].count() == 1


def test_merge_dedupes_identical_rows(spark):
    g = PropertyGraph({}, {})
    g2 = g.cypher("UNWIND [1, 2, 2, 3] AS x MERGE (n:N {v: x})").graph
    vals = sorted(r["v"] for r in g2.node_tables[
        frozenset({"N"})].collect())
    assert vals == [1, 2, 3]


def test_merge_on_create_on_match(spark):
    g = graph_from_create(spark, "CREATE (:N {v: 1})")
    res = g.cypher(
        "UNWIND [1, 2] AS x MERGE (n:N {v: x}) "
        "ON CREATE SET n.created = true ON MATCH SET n.matched = true "
        "RETURN n.v AS v, n.created AS c, n.matched AS m ORDER BY v")
    assert rows(res) == [(1, None, True), (2, True, None)]


def test_merge_relationship_between_bound(spark):
    g = graph_from_create(
        spark, "CREATE (a:P {n: 'a'}), (b:P {n: 'b'}), "
               "(a2:P {n: 'c'})")
    # run twice: second merge must not duplicate
    g2 = g.cypher("MATCH (x:P {n: 'a'}), (y:P {n: 'b'}) "
                  "MERGE (x)-[:KNOWS]->(y)").graph
    g3 = g2.cypher("MATCH (x:P {n: 'a'}), (y:P {n: 'b'}) "
                   "MERGE (x)-[:KNOWS]->(y)").graph
    assert g3.rel_tables["KNOWS"].count() == 1


def test_merge_whole_pattern_semantics(spark):
    # an existing :A node does NOT satisfy MERGE (a:A)-[:R]->(b:B) —
    # the whole pattern is created when absent
    g = graph_from_create(spark, "CREATE (:A {x: 1})")
    g2 = g.cypher("MERGE (a:A {x: 1})-[:R]->(b:B)").graph
    assert g2.node_tables[frozenset({"A"})].count() == 2
    assert g2.rel_tables["R"].count() == 1


def test_merge_visible_to_return(spark):
    g = PropertyGraph({}, {})
    res = g.cypher("MERGE (n:N {v: 7}) RETURN n.v AS v")
    assert rows(res) == [(7,)]


# ---------------------------------------------------------------------------
# side-effect measurement
# ---------------------------------------------------------------------------

def test_side_effects_create(spark):
    g = PropertyGraph({}, {})
    res = g.cypher("CREATE (:A:B {x: 1})-[:R {w: 1}]->(:C)")
    assert graph_side_effects(g, res.graph) == {
        "+nodes": 2, "+relationships": 1, "+labels": 3, "+properties": 2}


def test_side_effects_property_change_counts_both(spark):
    g = graph_from_create(spark, "CREATE (:N {v: 1})")
    res = g.cypher("MATCH (n:N) SET n.v = 2")
    assert graph_side_effects(g, res.graph) == {
        "+properties": 1, "-properties": 1}


def test_side_effects_detach_delete(spark):
    g = graph_from_create(spark, "CREATE (:A {x: 1})-[:R]->(:B)")
    res = g.cypher("MATCH (a:A) DETACH DELETE a")
    assert graph_side_effects(g, res.graph) == {
        "-nodes": 1, "-relationships": 1, "-labels": 1, "-properties": 1}


def test_mutated_graph_registrable_and_requeryable(spark):
    from cypher_for_apache_flink_spark import CypherSession
    g = PropertyGraph({}, {})
    g2 = g.cypher("CREATE (:A {x: 1})").graph
    s = CypherSession.for_graph(g2)
    s.register("mutated", g2)
    out = s.cypher("FROM GRAPH mutated MATCH (n:A) RETURN n.x AS x")
    assert [tuple(r) for r in out.df.collect()] == [(1,)]


# ---------------------------------------------------------------------------
# Round-8 ADVICE fixes
# ---------------------------------------------------------------------------

def test_delete_then_rebind_name_after_with(spark):
    # deletion attaches to the binding, not the bare name: re-binding the
    # same name after a WITH boundary must be readable again
    g = graph_from_create(spark, "CREATE (:A {x: 1}), (:B {x: 7})")
    res = g.cypher(
        "MATCH (n:A) DELETE n WITH 1 AS one MATCH (n:B) RETURN n.x AS x")
    assert [tuple(r) for r in res.df.collect()] == [(7,)]
    a = res.graph.node_tables.get(frozenset({"A"}))
    assert a is None or a.count() == 0


def test_delete_carried_through_with_still_guarded(spark):
    # ...but the SAME deleted entity carried through WITH stays unreadable
    g = graph_from_create(spark, "CREATE (:A {x: 1})")
    with pytest.raises(Exception, match="deleted"):
        g.cypher("MATCH (n:A) DELETE n WITH n RETURN n.x")


def test_delete_negative_list_subscript(spark):
    g = graph_from_create(spark, "CREATE (:A {x: 1}), (:A {x: 2})")
    res = g.cypher(
        "MATCH (n:A) WITH n ORDER BY n.x WITH collect(n) AS ns "
        "DETACH DELETE ns[-1]")
    left = sorted(r["x"] for r in res.graph.node_tables[
        frozenset({"A"})].collect())
    assert left == [1]


def test_foreach_list_literal_of_entities(spark):
    # FOREACH (x IN [a] | DELETE x): list LITERAL of entities still binds
    # the loop variable as an entity
    g = graph_from_create(spark, "CREATE (:A {x: 1}), (:B)")
    res = g.cypher("MATCH (a:A) FOREACH (x IN [a] | DETACH DELETE x)")
    a = res.graph.node_tables.get(frozenset({"A"}))
    assert a is None or a.count() == 0
    assert res.graph.node_tables[frozenset({"B"})].count() == 1


def test_create_inline_where_rejected(spark):
    g = PropertyGraph({}, {})
    with pytest.raises(PlanError, match="WHERE"):
        g.cypher("CREATE (n WHERE false)")


def test_merge_inline_where_rejected(spark):
    g = graph_from_create(spark, "CREATE (:A)")
    with pytest.raises(PlanError, match="WHERE"):
        g.cypher("MERGE (n:A WHERE n.x = 1)")
