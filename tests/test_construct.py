"""CONSTRUCT / multiple-graph tests (MultipleGraphTests + CatalogDDLTests
analogues): CLONE/NEW, RETURN GRAPH, FROM GRAPH, CATALOG CREATE/DELETE."""

import pytest

from cypher_for_apache_flink_spark import CypherSession, PropertyGraph


@pytest.fixture()
def session(spark):
    nodes = {
        frozenset({"Person"}): spark.createDataFrame(
            [(1, "Alice", 42), (2, "Bob", 23), (3, "Carol", 55)],
            "id long, name string, age long"),
    }
    rels = {
        "KNOWS": spark.createDataFrame(
            [(100, 1, 2), (101, 2, 3)], "id long, source long, target long"),
    }
    g = PropertyGraph(nodes, rels, name="social")
    s = CypherSession.for_graph(g)
    s.register("social", g)
    return s


def test_construct_clone_new_rel(session):
    res = session.cypher(
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "CONSTRUCT NEW (a)-[:FRIEND]->(b) RETURN GRAPH")
    g = res.graph
    assert g is not None
    assert g.schema.relationship_types == {"FRIEND"}
    # cloned Person nodes: the 3 participants, deduped
    people = g.node_tables[frozenset({"Person"})]
    assert sorted(r["id"] for r in people.select("id").collect()) == [1, 2, 3]
    # new graph is queryable
    out = g.cypher("MATCH (x:Person)-[:FRIEND]->(y:Person) "
                   "RETURN x.name AS x, y.name AS y ORDER BY x")
    assert [tuple(r) for r in out.collect()] == [("Alice", "Bob"),
                                                 ("Bob", "Carol")]


def test_construct_new_nodes_with_props(session):
    res = session.cypher(
        "MATCH (p:Person) "
        "CONSTRUCT NEW (:Copy {name: p.name, age2: p.age * 2}) RETURN GRAPH")
    g = res.graph
    copies = g.node_tables[frozenset({"Copy"})]
    got = sorted((r["name"], r["age2"]) for r in copies.collect())
    assert got == [("Alice", 84), ("Bob", 46), ("Carol", 110)]
    # fresh negative ids, one per input row
    ids = [r["id"] for r in copies.select("id").collect()]
    assert len(set(ids)) == 3 and all(i < 0 for i in ids)


def test_construct_new_node_linked_to_clone(session):
    res = session.cypher(
        "MATCH (p:Person) WHERE p.age > 30 "
        "CONSTRUCT NEW (p)-[:HAS_TAG]->(:Tag {label: 'senior'}) RETURN GRAPH")
    g = res.graph
    out = g.cypher("MATCH (p:Person)-[:HAS_TAG]->(t:Tag) "
                   "RETURN p.name AS name, t.label AS tag ORDER BY name")
    assert [tuple(r) for r in out.collect()] == [("Alice", "senior"),
                                                 ("Carol", "senior")]


def test_return_graph_without_construct(session):
    res = session.cypher("FROM GRAPH social RETURN GRAPH")
    assert res.graph is session.graph("social")


def test_catalog_create_and_delete(session):
    session.cypher(
        "CATALOG CREATE GRAPH friends { "
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "CONSTRUCT NEW (a)-[:FRIEND]->(b) RETURN GRAPH }")
    assert "friends" in session.catalog
    out = session.cypher(
        "FROM GRAPH friends MATCH (x)-[:FRIEND]->() RETURN count(*) AS n")
    assert out.collect()[0]["n"] == 2
    session.cypher("CATALOG DELETE GRAPH friends")
    assert "friends" not in session.catalog


def test_construct_with_reserved_property_names(session):
    res = session.cypher(
        "MATCH (p:Person) WHERE p.name = 'Alice' "
        "CONSTRUCT NEW (:X {id: p.age, n: p.name})-[:L {source: 3}]->(:Y) "
        "RETURN GRAPH")
    out = res.graph.cypher(
        "MATCH (x:X)-[l:L]->(:Y) RETURN x.id AS i, x.n AS n, l.source AS s")
    assert [tuple(r) for r in out.collect()] == [(42, "Alice", 3)]


def test_from_graph_mid_query_switch(session, spark):
    """SwitchContext (RelationalPlanner context switch): FROM GRAPH changes
    the scan source mid-query while carrying the projected scope."""
    from cypher_for_apache_flink_spark.sources.create import graph_from_create
    other = graph_from_create(spark, 'CREATE (:Person {name: "Zoe"})')
    session.register("other", other)
    res = session.cypher(
        "MATCH (p:Person) WHERE p.name = 'Alice' WITH p.name AS n "
        "FROM GRAPH other MATCH (q:Person) RETURN n, q.name AS m")
    assert [tuple(r) for r in res.collect()] == [("Alice", "Zoe")]


# --- CatalogDDLTests: parameterized graph views ------------------------------

def test_catalog_create_view_and_invoke(session, spark):
    from cypher_for_apache_flink_spark.sources.create import graph_from_create
    session.register("g2", graph_from_create(
        spark, 'CREATE (:Person {name: "Neo"})-[:KNOWS]->(:Person {name: "Trin"})'))
    session.cypher(
        "CATALOG CREATE VIEW pairs($g) { FROM GRAPH $g "
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "CONSTRUCT NEW (:Pair {s: a.name, t: b.name}) RETURN GRAPH }")
    one = session.cypher("FROM GRAPH pairs(social) MATCH (p:Pair) "
                         "RETURN p.s AS s, p.t AS t ORDER BY s")
    assert [tuple(r) for r in one.collect()] == [("Alice", "Bob"),
                                                 ("Bob", "Carol")]
    two = session.cypher("FROM GRAPH pairs(g2) MATCH (p:Pair) "
                         "RETURN p.s AS s, p.t AS t")
    assert [tuple(r) for r in two.collect()] == [("Neo", "Trin")]


def test_view_arity_and_delete(session):
    session.cypher("CATALOG CREATE VIEW idview($g) "
                   "{ FROM GRAPH $g MATCH (n) CONSTRUCT CLONE n RETURN GRAPH }")
    with pytest.raises(ValueError, match="graph argument"):
        session.cypher("FROM GRAPH idview(social, social) MATCH (n) "
                       "RETURN count(*) AS c")
    session.cypher("CATALOG DELETE VIEW idview")
    with pytest.raises(KeyError, match="no view"):
        session.cypher("FROM GRAPH idview(social) MATCH (n) RETURN count(*) AS c")


def test_graph_shadows_view_of_same_name(session):
    session.cypher("CATALOG CREATE VIEW social() "
                   "{ FROM GRAPH social MATCH (n) WHERE 1 = 0 "
                   "CONSTRUCT CLONE n RETURN GRAPH }")
    # bare FROM GRAPH social still resolves the GRAPH, not the empty view
    res = session.cypher("FROM GRAPH social MATCH (n:Person) RETURN count(*) AS c")
    assert [tuple(r) for r in res.collect()] == [(3,)]
    session.cypher("CATALOG DELETE VIEW social")


def test_qualified_graph_names(session, spark):
    """QualifiedGraphNameAcceptance: dotted names resolve through FROM GRAPH
    and CATALOG statements."""
    from cypher_for_apache_flink_spark.sources.create import graph_from_create
    session.register("ds.schema.g", graph_from_create(
        spark, 'CREATE (:Person {name: "Q"})'))
    res = session.cypher(
        "FROM GRAPH ds.schema.g MATCH (p:Person) RETURN p.name AS n")
    assert [tuple(r) for r in res.collect()] == [("Q",)]


def test_construct_new_ids_stable_across_actions(spark):
    """NEW ids must agree between the node tables and the rel tables even
    though they are materialised by SEPARATE Spark actions over a shuffled,
    multi-partition match table (VERDICT r3 #2: monotonically_increasing_id
    re-evaluated per action can re-deal rows after retries/AQE re-plans).
    The planner pins ids by localCheckpoint-ing the match table once."""
    import random

    rng = random.Random(7)
    rows = [(i, f"P_{rng.randrange(10**6)}") for i in range(500)]
    nodes = {frozenset({"Person"}): spark.createDataFrame(
        rows, "id long, name string").repartition(16)}
    g = PropertyGraph(nodes, {}, name="many")
    res = CypherSession.for_graph(g).cypher(
        "MATCH (p:Person) "
        "CONSTRUCT NEW (:S {n: p.name})-[:R {n: p.name}]->(:T {n: p.name}) "
        "RETURN GRAPH")
    cg = res.graph
    # three *separate* actions, interleaved with an extra repeat of the first
    s_tbl = {r["id"]: r["n"] for r in cg.node_tables[frozenset({"S"})].collect()}
    t_tbl = {r["id"]: r["n"] for r in cg.node_tables[frozenset({"T"})].collect()}
    rels = [(r["source"], r["target"], r["n"])
            for r in cg.rel_tables["R"].collect()]
    s_again = {r["id"]: r["n"]
               for r in cg.node_tables[frozenset({"S"})].collect()}
    assert s_tbl == s_again, "node ids changed between repeated actions"
    assert len(s_tbl) == 500 and len(t_tbl) == 500 and len(rels) == 500
    for src, dst, n in rels:
        assert s_tbl.get(src) == n, "rel source dangles or joins wrong row"
        assert t_tbl.get(dst) == n, "rel target dangles or joins wrong row"
    # end-to-end through cypher on the constructed graph: every R edge joins
    # the S and T born from the SAME match row.
    out = res.graph.cypher(
        "MATCH (s:S)-[:R]->(t:T) WHERE s.n = t.n RETURN count(*) AS c")
    assert out.collect()[0]["c"] == 500


def test_construct_set_label_and_property(session):
    """CONSTRUCT SET v:Label / SET v.key = expr (the reference's AddInto
    path, ConstructGraphPlanner.scala:133-156)."""
    g = session.catalog["social"]
    res = g.cypher(
        'MATCH (p:Person {name: "Alice"}) '
        "CONSTRUCT CLONE p SET p:Vip SET p.score = p.age * 2 RETURN GRAPH")
    rows = res.graph.cypher(
        "MATCH (v:Vip) RETURN v.name AS name, v.score AS score").collect()
    assert [(r["name"], r["score"]) for r in rows] == [("Alice", 84)]


def test_construct_set_overrides_cloned_property(session):
    g = session.catalog["social"]
    res = g.cypher(
        'MATCH (p:Person {name: "Alice"}) '
        "CONSTRUCT CLONE p SET p.age = 99 RETURN GRAPH")
    rows = res.graph.cypher("MATCH (p:Person) RETURN p.age AS age").collect()
    assert [r["age"] for r in rows] == [99]


def test_construct_set_on_new_rel_and_comma_items(session):
    g = session.catalog["social"]
    res = g.cypher(
        'MATCH (p:Person {name: "Alice"}) '
        "CONSTRUCT NEW (p)-[e:TAGGED {a: 1}]->(:Tag) "
        "SET e.b = 2, e.c = 3 RETURN GRAPH")
    rows = res.graph.cypher(
        "MATCH ()-[e:TAGGED]->() RETURN e.a AS a, e.b AS b, e.c AS c"
    ).collect()
    assert [(r["a"], r["b"], r["c"]) for r in rows] == [(1, 2, 3)]


def test_construct_set_unbound_target_rejected(session):
    import pytest

    from cypher_for_apache_flink_spark.plans.planner import PlanError
    g = session.catalog["social"]
    with pytest.raises(PlanError, match="not a CONSTRUCT element"):
        g.cypher("MATCH (p:Person) CONSTRUCT NEW (:Q) SET p.x = 1 "
                 "RETURN GRAPH").graph.nodes()


# ---------------------------------------------------------------------------
# COPY OF base entities (reference IRBuilder.scala:637-677 baseFields)
# ---------------------------------------------------------------------------

def test_construct_node_copy_of_carries_labels_and_props(session):
    g = session.catalog["social"]
    rg = g.cypher('MATCH (p:Person {name: "Alice"}) '
                  "CONSTRUCT NEW (c COPY OF p :Vip {tier: 1}) "
                  "RETURN GRAPH").graph
    rows = rg.cypher("MATCH (n:Person:Vip) RETURN n.name AS name, "
                     "n.age AS age, n.tier AS tier").collect()
    assert [(r.name, r.age, r.tier) for r in rows] == [("Alice", 42, 1)]
    # it is a COPY: a fresh entity, not Alice's id
    ids = [r.i for r in rg.cypher("MATCH (n) RETURN id(n) AS i").collect()]
    assert len(ids) == 1 and ids[0] < 0


def test_construct_node_copy_of_prop_override(session):
    g = session.catalog["social"]
    rg = g.cypher('MATCH (p:Person {name: "Bob"}) '
                  "CONSTRUCT NEW (c COPY OF p {age: 99}) "
                  "RETURN GRAPH").graph
    rows = rg.cypher("MATCH (n:Person) RETURN n.age AS age").collect()
    assert [r.age for r in rows] == [99]


def test_construct_rel_copy_of_carries_type_and_props(session):
    spark = session.spark
    nodes = {frozenset({"P"}): spark.createDataFrame(
        [(1,), (2,), (3,)], "id long")}
    rels = {
        "KNOWS": spark.createDataFrame(
            [(100, 1, 2, 7)], "id long, source long, target long, w long"),
        "LIKES": spark.createDataFrame(
            [(101, 2, 3, 8)], "id long, source long, target long, w long"),
    }
    from cypher_for_apache_flink_spark import PropertyGraph
    g = PropertyGraph(nodes, rels, name="g")
    rg = session.cypher(
        "MATCH (a)-[r]->(b) CONSTRUCT CLONE a, b "
        "NEW (b)-[COPY OF r]->(a) RETURN GRAPH", graph=g).graph
    rows = rg.cypher("MATCH (x)-[e]->(y) RETURN type(e) AS t, e.w AS w, "
                     "id(x) AS x, id(y) AS y").collect()
    got = sorted((r.t, r.w, r.x, r.y) for r in rows)
    # reversed endpoints, per-row inherited type, carried property
    assert got == [("KNOWS", 7, 2, 1), ("LIKES", 8, 3, 2)]


def test_construct_copy_of_unbound_base_rejected(session):
    from cypher_for_apache_flink_spark.plans.planner import PlanError
    g = session.catalog["social"]
    with pytest.raises(PlanError, match="unbound"):
        g.cypher("MATCH (p:Person) CONSTRUCT NEW (c COPY OF zz) "
                 "RETURN GRAPH").graph.nodes()


# ---------------------------------------------------------------------------
# CONSTRUCT ON base graphs (reference IRBuilder.scala:288-298)
# ---------------------------------------------------------------------------

def test_construct_on_carries_base_graph(session):
    g = session.catalog["social"]
    rg = session.cypher(
        "FROM GRAPH social MATCH (p:Person) "
        "CONSTRUCT ON social NEW (p)-[:TAGGED]->(:Tag {who: p.name}) "
        "RETURN GRAPH").graph
    # all base nodes + rels still present
    assert rg.cypher("MATCH (p:Person) RETURN count(*) AS c") \
        .collect()[0].c == 3
    assert rg.cypher("MATCH ()-[:KNOWS]->() RETURN count(*) AS c") \
        .collect()[0].c == 2
    # plus one tag per person
    tags = rg.cypher("MATCH (p:Person)-[:TAGGED]->(t:Tag) "
                     "RETURN p.name AS p, t.who AS w").collect()
    assert {(r.p, r.w) for r in tags} == {("Alice", "Alice"),
                                          ("Bob", "Bob"),
                                          ("Carol", "Carol")}


def test_construct_on_without_new_is_identity_union(session):
    rg = session.cypher("CONSTRUCT ON social RETURN GRAPH").graph
    assert rg.cypher("MATCH (n) RETURN count(*) AS c").collect()[0].c == 3
    assert rg.cypher("MATCH ()-[r]->() RETURN count(*) AS c") \
        .collect()[0].c == 2


def test_construct_on_clone_of_base_element_collapses(session):
    # cloning a matched element of the ON graph must not duplicate it
    rg = session.cypher(
        "FROM GRAPH social MATCH (p:Person {name: 'Alice'}) "
        "CONSTRUCT ON social CLONE p SET p.flag = true "
        "RETURN GRAPH").graph
    rows = rg.cypher("MATCH (p:Person) RETURN p.name AS n, count(*) AS c "
                     "ORDER BY n").collect()
    assert [(r.n, r.c) for r in rows] == [("Alice", 1), ("Bob", 1),
                                          ("Carol", 1)]


def test_construct_on_clone_set_replaces_base_row(session):
    # the SET-extended clone must win over the ON-carried original, even
    # when the SET moves it to an extended label combo
    rg = session.cypher(
        "FROM GRAPH social MATCH (p:Person {name: 'Alice'}) "
        "CONSTRUCT ON social CLONE p SET p:Vip SET p.level = 9 "
        "RETURN GRAPH").graph
    vips = rg.cypher("MATCH (p:Person:Vip) RETURN p.name AS n, "
                     "p.level AS lvl").collect()
    assert [(r.n, r.lvl) for r in vips] == [("Alice", 9)]
    # Alice appears exactly once in the whole graph
    rows = rg.cypher("MATCH (p:Person) WHERE p.name = 'Alice' "
                     "RETURN count(*) AS c").collect()
    assert rows[0].c == 1


def test_construct_on_two_graphs_with_overlapping_ids(spark):
    """ADVICE r4 (medium): two graph_from_create graphs are both numbered
    from 0 — CONSTRUCT ON g1, g2 must retag ids per graph, or unrelated
    nodes collide in the union and edges rewire to the wrong entity
    (okapi retags per graph; MultipleGraphExample does CONSTRUCT ON
    socialNetwork, purchases.products)."""
    from cypher_for_apache_flink_spark.sources.create import graph_from_create

    g1 = graph_from_create(spark, "CREATE (a:A {n: 1})-[:RA]->(b:A {n: 2})")
    g2 = graph_from_create(spark, "CREATE (c:B {m: 3})-[:RB]->(d:B {m: 4})")
    s = CypherSession.for_graph(g1)
    s.register("g1", g1)
    s.register("g2", g2)
    rg = s.cypher("CONSTRUCT ON g1, g2 RETURN GRAPH").graph
    assert rg.cypher("MATCH (n) RETURN count(*) AS c").collect()[0].c == 4
    ra = rg.cypher("MATCH (x:A)-[:RA]->(y:A) "
                   "RETURN x.n AS x, y.n AS y").collect()
    assert [(r.x, r.y) for r in ra] == [(1, 2)]
    rb = rg.cypher("MATCH (x:B)-[:RB]->(y:B) "
                   "RETURN x.m AS x, y.m AS y").collect()
    assert [(r.x, r.y) for r in rb] == [(3, 4)]
    # no cross-graph edge appeared through an id collision
    assert rg.cypher("MATCH (x:A)-->(y:B) RETURN count(*) AS c") \
        .collect()[0].c == 0
    assert rg.cypher("MATCH (x:B)-->(y:A) RETURN count(*) AS c") \
        .collect()[0].c == 0


def test_construct_on_matched_plus_foreign_graph_clone_replaces(spark):
    """The matched graph keeps tag 0 so a CLONE ... SET row still replaces
    its original; the foreign ON graph is retagged into a disjoint id
    space."""
    from cypher_for_apache_flink_spark.sources.create import graph_from_create

    g1 = graph_from_create(
        spark, "CREATE (:P {name: 'a'}), (:P {name: 'b'})")
    g2 = graph_from_create(spark, "CREATE (:Q {q: 1}), (:Q {q: 2})")
    s = CypherSession.for_graph(g1)
    s.register("g1", g1)
    s.register("g2", g2)
    rg = s.cypher(
        "FROM GRAPH g1 MATCH (p:P) WHERE p.name = 'a' "
        "CONSTRUCT ON g1, g2 CLONE p SET p.flag = true "
        "RETURN GRAPH").graph
    assert rg.cypher("MATCH (n) RETURN count(*) AS c").collect()[0].c == 4
    rows = rg.cypher("MATCH (p:P) RETURN p.name AS n, p.flag AS f "
                     "ORDER BY n").collect()
    assert [(r.n, r.f) for r in rows] == [("a", True), ("b", None)]
    assert rg.cypher("MATCH (q:Q) RETURN count(*) AS c").collect()[0].c == 2
