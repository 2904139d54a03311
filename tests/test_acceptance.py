"""Acceptance scenarios ported from the reference's suites
(morpheus-testing/.../impl/acceptance/: WithTests, ReturnTests, UnionTests,
UnwindTests, ExpandIntoTests, BoundedVarExpandTests, AggregationTests,
PredicateTests).  Bag (multiset) comparison like the reference's
``result.records.collect.toBag``.
"""

from collections import Counter

import pytest

from cypher_for_apache_flink_spark import PropertyGraph


@pytest.fixture(scope="module")
def g(spark):
    """Triangle a-b-c plus a chain c->d->e and a dangling node f.

    (a:Person {name:'a', age:10})-[:KNOWS {k:1}]->(b)-[:KNOWS]->(c)
    (c)-[:KNOWS]->(a)  (c)-[:REL]->(d:Other)-[:REL]->(e:Other)
    """
    nodes = {
        frozenset({"Person"}): spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (6, "f", 60)],
            "id long, name string, age long"),
        frozenset({"Other"}): spark.createDataFrame(
            [(4, "d", 40), (5, "e", 50)], "id long, name string, age long"),
    }
    rels = {
        "KNOWS": spark.createDataFrame(
            [(101, 1, 2, 1), (102, 2, 3, 2), (103, 3, 1, 3)],
            "id long, source long, target long, k long"),
        "REL": spark.createDataFrame(
            [(104, 3, 4, 9), (105, 4, 5, 9)],
            "id long, source long, target long, k long"),
    }
    return PropertyGraph(nodes, rels, name="acceptance")


def bag(result):
    return Counter(tuple(r) for r in result.collect())


def rows(*tups):
    return Counter(tups)


# --- ReturnTests ------------------------------------------------------------

def test_single_return_query(g):
    assert bag(g.cypher("RETURN 1 AS one")) == rows((1,))


def test_single_return_several_columns(g):
    assert bag(g.cypher("RETURN 1 AS x, 'foo' AS y, true AS z")) == \
        rows((1, "foo", True))


def test_tricky_alias(g):
    # RETURN n.name AS age — alias shadows the property name
    res = g.cypher("MATCH (n:Person) WHERE n.name = 'a' "
                   "RETURN n.age AS name")
    assert bag(res) == rows((10,))


def test_projection_with_multiple_references(g):
    res = g.cypher("MATCH (n:Person) WITH n.age AS a, n.age * 2 AS b "
                   "RETURN a + b AS total ORDER BY total LIMIT 1")
    assert bag(res) == rows((30,))


def test_returns_maps(g):
    res = g.cypher("RETURN {foo: 1, bar: 'x'} AS m")
    r = res.collect()[0]["m"]
    assert r["foo"] == 1 and r["bar"] == "x"


def test_returns_map_elements(g):
    assert bag(g.cypher("RETURN {foo: 5}.foo AS v")) == rows((5,))


def test_order_skip_limit_arithmetic(g):
    res = g.cypher("MATCH (n:Person) RETURN n.name AS name "
                   "ORDER BY name SKIP 1 LIMIT 2")
    assert [r["name"] for r in res.collect()] == ["b", "c"]


def test_distinct_combinations(g):
    res = g.cypher("MATCH (n) RETURN DISTINCT n.age % 20 AS m")
    assert bag(res) == rows((10,), (0,))


# --- WithTests --------------------------------------------------------------

def test_with_projects_and_predicates(g):
    res = g.cypher("MATCH (n:Person) WITH n.age AS age WHERE age > 15 "
                   "RETURN age ORDER BY age")
    assert [r["age"] for r in res.collect()] == [20, 30, 60]


def test_with_restricts_scope(g):
    # after WITH only projected items are in scope; n.name resolves via n
    res = g.cypher("MATCH (n:Person) WITH n WHERE n.age = 10 "
                   "RETURN n.name AS name")
    assert bag(res) == rows(("a",))


def test_with_aggregation_then_match_style_filter(g):
    res = g.cypher("MATCH (n) WITH n.age % 20 AS m, count(*) AS c "
                   "RETURN m, c ORDER BY m")
    assert bag(res) == rows((0, 3), (10, 3))


def test_stacked_with(g):
    res = g.cypher("MATCH (n:Person) WITH n.age AS a WITH a * 2 AS b "
                   "WHERE b >= 40 RETURN b ORDER BY b")
    assert [r["b"] for r in res.collect()] == [40, 60, 120]


# --- UnionTests -------------------------------------------------------------

def test_union_all_unwind(g):
    res = g.cypher("UNWIND [1, 2] AS x RETURN x "
                   "UNION ALL UNWIND [2, 3] AS x RETURN x")
    assert bag(res) == rows((1,), (2,), (2,), (3,))


def test_union_dedups(g):
    res = g.cypher("UNWIND [1, 2] AS x RETURN x "
                   "UNION UNWIND [2, 3] AS x RETURN x")
    assert bag(res) == rows((1,), (2,), (3,))


def test_stacked_union_all(g):
    res = g.cypher("RETURN 1 AS x UNION ALL RETURN 1 AS x "
                   "UNION ALL RETURN 2 AS x")
    assert bag(res) == rows((1,), (1,), (2,))


def test_union_match_nodes(g):
    res = g.cypher("MATCH (p:Person) RETURN p.name AS name "
                   "UNION MATCH (o:Other) RETURN o.name AS name")
    assert bag(res) == rows(("a",), ("b",), ("c",), ("d",), ("e",), ("f",))


# --- UnwindTests ------------------------------------------------------------

def test_standalone_unwind_literal(g):
    assert bag(g.cypher("UNWIND [1, 2, 3] AS x RETURN x")) == \
        rows((1,), (2,), (3,))


def test_unwind_after_match(g):
    res = g.cypher("MATCH (p:Person) WHERE p.name = 'a' "
                   "UNWIND [1, 2] AS x RETURN p.name AS name, x")
    assert bag(res) == rows(("a", 1), ("a", 2))


def test_unwind_from_expression(g):
    res = g.cypher("WITH [1, 2] AS xs UNWIND xs AS x RETURN x")
    assert bag(res) == rows((1,), (2,))


def test_unwind_aggregation(g):
    res = g.cypher("UNWIND [1, 2, 3, 4] AS x RETURN x % 2 AS p, count(*) AS c")
    assert bag(res) == rows((0, 2), (1, 2))


def test_unwind_involved(g):
    res = g.cypher("MATCH (p:Person) UNWIND [10] AS inc "
                   "RETURN p.age + inc AS a ORDER BY a LIMIT 2")
    assert [r["a"] for r in res.collect()] == [20, 30]


# --- ExpandIntoTests --------------------------------------------------------

def test_expand_into_triangle(g):
    res = g.cypher(
        "MATCH (a:Person)-[:KNOWS]->(b:Person)-[:KNOWS]->(c:Person), "
        "(c)-[:KNOWS]->(a) RETURN a.name AS a, b.name AS b, c.name AS c")
    assert bag(res) == rows(("a", "b", "c"), ("b", "c", "a"), ("c", "a", "b"))


def test_expand_into_after_var_expand(g):
    res = g.cypher(
        "MATCH (a:Person)-[:KNOWS*2..2]->(c:Person), (c)-[:KNOWS]->(a) "
        "RETURN a.name AS a, c.name AS c")
    assert bag(res) == rows(("a", "c"), ("b", "a"), ("c", "b"))


# --- BoundedVarExpandTests --------------------------------------------------

def test_var_expand_zero_length(g):
    res = g.cypher("MATCH (a:Person)-[:KNOWS*0..0]->(b) "
                   "WHERE a.name = 'a' RETURN b.name AS b")
    assert bag(res) == rows(("a",))


def test_var_expand_zero_to_one(g):
    res = g.cypher("MATCH (a:Person)-[:KNOWS*0..1]->(b) "
                   "WHERE a.name = 'a' RETURN b.name AS b")
    assert bag(res) == rows(("a",), ("b",))


def test_var_expand_lower_bound(g):
    res = g.cypher("MATCH (a:Person)-[:KNOWS*2..3]->(b) "
                   "WHERE a.name = 'a' RETURN b.name AS b")
    # length 2: a->b->c ; length 3: a->b->c->a
    assert bag(res) == rows(("c",), ("a",))


def test_var_expand_rel_list(g):
    res = g.cypher("MATCH (a:Person)-[rs:KNOWS*1..2]->(b) "
                   "WHERE a.name = 'a' RETURN size(rs) AS n, b.name AS b")
    assert bag(res) == rows((1, "b"), (2, "c"))


def test_var_expand_mixed_types_additional_hop(g):
    res = g.cypher("MATCH (c:Person)-[:REL*1..1]->(d)-[:REL]->(e) "
                   "RETURN d.name AS d, e.name AS e")
    assert bag(res) == rows(("d", "e"))


# --- AggregationTests / PredicateTests --------------------------------------

def test_aggregation_on_rel_props(g):
    res = g.cypher("MATCH ()-[r:KNOWS]->() "
                   "RETURN sum(r.k) AS s, min(r.k) AS mn, max(r.k) AS mx, "
                   "count(*) AS c")
    assert bag(res) == rows((6, 1, 3, 3))


def test_collect_distinct(g):
    res = g.cypher("MATCH ()-[r]->() RETURN collect(DISTINCT r.k) AS ks")
    (ks,) = res.collect()[0]
    assert sorted(ks) == [1, 2, 3, 9]


def test_predicate_in_where_on_rel(g):
    res = g.cypher("MATCH (a)-[r:KNOWS]->(b) WHERE r.k >= 2 "
                   "RETURN a.name AS a ORDER BY a")
    assert [r["a"] for r in res.collect()] == ["b", "c"]


def test_predicate_label_disjunction_via_union(g):
    res = g.cypher("MATCH (n) WHERE n:Person OR n:Other "
                   "RETURN count(*) AS c")
    assert bag(res) == rows((6,))


def test_exists_property_predicate(g):
    res = g.cypher("MATCH (n:Person) WHERE exists(n.age) RETURN count(*) AS c")
    assert bag(res) == rows((4,))


# --- parameters (auto-parameterized literals in the reference) --------------

def test_parameter_in_predicate(g):
    res = g.cypher("MATCH (n:Person) WHERE n.age > $min "
                   "RETURN n.name AS name ORDER BY name",
                   params={"min": 15})
    assert [r["name"] for r in res.collect()] == ["b", "c", "f"]


def test_parameter_in_projection_and_limit(g):
    res = g.cypher("MATCH (n:Person) RETURN n.age + $bump AS a "
                   "ORDER BY a LIMIT $k", params={"bump": 100, "k": 2})
    assert [r["a"] for r in res.collect()] == [110, 120]


def test_parameter_list_unwind(g):
    res = g.cypher("UNWIND $xs AS x RETURN x * 2 AS d ORDER BY d",
                   params={"xs": [3, 1, 2]})
    assert [r["d"] for r in res.collect()] == [2, 4, 6]


# --- result caching (CacheTests analogue) -----------------------------------

def test_result_cache_reuse(g):
    res = g.cypher("MATCH (n:Person) RETURN n.name AS name").cache()
    assert res.df.count() == 4
    assert len(res.collect()) == 4


# --- OptionalMatchTests ------------------------------------------------------

def test_optional_match_basic_null_row(g):
    res = g.cypher("MATCH (f:Person) WHERE f.name = 'f' "
                   "OPTIONAL MATCH (f)-[:KNOWS]->(x) "
                   "RETURN f.name AS f, x.name AS x")
    assert bag(res) == rows(("f", None))


def test_chained_optional_matches(g):
    res = g.cypher(
        "MATCH (a:Person) WHERE a.name IN ['a', 'f'] "
        "OPTIONAL MATCH (a)-[:KNOWS]->(b) "
        "OPTIONAL MATCH (b)-[:KNOWS]->(c) "
        "RETURN a.name AS a, b.name AS b, c.name AS c")
    assert bag(res) == rows(("a", "b", "c"), ("f", None, None))


def test_optional_match_with_predicate(g):
    res = g.cypher(
        "MATCH (a:Person) WHERE a.name = 'a' "
        "OPTIONAL MATCH (a)-[k:KNOWS]->(b) WHERE k.k > 5 "
        "RETURN a.name AS a, b.name AS b")
    # the only KNOWS edge from a has k=1 -> predicate fails -> null row
    assert bag(res) == rows(("a", None))


def test_aggregation_after_optional(g):
    res = g.cypher(
        "MATCH (p:Person) OPTIONAL MATCH (p)-[:KNOWS]->(q) "
        "RETURN p.name AS p, count(q) AS n")
    assert bag(res) == rows(("a", 1), ("b", 1), ("c", 1), ("f", 0))


# --- WITH * / RETURN * -------------------------------------------------------

def test_with_star_keeps_all_vars(g):
    res = g.cypher("MATCH (a:Person)-[k:KNOWS]->(b) WITH * "
                   "WHERE k.k >= 2 RETURN a.name AS a, b.name AS b")
    assert bag(res) == rows(("b", "c"), ("c", "a"))


def test_return_star(g):
    res = g.cypher("MATCH (a:Person) WHERE a.name = 'a' RETURN *")
    out = res.collect()
    assert len(out) == 1 and "a" in res.df.columns


def test_map_parameters(g):
    res = g.cypher("RETURN $m.a AS a, $m['b'] AS b",
                   params={"m": {"a": 7, "b": "x"}})
    assert bag(res) == rows((7, "x"))


def test_unwind_param_list_of_maps(g):
    res = g.cypher("UNWIND $rows AS r RETURN r.id AS i, r.v AS v",
                   params={"rows": [{"id": 1, "v": "x"}, {"id": 2, "v": "y"}]})
    assert bag(res) == rows((1, "x"), (2, "y"))


def test_graphx_pagerank_example_parity(g, spark):
    """Reference workflow parity (GraphXPageRankExample.scala:55-75):
    Cypher -> edge list -> PageRank -> ranks rejoined to names via a
    driving table.  Here the RDD/GraphX hop is a DataFrame-only loop and
    the rejoin is cypher(driving_table=...)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from cypher_for_apache_flink_spark import CypherSession
    from cypher_for_apache_flink_spark.functions.graph_algos import pagerank

    edges = g.cypher(
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "RETURN id(a) AS src, id(b) AS dst").df
    ranks = pagerank(edges, iterations=20)

    session = CypherSession.for_graph(g)
    out = session.cypher(
        "MATCH (p:Person) WHERE id(p) = node "
        "RETURN p.name AS name, rank",
        driving_table=ranks).df
    got = {r.name: r.rank for r in out.collect()}
    # the KNOWS subgraph is the 3-cycle a->b->c->a: uniform 1/3
    assert set(got) == {"a", "b", "c"}
    for v in got.values():
        assert v == _pytest.approx(1 / 3, abs=1e-9)
