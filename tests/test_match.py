"""Port of the reference MatchTests acceptance suite.

(morpheus-testing/.../impl/acceptance/MatchTests.scala: empty-graph matches,
multiple MATCH clauses, cyphermorphism scoping, disconnected components,
undirected patterns, relationship-type disjunctions.)  Bag (multiset)
comparison like the reference's ``Bag`` matcher — several scenarios expect
duplicate rows.
"""
from collections import Counter

import pytest

from cypher_for_apache_flink_spark import PropertyGraph


def bag(result):
    return Counter(tuple(r) for r in result.collect())


def rows(*tups):
    return Counter(tups)


@pytest.fixture(scope="module")
def alice_bob(spark):
    """Alice<->Bob mutual KNOWS (MatchTests.scala:142-151)."""
    return PropertyGraph(
        {frozenset({"Person"}): spark.createDataFrame(
            [(1, "Alice"), (2, "Bob")], "id long, name string")},
        {"KNOWS": spark.createDataFrame(
            [(101, 1, 2), (102, 2, 1)], "id long, source long, target long")})


@pytest.fixture(scope="module")
def narcissists(spark):
    """Two self-loving nodes (MatchTests.scala:181-189)."""
    return PropertyGraph(
        {frozenset({"Narcissist"}): spark.createDataFrame(
            [(1, "Alice"), (2, "Bob")], "id long, name string")},
        {"LOVES": spark.createDataFrame(
            [(101, 1, 1), (102, 2, 2)], "id long, source long, target long")})


@pytest.fixture(scope="module")
def sprawl(spark):
    """Philip/Stefan/City sprawl graph (MatchTests.scala:433-441)."""
    return PropertyGraph(
        {frozenset({"Person"}): spark.createDataFrame(
            [(1, "Philip"), (2, "Stefan")], "id long, name string"),
         frozenset({"City"}): spark.createDataFrame(
            [(3, "The Pan-European Sprawl")], "id long, name string")},
        {"KNOWS": spark.createDataFrame(
            [(101, 1, 2)], "id long, source long, target long"),
         "LIVES_IN": spark.createDataFrame(
            [(102, 1, 3), (103, 2, 3)], "id long, source long, target long")})


# --- match single node -------------------------------------------------------

def test_unknown_label_is_empty(alice_bob):
    res = alice_bob.cypher("MATCH (n:Animal) RETURN n.name AS name")
    assert bag(res) == rows()


def test_matches_a_label(alice_bob):
    res = alice_bob.cypher("MATCH (n:Person) RETURN n.name AS name")
    assert bag(res) == rows(("Alice",), ("Bob",))


# --- multiple match clauses --------------------------------------------------

def test_multiple_match_clauses(alice_bob):
    res = alice_bob.cypher(
        "MATCH (p1:Person) MATCH (p1:Person)-[e1:KNOWS]->(p2:Person) "
        "RETURN p1.name AS a, p2.name AS b")
    assert bag(res) == rows(("Alice", "Bob"), ("Bob", "Alice"))


def test_cyphermorphism_is_per_clause(alice_bob):
    # rel-uniqueness holds within one MATCH, not across clauses: e3 may
    # equal e1/e2 (MatchTests.scala:142-176)
    res = alice_bob.cypher(
        "MATCH (p1:Person)-[e1:KNOWS]->(p2:Person)-[e2:KNOWS]->(p3:Person) "
        "MATCH (p3)-[e3:KNOWS]->(p4:Person) "
        "RETURN p1.name AS a, p2.name AS b, p3.name AS c, p4.name AS d")
    assert bag(res) == rows(("Alice", "Bob", "Alice", "Bob"),
                            ("Bob", "Alice", "Bob", "Alice"))


# --- disconnected match clauses ----------------------------------------------

def test_disconnected_components(narcissists):
    res = narcissists.cypher(
        "MATCH (a:Narcissist), (b:Narcissist) RETURN a.name AS one, b.name AS two")
    assert bag(res) == rows(("Alice", "Alice"), ("Alice", "Bob"),
                            ("Bob", "Alice"), ("Bob", "Bob"))


def test_joined_components_value_join(narcissists):
    res = narcissists.cypher(
        "MATCH (a:Narcissist), (b:Narcissist) WHERE a.name = b.name "
        "RETURN a.name AS one, b.name AS two")
    assert bag(res) == rows(("Alice", "Alice"), ("Bob", "Bob"))


def test_cross_product_between_match_clauses(spark):
    g = PropertyGraph(
        {frozenset({"A"}): spark.createDataFrame([(1, 0)], "id long, val long"),
         frozenset({"B"}): spark.createDataFrame([(2, 1)], "id long, val long"),
         frozenset({"C"}): spark.createDataFrame([(3, 2)], "id long, val long")},
        {"REL": spark.createDataFrame([(101, 2, 3)],
                                      "id long, source long, target long")})
    res = g.cypher("MATCH (a:A) MATCH (b:B)-->(c:C) "
                   "RETURN a.val AS av, c.val AS cv")
    assert bag(res) == rows((0, 2))


def test_self_loop_expand_into(narcissists):
    res = narcissists.cypher(
        "MATCH (a:Narcissist)-[:LOVES]->(a) RETURN a.name AS n")
    assert bag(res) == rows(("Alice",), ("Bob",))


# --- undirected patterns -----------------------------------------------------

def test_undirected_relationship(spark):
    g = PropertyGraph(
        {frozenset({"A"}): spark.createDataFrame([(1, "isA")], "id long, prop string"),
         frozenset({"B"}): spark.createDataFrame(
            [(2, "fromA"), (3, "toA")], "id long, prop string")},
        {"T": spark.createDataFrame([(101, 1, 2), (102, 3, 1)],
                                    "id long, source long, target long")})
    res = g.cypher("MATCH (a:A)--(other) RETURN a.prop AS a, other.prop AS o")
    assert bag(res) == rows(("isA", "fromA"), ("isA", "toA"))


def test_undirected_two_hops(spark):
    # a->b, b->c, c->a, c->d (MatchTests.scala:273-295)
    g = PropertyGraph(
        {frozenset({lbl}): spark.createDataFrame([(i, p)], "id long, prop string")
         for i, (lbl, p) in enumerate([("A", "a"), ("B", "b"), ("C", "c"), ("D", "d")], 1)},
        {"T": spark.createDataFrame(
            [(101, 1, 2), (102, 2, 3), (103, 3, 1), (104, 3, 4)],
            "id long, source long, target long")})
    res = g.cypher("MATCH (a:A)--()--(other) RETURN a.prop AS a, other.prop AS o")
    assert bag(res) == rows(("a", "c"), ("a", "b"), ("a", "d"))


def test_undirected_with_prebound_nodes(spark):
    # parallel opposite edges: both match the undirected pattern
    g = PropertyGraph(
        {frozenset({"A"}): spark.createDataFrame([(1, "a")], "id long, prop string"),
         frozenset({"B"}): spark.createDataFrame([(2, "b")], "id long, prop string")},
        {"T": spark.createDataFrame([(101, 2, 1), (102, 1, 2)],
                                    "id long, source long, target long")})
    res = g.cypher("MATCH (a:A) MATCH (b:B) MATCH (a)--(b) "
                   "RETURN a.prop AS a, b.prop AS b")
    assert bag(res) == rows(("a", "b"), ("a", "b"))


def test_mixed_directed_undirected(spark):
    # two self-loops on a, b->a, a->c (MatchTests.scala:320-342)
    g = PropertyGraph(
        {frozenset({"A"}): spark.createDataFrame([(1, "a")], "id long, prop string"),
         frozenset({"B"}): spark.createDataFrame([(2, "b")], "id long, prop string"),
         frozenset({"C"}): spark.createDataFrame([(3, "c")], "id long, prop string")},
        {"T": spark.createDataFrame(
            [(101, 1, 1), (102, 1, 1), (103, 2, 1), (104, 1, 3)],
            "id long, source long, target long")})
    res = g.cypher("MATCH (a:A)--(a)<--(other) RETURN a.prop AS a, other.prop AS o")
    assert bag(res) == rows(("a", "a"), ("a", "a"), ("a", "b"), ("a", "b"))


def test_undirected_cyclic(spark):
    g = PropertyGraph(
        {frozenset({"A"}): spark.createDataFrame([(1, "a")], "id long, prop string")},
        {"T": spark.createDataFrame([(101, 1, 1)],
                                    "id long, source long, target long")})
    res = g.cypher("MATCH (a:A)--(a) RETURN a.prop AS p")
    assert bag(res) == rows(("a",))


def test_undirected_var_length(spark):
    # a->b, c->b: 2 undirected hops a..c (MatchTests.scala:360-377)
    g = PropertyGraph(
        {frozenset({"A"}): spark.createDataFrame([(1, "a")], "id long, prop string"),
         frozenset({"B"}): spark.createDataFrame([(2, "b")], "id long, prop string"),
         frozenset({"C"}): spark.createDataFrame([(3, "c")], "id long, prop string")},
        {"T": spark.createDataFrame([(101, 1, 2), (102, 3, 2)],
                                    "id long, source long, target long")})
    res = g.cypher("MATCH (a:A)-[*2..2]-(other) RETURN a.prop AS a, other.prop AS o")
    assert bag(res) == rows(("a", "c"))


# --- complex / disjunctions --------------------------------------------------

def test_expand_into_with_var_length(sprawl):
    res = sprawl.cypher(
        "MATCH (a:Person)-[:LIVES_IN]->(c:City)<-[:LIVES_IN]-(b:Person), "
        "(a)-[:KNOWS*1..2]->(b) RETURN a.name AS a, b.name AS b, c.name AS c")
    assert bag(res) == rows(("Philip", "Stefan", "The Pan-European Sprawl"))


def test_disjunction_of_two_types(sprawl):
    res = sprawl.cypher("MATCH ()-[r:LIVES_IN|KNOWS]->() RETURN type(r) AS t")
    assert bag(res) == rows(("LIVES_IN",), ("LIVES_IN",), ("KNOWS",))


# --- unbounded var-length (fixpoint) -----------------------------------------

@pytest.fixture(scope="module")
def triangle_chain(spark):
    """Triangle a->b->c->a (:K) plus chain c->d->e (:R)."""
    return PropertyGraph(
        {frozenset({"P"}): spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, n string"),
         frozenset({"O"}): spark.createDataFrame(
            [(4, "d"), (5, "e")], "id long, n string")},
        {"K": spark.createDataFrame(
            [(101, 1, 2), (102, 2, 3), (103, 3, 1)],
            "id long, source long, target long"),
         "R": spark.createDataFrame(
            [(104, 3, 4), (105, 4, 5)],
            "id long, source long, target long")})


def test_unbounded_var_length_on_cycle_terminates(triangle_chain):
    # edge-uniqueness bounds every path at 3 hops: b (1), c (2), a (3)
    res = triangle_chain.cypher(
        'MATCH (a:P) WHERE a.n = "a" MATCH (a)-[:K*]->(t) RETURN t.n AS t')
    assert bag(res) == rows(("a",), ("b",), ("c",))


def test_unbounded_var_length_with_lower_bound(triangle_chain):
    res = triangle_chain.cypher(
        'MATCH (a:P) WHERE a.n = "a" MATCH (a)-[:K*2..]->(t) RETURN t.n AS t')
    assert bag(res) == rows(("a",), ("c",))


def test_unbounded_var_length_empty_result(triangle_chain):
    # lower bound beyond the longest path -> empty, not an error
    res = triangle_chain.cypher(
        'MATCH (a:P) WHERE a.n = "a" MATCH (a)-[:K*4..]->(t) RETURN t.n AS t')
    assert bag(res) == rows()


def test_unbounded_var_length_chain(triangle_chain):
    res = triangle_chain.cypher(
        'MATCH (c:P) WHERE c.n = "c" MATCH (c)-[:R*]->(t) RETURN t.n AS t')
    assert bag(res) == rows(("d",), ("e",))


def test_disjunction_four_types_var_length(spark):
    g = PropertyGraph(
        {frozenset({"N"}): spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id long, val string")},
        {"A": spark.createDataFrame([(101, 1, 1)], "id long, source long, target long"),
         "B": spark.createDataFrame([(102, 1, 2)], "id long, source long, target long"),
         "C": spark.createDataFrame([(103, 2, 3)], "id long, source long, target long"),
         "D": spark.createDataFrame([(104, 3, 4)], "id long, source long, target long")})
    res = g.cypher("MATCH (f)-[:A|B|C|D*1..3]->(t) "
                   "RETURN f.val AS f, t.val AS t")
    assert bag(res) == rows(("a", "a"), ("a", "b"), ("a", "b"), ("a", "c"),
                            ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
                            ("c", "d"))


# --- error paths: explicit raises, never silent truncation -------------------

def test_var_length_bound_over_cap_raises(triangle_chain):
    from cypher_for_apache_flink_spark.plans.planner import PlanError
    with pytest.raises(PlanError, match="cap is 12"):
        triangle_chain.cypher("MATCH (a:P)-[:K*1..20]->(b) RETURN b.n AS n")


def test_construct_var_length_raises(spark, triangle_chain):
    from cypher_for_apache_flink_spark import CypherSession
    from cypher_for_apache_flink_spark.plans.planner import PlanError
    s = CypherSession.for_graph(triangle_chain)
    with pytest.raises(PlanError, match="var-length"):
        s.cypher("MATCH (a:P)-[:K]->(b) "
                 "CONSTRUCT NEW (a)-[:X*1..2]->(b) RETURN GRAPH")


def test_unbound_variable_has_clear_error(triangle_chain):
    from cypher_for_apache_flink_spark.errors import PlanError
    with pytest.raises(PlanError, match="not in scope"):
        triangle_chain.cypher("RETURN nope").collect()


# --- named paths (beyond-reference: Morpheus lacks them) ---------------------

def test_named_path_accessors(triangle_chain):
    res = triangle_chain.cypher(
        'MATCH p = (a:P {n: "a"})-[:K]->(b)-[:K]->(c) '
        "RETURN length(p) AS l, size(nodes(p)) AS nn, "
        "size(relationships(p)) AS nr")
    assert bag(res) == rows((2, 3, 2))


def test_named_path_node_ids_in_order(triangle_chain):
    res = triangle_chain.cypher(
        'MATCH p = (a:P {n: "a"})-[:K]->(b) RETURN nodes(p) AS ns')
    assert [list(r["ns"]) for r in res.collect()] == [[1, 2]]


def test_named_path_over_var_length(triangle_chain):
    # chain c -(R)-> d -(R)-> e: paths of length 1 and 2 with hop nodes
    res = triangle_chain.cypher(
        'MATCH p = (c:P {n: "c"})-[:R*1..2]->(x) '
        "RETURN length(p) AS l, size(nodes(p)) AS nn, "
        "size(relationships(p)) AS nr")
    assert bag(res) == rows((1, 2, 1), (2, 3, 2))


def test_named_path_mixed_fixed_and_var_length(triangle_chain):
    res = triangle_chain.cypher(
        'MATCH p = (a:P {n: "b"})-[:K]->(c)-[:R*1..2]->(x) '
        "RETURN length(p) AS l ORDER BY l")
    assert bag(res) == rows((2,), (3,))


def test_named_path_var_length_planned_from_destination(triangle_chain):
    # The labeled right endpoint wins start selection, so the expand is
    # planned from the destination side (orientation flip).  nodes(p) /
    # relationships(p) must still come out in PATTERN order.
    res = triangle_chain.cypher(
        'MATCH p = (s)-[:R*1..2]->(x:O {n: "e"}) '
        "RETURN nodes(p) AS ns, relationships(p) AS rs")
    got = sorted((list(r["ns"]), list(r["rs"])) for r in res.collect())
    assert got == [([3, 4, 5], [104, 105]), ([4, 5], [105])]


def test_var_length_rel_list_order_planned_from_destination(triangle_chain):
    # Even without a named path, the bound rel-var list must be in pattern
    # order when the expand is planned from the destination side.
    res = triangle_chain.cypher(
        'MATCH (s)-[r:R*2..2]->(x:O {n: "e"}) RETURN r')
    assert [list(row["r"]) for row in res.collect()] == [[104, 105]]


def test_named_path_unbounded(triangle_chain):
    res = triangle_chain.cypher(
        'MATCH p = (c:P {n: "c"})-[:R*]->(x) RETURN length(p) AS l')
    assert bag(res) == rows((1,), (2,))


def test_named_path_var_length_incoming_planned_from_destination(triangle_chain):
    # '<-' direction with the flip: the labeled LEFT endpoint is the
    # pattern's destination-side anchor; hop/edge arrays must still come
    # out in pattern order (ADVICE r3: 'in' direction x flip untested).
    res = triangle_chain.cypher(
        'MATCH p = (x:O {n: "e"})<-[:R*1..2]-(s) '
        "RETURN nodes(p) AS ns, relationships(p) AS rs")
    got = sorted((list(r["ns"]), list(r["rs"])) for r in res.collect())
    # pattern order starts at x (=5): [5,4] over rel 105, [5,4,3] over 105,104
    assert got == [([5, 4], [105]), ([5, 4, 3], [105, 104])]


def test_named_path_var_length_undirected_flip(triangle_chain):
    # 'both' + flip: all undirected 2-hop paths ending at the labeled side
    res = triangle_chain.cypher(
        'MATCH p = (s:P {n: "c"})-[:R*2..2]-(x) '
        "RETURN nodes(p) AS ns, relationships(p) AS rs")
    got = sorted((list(r["ns"]), list(r["rs"])) for r in res.collect())
    assert got == [([3, 4, 5], [104, 105])]
    # same pattern anchored from the right endpoint instead
    res2 = triangle_chain.cypher(
        'MATCH p = (s)-[:R*2..2]-(x:O {n: "e"}) '
        "RETURN nodes(p) AS ns, relationships(p) AS rs")
    got2 = sorted((list(r["ns"]), list(r["rs"])) for r in res2.collect())
    assert got2 == [([3, 4, 5], [104, 105])]


def test_named_path_var_length_zero_hop_flipped(triangle_chain):
    # *0..1 planned from the destination side: the zero-length stage must
    # also respect pattern order (single-node path, empty rel list)
    res = triangle_chain.cypher(
        'MATCH p = (s)-[:R*0..1]->(x:O {n: "e"}) '
        "RETURN nodes(p) AS ns, relationships(p) AS rs")
    got = sorted((list(r["ns"]), list(r["rs"])) for r in res.collect())
    assert got == [([4, 5], [105]), ([5], [])]


@pytest.fixture(scope="module")
def chain_xy(spark):
    from cypher_for_apache_flink_spark.sources.create import graph_from_create
    return graph_from_create(
        spark,
        "CREATE (a:A {name: 'A'})-[:X {p: 1}]->(b:B {name: 'B'})"
        "-[:Y {p: 2}]->(c:C {name: 'C'})")


def test_bound_rel_rematch_joins_by_id(chain_xy):
    # a relationship variable bound by an earlier MATCH re-matches by
    # identity, not by cross product (round-7 fix: fresh endpoints used to
    # leave the component unconstrained)
    res = chain_xy.cypher(
        "MATCH (a)-[r]->(b) MATCH (a2)-[r]->(b2) "
        "RETURN a2.name AS n, b2.name AS m")
    assert bag(res) == {("A", "B"): 1, ("B", "C"): 1}


def test_bound_rel_rematch_parallel_edges(spark):
    from cypher_for_apache_flink_spark.sources.create import graph_from_create
    g = graph_from_create(
        spark, "CREATE (a:A)-[:T {p: 1}]->(b:B), (a)-[:T {p: 2}]->(b)")
    # endpoint joins alone would multiply parallel edges 2x2; the rel-id
    # join keeps each edge matched to itself
    res = g.cypher("MATCH (a)-[r:T]->(b) MATCH (a)-[r:T]->(b) "
                   "RETURN r.p AS p")
    assert bag(res) == {(1,): 1, (2,): 1}


def test_var_length_both_endpoints_bound(chain_xy):
    # both endpoints pre-bound: the expand must filter on the bound
    # destination (round-7 fix: the dst rescan silently rebound it)
    res = chain_xy.cypher(
        "MATCH (a:A), (c:C) MATCH p = (a)-[*1..3]->(c) "
        "RETURN length(p) AS l")
    assert bag(res) == {(2,): 1}
    res2 = chain_xy.cypher(
        "MATCH (a:A), (c:C) MATCH (a)-[rr]->(c) RETURN rr.p AS p")
    assert bag(res2) == {}


def test_negative_limit_parameter_is_not_an_error(chain_xy):
    # TCK OrderByAcceptance: a negative USER parameter for LIMIT yields
    # no rows (literal negatives are still compile errors)
    res = chain_xy.cypher(
        "MATCH (n) RETURN n.name AS x ORDER BY x LIMIT $lim",
        params={"lim": -1})
    assert bag(res) == {}
