"""Materialized triplet pattern tables (PatternScanTests /
replaceScansWithRecognizedPatterns analogue): same answers, one join fewer."""

import re

import pytest

from cypher_for_apache_flink_spark.sources.tpch import tpch_graph

Q = ("MATCH (o:Order)-[l:CONTAINS]->(p:Part) "
     "WHERE p.p_size > 25 "
     "RETURN p.p_brand AS brand, count(*) AS n, "
     "round(sum(l.l_quantity), 2) AS qty")


def join_count(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    # joins inside an InMemoryRelation belong to the one-time cache build,
    # not to this query's runtime
    plan = plan.split("InMemoryRelation")[0]
    return len(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)",
                          plan))


@pytest.fixture(scope="module")
def graphs(spark):
    plain = tpch_graph(spark, "/root/testdata/sf0.001")
    patterned = tpch_graph(spark, "/root/testdata/sf0.001") \
        .with_pattern_table("CONTAINS", "Part")   # cached = materialized
    return plain, patterned


def test_same_results(graphs):
    plain, patterned = graphs
    want = sorted(tuple(r) for r in plain.cypher(Q).collect())
    got = sorted(tuple(r) for r in patterned.cypher(Q).collect())
    assert got == want and len(got) > 0


def test_one_join_fewer(graphs):
    # the materialized triplet replaces the rel ⋈ dst join: the plan reads
    # the cached triplet (InMemoryTableScan) and performs ONE runtime join
    plain, patterned = graphs
    pat_plan = patterned.cypher(Q).df._jdf.queryExecution() \
        .executedPlan().toString()
    assert "InMemoryTableScan" in pat_plan
    assert join_count(patterned.cypher(Q).df) == \
        join_count(plain.cypher(Q).df) - 1


def test_pattern_table_respects_extra_labels(graphs):
    # destination labels outside the registered combo fall back to the
    # generic expand (no wrong pruning)
    _, patterned = graphs
    res = patterned.cypher(
        "MATCH (o:Order)-[:CONTAINS]->(x:Supplier) RETURN count(*) AS n")
    assert res.collect()[0]["n"] == 0


def test_unlabeled_destination_skips_rewrite(spark):
    """Regression (VERDICT r3 #1): MATCH (a)-[:T]->(b) with an UNLABELED b
    must return ALL T edges even when a pattern table is registered for a
    combo that only partially covers T's targets.  The vacuous guard
    (empty-set <= combo) used to reroute the expand through the triplet and
    silently drop edges into other labels."""
    from cypher_for_apache_flink_spark import PropertyGraph

    nodes = {
        frozenset({"A"}): spark.createDataFrame([(1,)], "id long"),
        frozenset({"X"}): spark.createDataFrame([(10,)], "id long"),
        frozenset({"Y"}): spark.createDataFrame([(20,)], "id long"),
    }
    rels = {"T": spark.createDataFrame(
        [(100, 1, 10), (101, 1, 20)], "id long, source long, target long")}
    g = PropertyGraph(nodes, rels, name="partial") \
        .with_pattern_table("T", "X")
    # unlabeled destination: rewrite must NOT fire — both edges survive
    res = g.cypher("MATCH (a:A)-[:T]->(b) RETURN count(*) AS n")
    assert res.collect()[0]["n"] == 2
    # labeled destination covered by the combo: rewrite may fire, 1 edge
    res = g.cypher("MATCH (a:A)-[:T]->(b:X) RETURN count(*) AS n")
    assert res.collect()[0]["n"] == 1
