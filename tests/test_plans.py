"""Physical-plan quality gates — the properties that make queries survive a
100 TB scale-up (SURVEY §6, VERDICT r1 'plan audit for scale').

These assert on the *optimized/executed* plan of real parquet-backed queries:
 - small dimension scans broadcast (no shuffle join against Region/Nation);
 - predicates reach the parquet reader (PushedFilters);
 - column pruning reaches the reader (ReadSchema is minimal);
 - equi-pattern queries never degrade to CartesianProduct.
"""
import re

import pytest

from cypher_for_apache_flink_spark.sources.tpch import tpch_graph

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def g(spark):
    return tpch_graph(spark, SF_DIR)


def _executed(res) -> str:
    return res.df._jdf.queryExecution().executedPlan().toString()


def _full(res) -> str:
    return res.df._jdf.queryExecution().toString()


def test_dimension_joins_broadcast(g):
    res = g.cypher(
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) "
        "RETURN n.n_name AS nation, count(*) AS cnt")
    plan = _executed(res)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_filter_pushed_to_parquet(g):
    res = g.cypher(
        "MATCH (c:Customer) WHERE c.c_acctbal > 5000.0 "
        "RETURN c.c_name AS name")
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", _full(res))
    assert any("GreaterThan(c_acctbal,5000.0)" in p for p in pushed), pushed


def test_column_pruning_reaches_reader(g):
    res = g.cypher("MATCH (c:Customer) RETURN c.c_name AS name")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", _full(res))
    cust = [s for s in schemas if "c_name" in s]
    assert cust, schemas
    # at most the id and the projected property are read — no c_comment,
    # c_acctbal, c_address riding along (the id itself is elided when the
    # query never observes it)
    for s in cust:
        cols = {c.split(":")[0] for c in s.split(",")}
        assert cols <= {"c_custkey", "c_name"}, cols


def test_two_hop_expand_is_all_equi_joins(g):
    res = g.cypher(
        "MATCH (c:Customer)-[:PLACED]->(o:Order)-[:CONTAINS]->(p:Part) "
        "RETURN count(*) AS n")
    plan = _executed(res)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_value_join_not_cartesian(g):
    # disconnected patterns joined by a WHERE equality must become a join
    # (Catalyst PushPredicateThroughJoin), not a filtered cross product
    res = g.cypher(
        "MATCH (n:Nation), (s:Supplier) WHERE s.s_nationkey = n.n_nationkey "
        "RETURN n.n_name AS nation, count(*) AS suppliers")
    plan = _executed(res)
    assert "CartesianProduct" not in plan


def test_percentile_disc_plan_has_no_collect_list(g):
    """percentileDisc compiles to a two-pass rank plan (row_number window +
    rank join), never to array_sort(collect_list(...)) whose per-group array
    OOMs an executor on a billion-row group (VERDICT r3 #3; beats the
    reference's group-buffering PercentileUdafs.scala:41)."""
    res = g.cypher(
        "MATCH (o:Order) RETURN o.o_orderstatus AS st, "
        "percentileDisc(o.o_totalprice, 0.5) AS p50, count(*) AS n")
    plan = _full(res)
    assert "collect_list" not in plan
    assert "row_number" in plan
    # values are exact: spot-check against a local sort
    rows = {r["st"]: (r["p50"], r["n"]) for r in res.collect()}
    import duckdb
    want = duckdb.sql(
        f"SELECT o_orderstatus st, percentile_disc(0.5) WITHIN GROUP "
        f"(ORDER BY o_totalprice) p, count(*) n "
        f"FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1").fetchall()
    for st, p, n in want:
        got_p, got_n = rows[st]
        assert got_n == n and abs(got_p - p) < 1e-9, (st, got_p, p)


def test_global_percentile_disc_two_phase(g):
    """Ungrouped percentileDisc must NOT funnel every row through a
    partitionBy(lit(1)) window (VERDICT r4 #2): the rank is two-phase —
    range-repartition by value, per-partition row_number in parallel,
    broadcast per-partition offsets."""
    res = g.cypher(
        "MATCH (o:Order) RETURN percentileDisc(o.o_totalprice, 0.5) AS p50")
    plan = _full(res)
    assert "rangepartitioning" in plan.lower(), plan
    assert "__pd_pid" in plan          # windows keyed on range-partition id
    import duckdb
    want = duckdb.sql(
        f"SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) "
        f"FROM read_parquet('{SF_DIR}/orders.parquet')").fetchone()[0]
    got = res.collect()[0]["p50"]
    assert abs(got - want) < 1e-9, (got, want)


def test_contamination_benchmark_side_broadcasts(spark):
    """The benchmark shingle set joins the training corpus as a broadcast
    (map-side semi-join shape): a 100 TB corpus is never shuffled to meet a
    small benchmark table."""
    from pyspark.sql import functions as F

    from cypher_for_apache_flink_spark.functions.sampling import (
        contamination_check,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = contamination_check(docs.where(F.col("doc_id") >= 50),
                              docs.where(F.col("doc_id") < 50))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sampling_filters_are_shuffle_free(spark):
    """Hash-fraction sampling is a pure per-row filter: no Exchange in the
    plan, and the scan's partitioning passes straight through."""
    from cypher_for_apache_flink_spark.functions.sampling import (
        sample_stratified,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = sample_stratified(docs, {"src0": 0.5}, default_rate=0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_single_partition_window(spark):
    """Legacy single-level packing (target_partition_tokens=None) is ONE
    window over the partition column — exactly one Exchange, no global
    sort.  The default two-level plan adds only the tiny per-part totals
    aggregation (broadcast back), still no range/global sort."""
    from cypher_for_apache_flink_spark.functions.sampling import pack_sequences
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = pack_sequences(docs, budget=512, target_partition_tokens=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort
    default = pack_sequences(docs, budget=512)
    dplan = default._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in dplan
    assert "BroadcastExchange" in dplan  # totals join stays broadcast


def test_pattern_comprehension_plan_is_grouped_join(g):
    """A pattern comprehension plans as match -> collect_list per anchor ->
    ONE left join back: no per-row correlated subplans, no cartesian."""
    res = g.cypher(
        "MATCH (n:Nation) RETURN n.n_name AS nation, "
        "size([(n)<-[:FROM_NATION]-(c:Customer) | c.c_name]) AS n_cust")
    plan = _executed(res)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "collect_list" in _full(res)
    rows = {r["nation"]: r["n_cust"] for r in res.collect()}
    import duckdb
    want = dict(duckdb.sql(
        f"SELECT n_name, count(c_name) FROM "
        f"read_parquet('{SF_DIR}/nation.parquet') n LEFT JOIN "
        f"read_parquet('{SF_DIR}/customer.parquet') c "
        f"ON c.c_nationkey = n.n_nationkey GROUP BY 1").fetchall())
    assert rows == want


def test_q5_cycle_plan_broadcasts_and_pushes_region_filter(g):
    """The TPC-H Q5-shaped cyclic pattern (supplier from the customer's
    own nation) must keep every dimension join broadcast, never fall to
    a cartesian product, and push the region-name filter into the
    parquet scan."""
    res = g.cypher(
        "MATCH (r:Region)<-[:IN_REGION]-(n:Nation)"
        "<-[:FROM_NATION]-(c:Customer)-[:PLACED]->(o:Order)"
        "-[l:CONTAINS]->(p:Part)-[:SUPPLIED_BY]->(s:Supplier) "
        "MATCH (s)-[:FROM_NATION]->(n) "
        "WHERE r.r_name = 'ASIA' "
        "RETURN n.n_name AS nation, "
        "round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
        "ORDER BY revenue DESC, nation")
    plan = _full(res)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert re.search(r"PushedFilters:.*EqualTo\(r_name,ASIA\)", plan)
