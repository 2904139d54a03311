"""Catalog-table (Hive-pattern) graph source/sink round-trip."""

import shutil

from cypher_for_apache_flink_spark import PropertyGraph
from cypher_for_apache_flink_spark.sources.tables import (
    read_graph_tables,
    save_graph_tables,
)


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
