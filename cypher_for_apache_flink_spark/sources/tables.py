"""Catalog-table graph source/sink (Hive-metastore pattern).

Reference: HiveFormat (StorageFormat.scala:71) + FSGraphSource.scala:151-156
(``saveAsTable`` / metastore).  Tables follow the naming convention
``<prefix>_nodes_<label[_label]>`` / ``<prefix>_rels_<TYPE>`` in the session
catalog — Spark's in-memory catalog locally, a real Hive metastore on a
cluster, no code change either way.  The graph schema rides in a one-row
``<prefix>_schema`` table (json string), mirroring the fs sidecar.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..graph import GraphSchema, PropertyGraph

_SEP = "_"


def save_graph_tables(graph: PropertyGraph, prefix: str,
                      mode: str = "errorifexists",
                      fmt: str = "parquet") -> None:
    for combo, df in graph.node_tables.items():
        df.write.format(fmt).mode(mode).saveAsTable(
            f"{prefix}_nodes_{_SEP.join(sorted(combo))}")
    for rtype, df in graph.rel_tables.items():
        df.write.format(fmt).mode(mode).saveAsTable(f"{prefix}_rels_{rtype}")
    spark = next(iter(graph.node_tables.values())).sparkSession \
        if graph.node_tables else next(iter(graph.rel_tables.values())).sparkSession
    spark.createDataFrame([(graph.schema.to_json(),)], "schema_json string") \
        .write.mode(mode).saveAsTable(f"{prefix}_schema")


def read_graph_tables(spark: SparkSession, prefix: str,
                      name: str | None = None) -> PropertyGraph:
    raw = spark.table(f"{prefix}_schema").head()["schema_json"]
    schema = GraphSchema.from_json(raw)
    nodes = {combo: spark.table(f"{prefix}_nodes_{_SEP.join(sorted(combo))}")
             for combo in schema.node_props}
    rels = {t: spark.table(f"{prefix}_rels_{t}") for t in schema.rel_props}
    return PropertyGraph(nodes, rels, name=name or prefix)
