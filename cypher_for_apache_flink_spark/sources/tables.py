"""Catalog-table graph source/sink (Hive-metastore pattern).

Reference: HiveFormat (StorageFormat.scala:71) + FSGraphSource.scala:151-156
(``saveAsTable`` / metastore).  Tables follow the naming convention
``<prefix>_nodes_<label[_label]>`` / ``<prefix>_rels_<TYPE>`` in the session
catalog — Spark's in-memory catalog locally, a real Hive metastore on a
cluster, no code change either way.  The graph schema rides in a one-row
``<prefix>_schema`` table (json string), mirroring the fs sidecar.

``buckets=N`` stores the graph CO-LOCATED for traversal: node tables
bucketed+sorted on ``id``, relationship tables on ``source``, all with the
same bucket count.  An out-expand then joins two tables that are already
hash-partitioned on the join key, so Spark's bucketed sort-merge join runs
with NO Exchange on either side — at 100 TB that deletes the dominant
first-hop shuffle of every traversal (only intermediate hops still
exchange).  The reference has no equivalent (its Spark backend never
bucketed; FSGraphSource.scala writes plain directories) — this is the
Spark-native layout a graph warehouse should use.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..graph import NODE_ID, REL_SOURCE, GraphSchema, PropertyGraph

_SEP = "_"


def save_graph_tables(graph: PropertyGraph, prefix: str,
                      mode: str = "errorifexists",
                      fmt: str = "parquet",
                      buckets: int | None = None) -> None:
    def write(df, name, key):
        w = df.write.format(fmt).mode(mode)
        if buckets:
            w = w.bucketBy(buckets, key).sortBy(key)
        w.saveAsTable(name)

    for combo, df in graph.node_tables.items():
        write(df, f"{prefix}_nodes_{_SEP.join(sorted(combo))}", NODE_ID)
    for rtype, df in graph.rel_tables.items():
        write(df, f"{prefix}_rels_{rtype}", REL_SOURCE)
    spark = next(iter(graph.node_tables.values())).sparkSession \
        if graph.node_tables else next(iter(graph.rel_tables.values())).sparkSession
    spark.createDataFrame([(graph.schema.to_json(), buckets)],
                          "schema_json string, buckets int") \
        .write.mode(mode).saveAsTable(f"{prefix}_schema")


def read_graph_tables(spark: SparkSession, prefix: str,
                      name: str | None = None) -> PropertyGraph:
    raw = spark.table(f"{prefix}_schema").head()["schema_json"]
    schema = GraphSchema.from_json(raw)
    nodes = {combo: spark.table(f"{prefix}_nodes_{_SEP.join(sorted(combo))}")
             for combo in schema.node_props}
    rels = {t: spark.table(f"{prefix}_rels_{t}") for t in schema.rel_props}
    return PropertyGraph(nodes, rels, name=name or prefix)
