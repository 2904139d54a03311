"""Edge-list source: two-column text files -> property graph.

Reference: ``EdgeListDataSource`` (morpheus-spark-cypher/.../api/io/edgelist/
EdgeListDataSource.scala:70) — whitespace-delimited ``src dst`` lines, ``#``
comments; nodes are the distinct endpoint ids with a single label, edges a
single relationship type.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..graph import PropertyGraph


def read_edge_list(spark: SparkSession, path: str, delimiter: str = " ",
                   node_label: str = "V", rel_type: str = "REL",
                   comment: str = "#") -> PropertyGraph:
    edges = (spark.read
             .option("delimiter", delimiter)
             .option("comment", comment)
             .schema("source long, target long")
             .csv(path))
    # Edge ids: partition-deterministic monotonically_increasing_id — the
    # same scheme the reference uses for id assignment
    # (MorpheusFunctions.partitioned_id_assignment).
    rels = {rel_type: edges.select(
        F.monotonically_increasing_id().alias("id"),
        "source", "target")}
    nodes = {frozenset({node_label}): (
        edges.select(F.col("source").alias("id"))
        .union(edges.select(F.col("target").alias("id")))
        .distinct())}
    return PropertyGraph(nodes, rels, name="edgelist")
