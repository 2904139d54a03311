"""Typed-row ingestion and the Neo4j bulk-import CSV sink.

Reference analogues: case-class element tables (morpheus-spark-cypher/.../api/
io/GraphElement.scala:33-91 — ``node``/``relationship`` annotated classes) and
``Neo4jBulkCSVDataSink`` (.../api/io/neo4j/Neo4jBulkCSVDataSink.scala) which
writes the header convention of ``neo4j-admin import``.
"""

from __future__ import annotations

import dataclasses
import os

from pyspark.sql import SparkSession

from ..graph import PropertyGraph


def graph_from_rows(spark: SparkSession, nodes: dict, rels: dict | None = None,
                    name: str = "graph") -> PropertyGraph:
    """Build a graph from plain Python rows.

    ``nodes``: {label or (labels...): [dataclass | dict | tuple(id, ...)]}
    ``rels``:  {type: [dataclass | dict | tuple(id, source, target, ...)]}

    Dataclasses map field names to columns (``id``/``source``/``target``
    required — the GraphElement contract); dicts likewise.
    """

    def to_df(items):
        first = items[0]
        if dataclasses.is_dataclass(first):
            cols = [f.name for f in dataclasses.fields(first)]
            data = [tuple(getattr(x, c) for c in cols) for x in items]
            return spark.createDataFrame(data, cols)
        if isinstance(first, dict):
            cols = list(first)
            data = [tuple(x[c] for c in cols) for x in items]
            return spark.createDataFrame(data, cols)
        return spark.createDataFrame(items)

    node_tables = {}
    for labels, items in (nodes or {}).items():
        combo = frozenset([labels] if isinstance(labels, str) else labels)
        node_tables[combo] = to_df(list(items))
    rel_tables = {t: to_df(list(items)) for t, items in (rels or {}).items()}
    return PropertyGraph(node_tables, rel_tables, name=name)


def write_neo4j_bulk_csv(graph: PropertyGraph, path: str) -> None:
    """Write the graph as ``neo4j-admin import``-ready CSVs: per label combo
    ``nodes_<labels>`` with an ``id:ID`` + ``:LABEL`` header, per type
    ``rels_<TYPE>`` with ``:START_ID``/``:END_ID``/``:TYPE``."""
    from pyspark.sql import functions as F

    for combo, df in graph.node_tables.items():
        labels = ";".join(sorted(combo))
        props = [c for c in df.columns if c != "id"]
        out = df.select(
            F.col("id").alias("id:ID"),
            *[F.col(c) for c in props],
            F.lit(labels).alias(":LABEL"))
        out.write.option("header", "true").mode("overwrite").csv(
            os.path.join(path, f"nodes_{'_'.join(sorted(combo))}"))
    for rtype, df in graph.rel_tables.items():
        props = [c for c in df.columns if c not in ("id", "source", "target")]
        out = df.select(
            F.col("source").alias(":START_ID"),
            F.col("target").alias(":END_ID"),
            *[F.col(c) for c in props],
            F.lit(rtype).alias(":TYPE"))
        out.write.option("header", "true").mode("overwrite").csv(
            os.path.join(path, f"rels_{rtype}"))
