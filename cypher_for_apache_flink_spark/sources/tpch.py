"""TPC-H → property-graph mapping over the driver's parquet tables.

FIXTURES.md §B: node tables are 1:1 views of the TPC-H tables, relationship
tables derive from foreign keys, lineitem becomes a CONTAINS relationship
carrying its measures.  This is the reference's "SQL views onto a graph
schema" pattern (graph-ddl/.../GraphDdl.scala:42 — NodeToViewMapping :306,
EdgeToViewMapping :332) done directly in DataFrames.

Ids are tagged in the high bits of the 64-bit long (SURVEY §1.6: keep ids
LongType, reserve high bits) so every element id is globally unique without
cross-table coordination — safe at any scale factor, unlike additive offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import PropertyGraph

TAG_SHIFT = 56

NODE_TAGS = {"Region": 1, "Nation": 2, "Customer": 3, "Supplier": 4,
             "Part": 5, "Order": 6, "User": 7, "Event": 8, "Document": 9}
REL_TAGS = {"IN_REGION": 16, "FROM_NATION_C": 17, "FROM_NATION_S": 18,
            "PLACED": 19, "CONTAINS": 20, "SUPPLIED_BY": 21, "PERFORMED": 22}


def tag(label: str, col):
    t = NODE_TAGS.get(label) or REL_TAGS[label]
    return (F.lit(t << TAG_SHIFT) + col.cast("long")).cast("long")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Session-scoped graph memo (the reference's CachedDataSource pattern —
# morpheus-spark-cypher/.../api/io/util/CachedDataSource.scala): building the
# graph costs ~0.65 s of driver-side parquet footer reads for 7 tables, which
# would otherwise be paid on EVERY query in benchmark/driver loops that
# re-call the builder.  Keyed by Spark application id so a new session never
# sees another session's DataFrames.
_GRAPH_MEMO: dict[tuple[str, str, str], PropertyGraph] = {}


def _memo(spark: SparkSession, sf_dir: str, kind: str, build):
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    if key not in _GRAPH_MEMO:
        _GRAPH_MEMO[key] = build()
    g = _GRAPH_MEMO[key]
    # Hand out a shallow copy sharing the (immutable-in-practice) DataFrames:
    # callers may mutate their graph (with_pattern_table, cache) without
    # aliasing every other caller's instance.
    copy = PropertyGraph(g.node_tables, g.rel_tables, name=g.name,
                         stats=g.stats)
    copy.pattern_tables = dict(g.pattern_tables)
    return copy


def tpch_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    """Property graph over region/nation/customer/supplier/part/orders/lineitem."""
    return _memo(spark, sf_dir, "tpch", lambda: _tpch_graph(spark, sf_dir))


def _tpch_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    region = _read(spark, sf_dir, "region")
    nation = _read(spark, sf_dir, "nation")
    customer = _read(spark, sf_dir, "customer")
    supplier = _read(spark, sf_dir, "supplier")
    part = _read(spark, sf_dir, "part")
    orders = _read(spark, sf_dir, "orders")
    lineitem = _read(spark, sf_dir, "lineitem")

    nodes = {
        frozenset({"Region"}): region.select(
            tag("Region", F.col("r_regionkey")).alias("id"), "r_name"),
        frozenset({"Nation"}): nation.select(
            tag("Nation", F.col("n_nationkey")).alias("id"), "n_name"),
        frozenset({"Customer"}): customer.select(
            tag("Customer", F.col("c_custkey")).alias("id"),
            "c_name", "c_acctbal", "c_mktsegment"),
        frozenset({"Supplier"}): supplier.select(
            tag("Supplier", F.col("s_suppkey")).alias("id"),
            "s_name", "s_acctbal"),
        frozenset({"Part"}): part.select(
            tag("Part", F.col("p_partkey")).alias("id"),
            "p_name", "p_brand", "p_type",
            F.col("p_size").cast("long").alias("p_size"), "p_retailprice"),
        frozenset({"Order"}): orders.select(
            tag("Order", F.col("o_orderkey")).alias("id"),
            "o_orderstatus", "o_totalprice",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority"),
    }

    from_nation = customer.select(
        tag("FROM_NATION_C", F.col("c_custkey")).alias("id"),
        tag("Customer", F.col("c_custkey")).alias("source"),
        tag("Nation", F.col("c_nationkey")).alias("target"),
    ).unionByName(supplier.select(
        tag("FROM_NATION_S", F.col("s_suppkey")).alias("id"),
        tag("Supplier", F.col("s_suppkey")).alias("source"),
        tag("Nation", F.col("s_nationkey")).alias("target"),
    ))

    # lineitem key: orderkey*8 + linenumber (linenumber ≤ 7) keeps the rel id
    # derivation deterministic and shuffle-free.
    li_key = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long")

    rels = {
        "IN_REGION": nation.select(
            tag("IN_REGION", F.col("n_nationkey")).alias("id"),
            tag("Nation", F.col("n_nationkey")).alias("source"),
            tag("Region", F.col("n_regionkey")).alias("target")),
        "FROM_NATION": from_nation,
        "PLACED": orders.select(
            tag("PLACED", F.col("o_orderkey")).alias("id"),
            tag("Customer", F.col("o_custkey")).alias("source"),
            tag("Order", F.col("o_orderkey")).alias("target")),
        "CONTAINS": lineitem.select(
            tag("CONTAINS", li_key).alias("id"),
            tag("Order", F.col("l_orderkey")).alias("source"),
            tag("Part", F.col("l_partkey")).alias("target"),
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate"),
        "SUPPLIED_BY": lineitem.select(
            tag("SUPPLIED_BY", li_key).alias("id"),
            tag("Part", F.col("l_partkey")).alias("source"),
            tag("Supplier", F.col("l_suppkey")).alias("target")),
    }
    # Scale-independent dimension sizes (TPC-H spec): always broadcastable.
    stats = {frozenset({"Region"}): 5, frozenset({"Nation"}): 25,
             "IN_REGION": 25}
    return PropertyGraph(nodes, rels, name="tpch", stats=stats)


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    rejects; read nanos as long and truncate to microseconds (integer DIV —
    double division would lose sub-ms precision at epoch-nano magnitudes)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = _read(spark, sf_dir, "events")
    from pyspark.sql import types as T
    if isinstance(events.schema["ts"].dataType, T.LongType):
        events = events.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return events


def events_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    """Events stream table as a (User)-[:PERFORMED]->(Event) graph
    (FIXTURES.md §C.2)."""
    return _memo(spark, sf_dir, "events", lambda: _events_graph(spark, sf_dir))


def _events_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    events = read_events(spark, sf_dir)
    nodes = {
        frozenset({"User"}): events.select(
            F.col("user_id")).distinct().select(
            tag("User", F.col("user_id")).alias("id"),
            F.col("user_id").cast("long").alias("uid")),
        frozenset({"Event"}): events.select(
            tag("Event", F.col("event_id")).alias("id"),
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type", "value", "props"),
    }
    rels = {
        "PERFORMED": events.select(
            tag("PERFORMED", F.col("event_id")).alias("id"),
            tag("User", F.col("user_id")).alias("source"),
            tag("Event", F.col("event_id")).alias("target")),
    }
    return PropertyGraph(nodes, rels, name="events")


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read(spark, sf_dir, "documents")


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read(spark, sf_dir, "embeddings")
