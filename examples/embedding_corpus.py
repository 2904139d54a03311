"""End-to-end graph-embedding training-corpus pipeline (round 9,
beyond-reference — the reference has no sampling/clustering surface):

1. project a graph from Cypher,
2. sample deterministic walks — unbiased (DeepWalk) and second-order
   biased (node2vec, round 10: p discourages backtracking, q keeps the
   walk local) — merged into one corpus,
3. window the walks into skip-gram (center, context) pairs,
4. cluster the node embedding space with integer-lattice k-means and
   report how training-pair mass distributes over clusters.

Every stage is a DataFrame transform — walks reproduce on any engine or
retry (md5 draws), pairs are one self-join, clustering shuffles k rows
per iteration.  The embeddings here come from the synthetic test table;
in production they'd be the output of the trainer this corpus feeds.
"""
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.clustering import kmeans_assign
from cypher_for_apache_flink_spark.functions.clustering import kmeans
from cypher_for_apache_flink_spark.functions.graph_algos import (
    node2vec_walks, random_walks, skipgram_pairs)
from cypher_for_apache_flink_spark.sources.tpch import tpch_graph

SF_DIR = "/root/testdata/sf0.001"


def main(spark: SparkSession):
    g = tpch_graph(spark, SF_DIR)
    edges = g.cypher(
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "RETURN id(c) AS src, id(o) AS dst").df
    und = edges.unionAll(edges.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
    starts = (und.select(F.col("src").alias("node"))
              .dropDuplicates(["node"])
              .orderBy(F.md5(F.col("node").cast("string"))).limit(32))
    uniform = random_walks(und, starts, length=8)
    # biased pass over the same starts: p=4 avoids immediate backtracks,
    # q=1/4 pushes outward (DFS-flavored context).  Shift the walk ids so
    # the two corpora union without colliding.
    biased = node2vec_walks(und, starts, length=8, p=4, q="0.25")
    shift = 1 << 40
    walks = uniform.unionByName(
        biased.select((F.col("walk") + shift).alias("walk"),
                      "step", "node"))
    pairs = skipgram_pairs(walks, window=2)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    _, centroids = kmeans(emb, k=4, iterations=3)
    # pretend the walked node ids index the embedding table (synthetic
    # data: both are dense id spaces) — bucket each pair's center node
    scored = kmeans_assign(
        pairs.select((F.abs(F.hash("center"))
                      % emb.count()).alias("vec_id")).join(
            emb, "vec_id"),
        centroids, id_col="vec_id")
    return (scored.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("cluster"))


if __name__ == "__main__":
    from examples._run import run
    run(main)
