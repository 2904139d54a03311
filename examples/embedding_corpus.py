"""End-to-end graph-embedding training-corpus pipeline (round 9,
beyond-reference — the reference has no sampling/clustering surface):

1. project a graph from Cypher,
2. sample deterministic walks — unbiased (DeepWalk) and second-order
   biased (node2vec, round 10: p discourages backtracking, q keeps the
   walk local) — merged into one corpus,
3. window the walks into skip-gram (center, context) pairs,
4. embed the projected graph directly with FastRP (round 11 — no
   trainer needed: normalized very-sparse random projection smoothed
   over the neighborhood), cluster the embedding space with
   integer-lattice k-means, and report how training-pair mass
   distributes over embedding clusters.

Every stage is a DataFrame transform — walks reproduce on any engine or
retry (md5 draws), pairs are one self-join, FastRP is two keyed
exchanges per iteration, clustering shuffles k rows per iteration.
The skip-gram corpus and the FastRP embeddings are complementary
outputs over the SAME graph: the corpus feeds an external trainer, the
FastRP vectors are usable immediately (and here organize the corpus).
"""
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.clustering import kmeans
from cypher_for_apache_flink_spark.functions.graph_algos import (
    fastrp_embeddings, node2vec_walks, random_walks, skipgram_pairs)
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

    # FastRP embeds the projected graph itself — unit-norm vectors, so
    # the k-means lattice quantization (scale=1000) keeps 3 digits
    emb = fastrp_embeddings(und, dims=16, iterations=2, normalize=True)
    assignments, _ = kmeans(emb, k=4, iterations=3,
                            id_col="node", vec_col="emb")
    scored = pairs.join(
        assignments.select(F.col("id").alias("center"), "cluster"),
        "center")
    return (scored.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("cluster"))


if __name__ == "__main__":
    from examples._run import run
    run(main)
