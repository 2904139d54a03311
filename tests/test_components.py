"""Connected-components tests: transitive near-dup clustering."""
import pytest
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.components import (
    connected_components, dedup_clusters)


def test_chain_is_one_component(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a long, b long")
    cc = {r["node"]: r["cc"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_clusters_keep_min(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 2), (7, 8)], "a long, b long")
    out = {(r["component"], r["keep_id"], r["n_docs"])
           for r in dedup_clusters(pairs).collect()}
    assert out == {(2, 2, 3), (7, 7, 2)}


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-12: diameter 12, still < max_iter rounds because
    # min-label propagation halves distances through the min(cc) rewiring
    pairs = spark.createDataFrame([(i, i + 1) for i in range(12)],
                                  "a long, b long")
    cc = connected_components(pairs)
    assert cc.select("cc").distinct().count() == 1


def test_real_near_dup_pairs_cluster(spark):
    from cypher_for_apache_flink_spark.functions.dedup import ngram_jaccard_pairs
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.3, max_shingle_freq=100)
    if pairs.head(1):
        clusters = dedup_clusters(pairs)
        total_nodes = clusters.agg(F.sum("n_docs")).head()[0]
        distinct_docs = (pairs.select(F.col("a").alias("d"))
                         .union(pairs.select("b")).distinct().count())
        assert total_nodes == distinct_docs


def test_long_chain_converges_logarithmically(spark):
    """Pointer doubling (round 9): a 600-link chain has diameter 600 —
    far past the 25-round budget of plain min-label propagation — but
    label-of-label chasing closes it in ~log2(600) rounds."""
    from cypher_for_apache_flink_spark.functions.components import (
        connected_components)
    pairs = [(i, i + 1) for i in range(600)]
    df = spark.createDataFrame(pairs, "a long, b long")
    out = connected_components(df)
    comps = out.select("cc").distinct().collect()
    assert len(comps) == 1 and comps[0][0] == 0
