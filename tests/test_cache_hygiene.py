"""Query-scoped cache hygiene (VERDICT r3 #6/#4): planner caches are
released once the result is done; plan construction never runs jobs."""

import gc

import pytest

from cypher_for_apache_flink_spark import CypherSession, PropertyGraph


def _cached_rdds(spark):
    return [i for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if i.numCachedPartitions() > 0]


@pytest.fixture()
def chain_graph(spark):
    nodes = {frozenset({"N"}): spark.createDataFrame(
        [(i,) for i in range(20)], "id long")}
    rels = {"R": spark.createDataFrame(
        [(100 + i, i, i + 1) for i in range(19)],
        "id long, source long, target long")}
    return PropertyGraph(nodes, rels, name="chain")


def _cached_ids(spark):
    return {i.id() for i in _cached_rdds(spark)}


def test_var_length_cache_released_explicitly(spark, chain_graph):
    # track by RDD id, not by count: other tests' dead leases drain
    # asynchronously and would offset the +1/-1 this test asserts
    before = _cached_ids(spark)
    res = CypherSession.for_graph(chain_graph).cypher(
        "MATCH (a:N)-[:R*1..3]->(b:N) RETURN count(*) AS n")
    assert res.collect()[0]["n"] == 19 + 18 + 17
    # the slim pruned edge cache was materialized by the collect
    fresh = _cached_ids(spark) - before
    assert fresh
    res.release()
    assert not (_cached_ids(spark) & fresh)


def test_var_length_cache_released_by_gc(spark, chain_graph):
    before = len(_cached_rdds(spark))
    res = CypherSession.for_graph(chain_graph).cypher(
        "MATCH (a:N)-[:R*2..4]->(b:N) RETURN count(*) AS n")
    df = res.df
    df.collect()
    del res, df
    gc.collect()
    assert len(_cached_rdds(spark)) <= before


def test_unbounded_frontier_caches_released(spark):
    # The unbounded loop localCheckpoints one frontier per hop (plan
    # truncation — a deep chain used to OOM the DRIVER during planning).
    # Checkpointed frontiers are freed by Spark's ContextCleaner once the
    # result is garbage-collected; poll briefly for the async cleanup.
    import time

    nodes = {frozenset({"N"}): spark.createDataFrame(
        [(i, i) for i in range(6)], "id long, v long")}
    rels = {"R": spark.createDataFrame(
        [(100 + i, i, i + 1) for i in range(5)],
        "id long, source long, target long")}
    g = PropertyGraph(nodes, rels, name="chain6")
    gc.collect()
    before = len(_cached_rdds(spark))
    res = CypherSession.for_graph(g).cypher(
        "MATCH (a:N)-[:R*]->(b:N) WHERE a.v = 0 RETURN count(*) AS n")
    assert res.collect()[0]["n"] == 5
    # explicit release leaves checkpoints alive (re-access CAN'T recompute
    # them); the lease frees their storage when the result is GC'd
    res.release()
    assert res.collect()[0]["n"] == 5
    del res
    gc.collect()
    for _ in range(8):
        if len(_cached_rdds(spark)) <= before:
            break
        time.sleep(0.25)
    assert len(_cached_rdds(spark)) <= before


def test_minhash_shingle_cache_released_by_gc(spark):
    from cypher_for_apache_flink_spark.functions.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 3} jumps over the lazy dog")
         for i in range(30)], "doc_id long, text string")
    gc.collect()
    before = len(_cached_rdds(spark))
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    assert pairs.count() > 0
    del pairs
    gc.collect()
    assert len(_cached_rdds(spark)) <= before


def test_cosine_near_dup_requires_dims_not_a_job(spark):
    from cypher_for_apache_flink_spark.functions.similarity import (
        cosine_near_dup_pairs,
    )

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>")
    # no hidden head() probe: dims is an explicit plan-time parameter ...
    with pytest.raises(ValueError, match="dims"):
        cosine_near_dup_pairs(empty, threshold=0.9)
    # ... and with it, plan construction works even on an EMPTY input
    # (the old head() probe raised IndexError here)
    out = cosine_near_dup_pairs(empty, threshold=0.9, dims=8)
    assert out.collect() == []
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    got = {(r["a"], r["b"]) for r in
           cosine_near_dup_pairs(vecs, threshold=0.99, dims=2).collect()}
    assert got == {(1, 2)}
