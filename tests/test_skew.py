"""Skew-join utilities: result parity with the plain join, plan shape."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.skew import (
    hot_key_split_join,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (k=1, 500 rows), long tail of singletons
    big = spark.range(600).select(
        F.when(F.col("id") < 500, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"))
    small = spark.createDataFrame(
        [(1, "hot"), (550, "cold"), (599, "cold2")], "k long, tag string")
    return big, small


def bag(df):
    return Counter(tuple(r) for r in df.collect())


def test_salted_join_parity(skewed):
    big, small = skewed
    want = bag(big.join(small, "k").select("k", "payload", "tag"))
    got = bag(salted_join(big, small, "k", salts=8)
              .select("k", "payload", "tag"))
    assert got == want and sum(want.values()) == 502


def test_hot_key_split_join_parity(skewed):
    big, small = skewed
    want = bag(big.join(small, "k").select("k", "payload", "tag"))
    got = bag(hot_key_split_join(big, small, "k", hot_threshold=100)
              .select("k", "payload", "tag"))
    assert got == want


def test_hot_path_is_broadcast(skewed):
    big, small = skewed
    plan = hot_key_split_join(big, small, "k", hot_threshold=100) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_default_hub_cap_bounds_wedge_join(spark):
    """VERDICT r4 #4: the uncapped default was a power-law footgun.  A hub
    whose degree exceeds DEFAULT_SKEW_CAP is dropped as a wedge *neighbor*
    by default, so the star graph produces zero candidate pairs instead of
    an O(deg^2) = 55M-row blowup (this test finishing at all is the gate)."""
    from cypher_for_apache_flink_spark.functions import dedup
    from cypher_for_apache_flink_spark.functions.graph_algos import (
        neighborhood_jaccard_pairs,
    )
    hub_deg = dedup.DEFAULT_SKEW_CAP + 500
    edges = spark.range(1, hub_deg + 1).selectExpr("0 AS src", "id AS dst")
    out = neighborhood_jaccard_pairs(edges, threshold=0.01)
    assert out.count() == 0


def test_default_shingle_cap_applies(spark, monkeypatch):
    """The 'auto' default resolves DEFAULT_SKEW_CAP at call time: with the
    cap lowered, docs whose only shared shingle is ultra-frequent produce
    no candidate pair, while a rare shared shingle still does."""
    from cypher_for_apache_flink_spark.functions import dedup
    monkeypatch.setattr(dedup, "DEFAULT_SKEW_CAP", 3)
    common = "alpha beta gamma"            # one 3-shingle, in every doc
    docs = spark.createDataFrame(
        [(i, common) for i in range(5)]
        + [(10, "rare one two extra"), (11, "rare one two other")],
        "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.1)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert got == {(10, 11)}               # the 5 common-only docs blocked
    # explicit None restores the exact unbounded join
    exact = {(r.a, r.b) for r in dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.99, max_shingle_freq=None).collect()}
    assert {(a, b) for a, b in exact if a < 5} == {
        (a, b) for a in range(5) for b in range(a + 1, 5)}
