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
