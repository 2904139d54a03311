"""Skew-handling join utilities for hot keys.

AQE's skew-join split handles sort-merge skew after the fact; these helpers
restructure the plan up front for the pathological cases a 100 TB pipeline
hits (power-law join keys, e.g. document→domain or token→doc joins):

 - ``salted_join``: fan the small side out over N salts and split the big
   side's hot keys across them, so one reducer never owns a whole hot key;
 - ``hot_key_split_join``: classic two-path plan — broadcast-join the few
   hot keys, shuffle-join the long tail, union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: str, salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join where ``big``'s key distribution is skewed: ``big`` rows get
    a deterministic salt from their full row hash, ``small`` is replicated
    once per salt, and the join key becomes (key, salt) — each hot key now
    spreads over ``salts`` reducers.  Result equals ``big.join(small, on)``.
    """
    big_cols = [c for c in big.columns]
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]),
                         F.lit(salts)).cast("int"))
    salt_range = F.explode(
        F.sequence(F.lit(0), F.lit(salts - 1))).alias("__salt")
    salted_small = small.select("*", salt_range)
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def hot_key_split_join(big: DataFrame, other: DataFrame, on: str,
                       hot_threshold: int = 100_000,
                       how: str = "inner") -> DataFrame:
    """Two-path skew join: keys with more than ``hot_threshold`` rows in
    ``big`` join against a broadcast slice of ``other``; the long tail takes
    the normal shuffle join.  Result equals ``big.join(other, on)``."""
    hot_keys = (big.groupBy(on).agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > hot_threshold).select(on))
    hot_b = F.broadcast(hot_keys)
    big_hot = big.join(hot_b, on, "left_semi")
    big_tail = big.join(hot_b, on, "left_anti")
    other_hot = other.join(hot_b, on, "left_semi")
    hot_path = big_hot.join(F.broadcast(other_hot), on, how)
    tail_path = big_tail.join(other, on, how)
    return hot_path.unionByName(tail_path)
