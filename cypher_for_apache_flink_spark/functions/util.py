"""Shared helpers for the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None
                       ) -> DataFrame:
    """Widen thin inputs before heavy per-row compute.

    A small corpus often arrives as ONE parquet file = one partition, which
    serializes tokenize/shingle/minhash work onto a single core while the
    rest idle.  Repartition up to the session's default parallelism in that
    case; inputs that are already at least that wide (the warehouse-scale
    norm) pass through untouched, so no shuffle is added at 100 TB.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
