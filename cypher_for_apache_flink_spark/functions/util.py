"""Shared helpers for the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Size-aware mode only widens when each target partition would receive at
# least this many bytes.  Used where the next stage is CHEAP per row (a
# quality filter): there the repartition shuffle plus 32-task scheduling
# overhead on every downstream stage costs more than the parallelism buys
# (measured: curate_corpus at sf0.1 is 1.8x slower force-spread over 32
# cores, because its heavy minhash stage already sits downstream of the
# dedup window shuffle and is parallel either way).
_MIN_BYTES_PER_PARTITION = 8 << 20  # 8 MiB


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for the plan (exact file bytes for a bare
    scan, propagated estimate above it).  None when the estimate is the
    unknown-size sentinel, so callers fall back to always-widen."""
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        size = raw if isinstance(raw, int) else int(raw.toString())
    except Exception:
        return None
    return size if 0 <= size < (1 << 50) else None


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None,
                       size_aware: bool = False) -> DataFrame:
    """Widen thin inputs before heavy per-row compute.

    A corpus often arrives as ONE parquet file = one partition, which
    serializes tokenize/shingle/minhash work onto a single core (measured:
    minhash_lsh_pairs over 5k docs is 5x slower unwidened).  Default mode
    always widens to the session's default parallelism because per-row
    signature compute dwarfs the shuffle of the input bytes at any scale.

    ``size_aware=True`` is for call sites whose NEXT stage is cheap and
    whose heavy stages sit downstream of a natural shuffle: it only widens
    when each target partition would get at least 8 MiB, so tiny corpora
    skip the pointless shuffle.  Warehouse-scale inputs are already wide —
    both modes pass through untouched at 100 TB.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    current = df.rdd.getNumPartitions()
    if current >= target:
        return df
    if size_aware:
        size = _plan_size_bytes(df)
        if size is not None:
            target = min(target, max(1, size // _MIN_BYTES_PER_PARTITION))
        if current >= target:
            return df
    return df.repartition(target)
