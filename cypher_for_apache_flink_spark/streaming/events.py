"""Structured Streaming operators over the events stream.

The reference has NO streaming at all (both backends run batch table
programs — SURVEY §2.3 negative space); this module is the Spark-first
extension: ``readStream`` sources, watermarked windowed aggregation,
session windows, and a custom stateful operator via
``applyInPandasWithState``.  Every transformation also runs unchanged on a
batch DataFrame (Spark's unified API), which is how the tests verify
results: stream with ``trigger(availableNow=True)`` == batch twin.

Scale notes: the windowed aggregates are standard watermark + hash-agg
(partial aggregation map-side, state store per window×key); the stateful
operator keeps O(users) state rows, Arrow-batched per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double, props string")


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based event stream: new parquet files in ``path`` become
    micro-batches (the standard landing-zone pattern)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per event type with late-data watermark.
    Works identically on a batch DataFrame (no watermark applied there)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window).alias("w"),
                        F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("value"), 6).alias("avg_value"))
            .select(F.col("w.start").alias("w_start"), "event_type",
                    "n", "avg_value"))


def sliding_event_counts(events: DataFrame, window: str = "1 hour",
                         slide: str = "15 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Sliding-window counts per event type: each event lands in
    window/slide overlapping windows (epoch-aligned, like F.window).
    Batch/stream identical by construction — same expression both ways.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window, slide).alias("w"),
                        F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("w_start"), "event_type", "n"))


def sessionized_counts(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based), the canonical stream
    sessionization."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy(F.session_window("ts", gap).alias("s"),
                        F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("s.start").alias("s_start"),
                    F.col("s.end").alias("s_end"), "user_id",
                    "n_events", "sum_value"))


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running event count and value sum,
    emitted on every micro-batch update (applyInPandasWithState).

    State = one (count, total) row per user — the pattern for any
    accumulate-forever per-key statistic the built-in aggregations can't
    express incrementally in update mode.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 6)]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def streaming_dedup_exact(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          ts_col: str = "ts",
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: drop any document whose normalized-text
    fingerprint was already seen within the watermark horizon — the
    streaming twin of functions.dedup.dedup_exact, with bounded state:
    dropDuplicatesWithinWatermark evicts a fingerprint once the watermark
    passes its event time.  (Plain dropDuplicates without the ts key never
    evicts — state grows with corpus size; VERDICT r3 #5.)"""
    from ..functions.text import fingerprint
    from pyspark.sql import functions as F
    out = docs.withColumn("__fp", fingerprint(F.col(text_col)))
    if docs.isStreaming:
        return out.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(["__fp"]).drop("__fp")
    return out.dropDuplicates(["__fp"]).drop("__fp")


def streaming_curate(docs: DataFrame, quality_min: float = 0.4,
                     sample_rate: float = 1.0, text_col: str = "text",
                     id_col: str = "doc_id", ts_col: str = "ts",
                     watermark: str = "1 hour") -> DataFrame:
    """Online corpus curation: quality filter -> deterministic hash-fraction
    sample -> watermarked exact dedup, on a document stream.

    The filter and sample stages are stateless per-row column expressions
    (identical results batch or stream, any micro-batch boundaries); the
    only state is the dedup fingerprint set, bounded by the watermark.  The
    streaming twin of functions.pipeline.curate_corpus's filter+dedup
    prefix — near-dup removal against a static reference corpus composes on
    top via :func:`streaming_near_dup_flags`.
    """
    from pyspark.sql import functions as F

    from ..functions.sampling import hash_hex, rate_threshold
    from ..functions.text import quality_score
    out = docs.where(quality_score(F.col(text_col)) >= quality_min)
    if sample_rate < 1.0:
        out = out.where(hash_hex(F.col(id_col)) < rate_threshold(sample_rate))
    return streaming_dedup_exact(out, text_col=text_col, id_col=id_col,
                                 ts_col=ts_col, watermark=watermark)


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "complete") -> None:
    """Drain the stream into an in-memory table with availableNow (test /
    backfill helper): processes everything currently in the source, then
    stops."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()


def streaming_near_dup_flags(docs: DataFrame, corpus: DataFrame,
                             n: int = 3, num_hashes: int = 8, bands: int = 4,
                             threshold: float = 0.5,
                             text_col: str = "text", id_col: str = "doc_id",
                             ts_col: str = "ts",
                             watermark: str = "1 hour") -> DataFrame:
    """Online near-duplicate detection: flag incoming documents that are
    MinHash-LSH near-duplicates of a STATIC reference corpus.

    The streaming twin of functions.dedup.minhash_lsh_pairs as a
    stream-static join: the corpus is shingled/banded once (cached static
    side), each micro-batch computes the incoming docs' band keys and joins
    on (band, key) — the stream side never sees more than its own rows plus
    matched candidates.  Exact Jaccard verifies candidates; duplicates from
    multiple shared bands are collapsed by the watermarked dropDuplicates.
    Returns (doc_id, ref, jaccard).
    """
    from pyspark.sql import functions as F

    from ..functions.dedup import minhash_from_shingles, word_shingles

    per_band = num_hashes // bands

    def band_entries(df, doc_alias):
        sh = word_shingles(F.col(text_col), n)
        sig = minhash_from_shingles(F.col("__sh"), num_hashes)
        out = df.withColumn("__sh", sh).withColumn("__sig", sig)
        return out.select(
            F.col(id_col).alias(doc_alias),
            *([F.col(ts_col)] if ts_col in df.columns else []),
            F.col("__sh").alias(f"{doc_alias}_sh"),
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"),
                         F.md5(F.concat_ws("|", *[
                             F.col("__sig")[b * per_band + r]
                             for r in range(per_band)])).alias("key"))
                for b in range(bands)])).alias("bk")
        ).select("*", F.col("bk.band").alias("band"),
                 F.col("bk.key").alias("key")).drop("bk")

    ref = band_entries(corpus, "ref").cache()
    stream = band_entries(docs, "doc")
    if docs.isStreaming:
        stream = stream.withWatermark(ts_col, watermark)
    cand = stream.join(ref.withColumnRenamed(f"{'ref'}_sh", "ref_sh"),
                       ["band", "key"], "inner")
    inter = F.size(F.array_intersect(F.col("doc_sh"), F.col("ref_sh")))
    union = F.size(F.col("doc_sh")) + F.size(F.col("ref_sh")) - inter
    flagged = (cand.withColumn("jaccard", F.round(inter / union, 6))
               .where(F.col("jaccard") >= threshold)
               .select(F.col("doc").alias(id_col), "ref", "jaccard",
                       *([F.col(ts_col)] if ts_col in docs.columns else [])))
    if docs.isStreaming:
        # watermark-bounded state: a (doc, ref) pair's entry is evicted
        # once the watermark passes its event time
        return flagged.dropDuplicatesWithinWatermark([id_col, "ref"])
    return flagged.dropDuplicates([id_col, "ref"])


def correlated_events(events: DataFrame, first_type: str = "view",
                      then_type: str = "click", within: str = "10 minutes",
                      watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream interval join: for each user, pair every
    ``first_type`` event with the ``then_type`` events that FOLLOW it
    within ``within`` (classic funnel / attribution correlation).

    On a stream both sides carry watermarks and the join condition bounds
    event-time range, so Spark can evict state — bounded memory at any
    input rate.  On a batch DataFrame the same equi+range join runs as a
    plain join, so the batch form is the SQL oracle's twin.  Returns
    (user_id, first_id, then_id, gap_micros) — the gap in MICROseconds.
    """
    lhs = events.where(F.col("event_type") == first_type).select(
        F.col("user_id"), F.col("event_id").alias("first_id"),
        F.col("ts").alias("first_ts"))
    rhs = events.where(F.col("event_type") == then_type).select(
        F.col("user_id").alias("u2"), F.col("event_id").alias("then_id"),
        F.col("ts").alias("then_ts"))
    if events.isStreaming:
        lhs = lhs.withWatermark("first_ts", watermark)
        rhs = rhs.withWatermark("then_ts", watermark)
    cond = ((F.col("user_id") == F.col("u2"))
            & (F.col("then_ts") > F.col("first_ts"))
            & (F.col("then_ts") <= F.col("first_ts")
               + F.expr(f"INTERVAL {within}")))
    # parquet events carry TIMESTAMP_NTZ; unix_micros needs TIMESTAMP —
    # the cast only shifts both sides by the same session-tz offset, so
    # the difference is exact
    return (lhs.join(rhs, cond)
            .select("user_id", "first_id", "then_id",
                    (F.unix_micros(F.col("then_ts").cast("timestamp"))
                     - F.unix_micros(F.col("first_ts").cast("timestamp")))
                    .alias("gap_micros")))
