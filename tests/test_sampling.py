"""Sampling / mixing / packing / contamination operators."""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.sampling import (
    contamination_check, domain_mixture, hash_hex, pack_sequences,
    rate_threshold, sample_fraction, sample_stratified)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 50}" for j in range(20)),
             ["en", "de", "fr"][i % 3], f"src{i % 4}")
            for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string, source string")


def test_rate_threshold_bounds():
    assert rate_threshold(0.0) == "0" * 32
    assert rate_threshold(1.0) == "g"  # sorts above every 32-char md5
    assert rate_threshold(0.5).startswith("80")
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_sample_fraction_deterministic_and_calibrated(docs):
    a = sorted(r.doc_id for r in sample_fraction(docs, 0.5).collect())
    b = sorted(r.doc_id
               for r in sample_fraction(docs.repartition(7), 0.5).collect())
    assert a == b  # same rows regardless of partitioning
    assert 140 <= len(a) <= 260  # ~200 expected


def test_sample_stratified_rates(docs):
    out = sample_stratified(docs, {"src0": 1.0, "src1": 0.0},
                            default_rate=0.5)
    by_src = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["src0"] == 100  # rate 1.0 keeps everything
    assert "src1" not in by_src  # rate 0.0 keeps nothing
    assert 25 <= by_src.get("src2", 0) <= 75


def test_domain_mixture_counts_and_determinism(docs):
    out = domain_mixture(docs, {"src0": 3.0, "src1": 1.0}, total=80)
    by_src = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src == {"src0": 60, "src1": 20}
    again = domain_mixture(docs.repartition(13), {"src0": 3.0, "src1": 1.0},
                           total=80)
    assert (sorted(r.doc_id for r in out.collect())
            == sorted(r.doc_id for r in again.collect()))


def test_domain_mixture_prefilter_is_exact(docs):
    exact = domain_mixture(docs, {"src0": 3.0, "src1": 1.0}, total=40)
    pruned = domain_mixture(docs, {"src0": 3.0, "src1": 1.0}, total=40,
                            prefilter_margin=2.0)
    assert (sorted(r.doc_id for r in exact.collect())
            == sorted(r.doc_id for r in pruned.collect()))


def test_pagerank_empty_edges(spark):
    from cypher_for_apache_flink_spark.functions.graph_algos import pagerank
    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges, iterations=3).collect() == []


def test_domain_mixture_underfilled_domain(docs):
    # src0 only has 100 docs; target 200 -> keeps all 100, no error
    out = domain_mixture(docs, {"src0": 1.0}, total=200)
    assert out.count() == 100


def test_pack_sequences_fill_invariants(docs):
    out = pack_sequences(docs, budget=100, part_col="lang").collect()
    by_part = {}
    for r in sorted(out, key=lambda r: (r.part, r.doc_id)):
        by_part.setdefault(r.part, []).append(r)
    for rows in by_part.values():
        bins = [r.bin for r in rows]
        assert bins == sorted(bins)  # contiguous fill: bins non-decreasing
        assert bins[0] == 0
        # bin boundary: cumulative tokens before a doc // budget is its bin
        cum = 0
        for r in rows:
            assert r.bin == cum // 100
            cum += r.n_tokens


def test_contamination_check_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(10, "alpha beta gamma delta zeta"),      # shares 2 shingles
         (11, "totally unrelated words here now"),  # shares none
         (12, "alpha beta gamma delta epsilon")],   # shares all 3
        "doc_id long, text string")
    hits = {r.doc_id: r.n_shared
            for r in contamination_check(train, bench, n=3,
                                         min_overlap=1).collect()}
    assert hits == {10: 2, 12: 3}
    strict = contamination_check(train, bench, n=3, min_overlap=3)
    assert [r.doc_id for r in strict.collect()] == [12]


def test_hash_hex_matches_duckdb(spark):
    import duckdb
    ours = {r.k: r.h for r in spark.range(5).select(
        F.col("id").alias("k"), hash_hex(F.col("id")).alias("h")).collect()}
    theirs = dict(duckdb.connect().execute(
        "SELECT i, md5(CAST(i AS VARCHAR)) FROM generate_series(0, 4) t(i)"
    ).fetchall())
    assert ours == theirs


def test_sample_weighted_deterministic_and_biased(spark):
    from cypher_for_apache_flink_spark.functions.sampling import (
        sample_weighted,
    )
    rows = ([(i, 100.0) for i in range(100)]         # heavy
            + [(i, 1.0) for i in range(100, 200)])   # light
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sample_weighted(df, n=50, weight_col="w")
    ids = sorted(r.doc_id for r in got.collect())
    again = sample_weighted(df.repartition(7), n=50, weight_col="w")
    assert ids == sorted(r.doc_id for r in again.collect())
    heavy = sum(1 for i in ids if i < 100)
    assert heavy >= 40  # 100x weight dominates the draw


def test_sample_weighted_drops_nonpositive_weights(spark):
    from cypher_for_apache_flink_spark.functions.sampling import (
        sample_weighted,
    )
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -5.0), (4, 2.0)], "doc_id long, w double")
    ids = sorted(r.doc_id for r in
                 sample_weighted(df, n=10, weight_col="w").collect())
    assert ids == [1, 4]


def test_sample_weighted_plan_is_topk(spark):
    """Global top-n compiles to TakeOrderedAndProject — per-partition
    partial top-n, no full sort."""
    from cypher_for_apache_flink_spark.functions.sampling import (
        sample_weighted,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sample_weighted(docs, n=10, weight_col="n_chars")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_pack_sequences_two_level_bounds_window_tasks(docs):
    """VERDICT r5 #1: with one dominant partition, the packing window splits
    it into ceil(part_tokens / target) hash shards — no single task ever
    sorts a whole language."""
    import math
    from collections import defaultdict

    out = pack_sequences(docs, budget=100,
                         target_partition_tokens=500).collect()
    part_tokens, shards = defaultdict(int), defaultdict(set)
    for r in out:
        part_tokens[r.part] += r.n_tokens
        shards[r.part].add(r.shard)
    assert any(len(s) > 1 for s in shards.values())  # sharding kicked in
    for p, shset in shards.items():
        n_shards = max(1, math.ceil(part_tokens[p] / 500))
        assert all(0 <= s < n_shards for s in shset), (p, shset, n_shards)
    # contiguous fill holds WITHIN each (part, shard)
    by = defaultdict(list)
    for r in sorted(out, key=lambda r: (r.part, r.shard, r.doc_id)):
        by[(r.part, r.shard)].append(r)
    for rows in by.values():
        cum = 0
        for r in rows:
            assert r.bin == cum // 100
            cum += r.n_tokens


def test_pack_sequences_window_never_partitions_raw_part_alone(docs):
    """Plan gate (VERDICT r5 #1): the default plan's window spec partitions
    on (part, shard), never the raw low-cardinality part column alone."""
    import re

    plan = (pack_sequences(docs, budget=100)
            ._jdf.queryExecution().optimizedPlan().toString())
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        assert "shard" in spec, spec


def test_pack_sequences_shard_matches_duckdb(spark):
    """The md5-hex60 shard is engine-portable: DuckDB computes the identical
    shard for every id (same reproducibility contract as hash_hex)."""
    import duckdb

    from pyspark.sql import functions as F
    ids = spark.range(100).select(F.col("id").alias("doc_id"))
    hash60 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
        16, 10).cast("long")
    got = {r.doc_id: r.s for r in
           ids.select("doc_id", F.pmod(hash60, F.lit(7)).alias("s"))
           .collect()}
    want = dict(duckdb.sql(
        "SELECT i, CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15)) "
        "AS BIGINT) % 7 FROM range(100) t(i)").fetchall())
    assert got == want
