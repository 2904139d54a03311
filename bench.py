"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "scan_filter",
    "expand_2hop",
    "expand_3hop_keyword_types",
    "agg_tpch_q1",
    "agg_stats",
    "var_length_1_2",
    "optional_match_count",
    "exists_pattern",
    "with_pipeline",
    "case_expression",
    "events_temporal",
    "text_profile",
    "dedup_exact_keep",
    "minhash_lsh_pairs",
    "similarity_topk",
    "similarity_topk_ivf",
    "cosine_near_dup_pairs",
    "curate_corpus",
    "construct_requery",
    "ddl_graph",
    "pack_sequences",
    "contamination_check",
    "pagerank",
    "repetition_profile",
    "pii_scrub",
    "chunk_documents",
    "triangle_count",
    "k_core",
    "node_similarity",
    "events_sessions",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.0

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    # Warm the JVM / parquet footers with one cheap query.
    qs["scan_nodes"](spark, sf_dir).collect()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings, spreads = {}, {}
    for name in HEADLINE:
        # BASELINE.md §3: warm JVM, median of 5.  Run 0 is a discarded
        # warm-up (one-off codegen/JIT that a long-lived cluster job
        # amortizes to nothing); the median of the next `runs` is reported,
        # plus the relative spread so run-to-run noise is visible.
        samples, n = [], 0
        for i in range(runs + 1):
            t0 = time.time()
            n = len(qs[name](spark, sf_dir).collect())
            dt = time.time() - t0
            if i > 0:
                samples.append(dt)
            # Drop the run's cache leases NOW: lazy finalization would let
            # cached corpora from prior runs pile up and perturb later
            # timings (spread, not median, but keep the noise down).
            gc.collect()
        samples.sort()
        med = samples[len(samples) // 2] if len(samples) % 2 else \
            (samples[len(samples) // 2 - 1] + samples[len(samples) // 2]) / 2
        timings[name] = round(med, 3)
        spreads[name] = round((samples[-1] - samples[0]) / med, 3) if med else 0.0
        print(f"# {name}: median {timings[name]}s over {runs} warm runs "
              f"(spread {spreads[name]:.0%}, {n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({"metric": "headline_total", "value": total,
                      "unit": "sec", "queries": timings, "sf": sf,
                      "protocol": f"median_of_{runs}_warm",
                      "spread": spreads}))


if __name__ == "__main__":
    main()
