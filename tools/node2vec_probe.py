"""node2vec probe-broadcast gate probe (VERDICT r10 #1 evidence,
round 11).

Three cells over the x10 (12M-edge) shifted co-purchase replication,
one fresh SparkSession each:

- n2v_sampled_16: the bench-like configuration (16 md5-sampled starts,
  length 6, p=4 q=0.25).  The 12M-edge set outgrows the 64 MiB budget,
  so the gate computes the max out-degree once; with the co-purchase
  degree distribution 16 x max_deg x 24 B stays under budget and the
  per-step pf broadcast is kept (pf_broadcast_calls > 0).
- n2v_hubstar_16: the SAME 16 starts and walk shape after compositing
  a ~200k-out-degree star hub into the graph, with an edge from every
  start node onto the hub so step 2's prev set contains it.  16 walks
  are trivially broadcast material, but pf (the prev nodes' out-edges)
  is now bounded by the hub fan-out: 16 x max_deg x 24 B blows the
  budget, the gate must pick the hash(prev, dst)-partitioned shuffled
  probe join, and pf_broadcast_calls == 0 while the cell completes --
  the VERDICT r10 #1 done-criterion (the middle regime the starts-count
  gate never saw).
- n2v_hubstar_forced_broadcast: the hub-star cell with the probe gate
  bypassed (budget patched huge AFTER the frontier gate decision is
  pinned), measuring what the r10 code would have done -- records the
  per-step pf broadcast of a ~3.2M-row frame so the gate's win is a
  number, not an assertion.  Skipped by default (it is the known-bad
  configuration; pass --cells to include it).

pf_broadcast_calls counts F.broadcast invocations from node2vec_walks
whose argument carries the probe's ``__common`` marker column, so the
regime proof is direct; frontier/prev-set broadcasts are counted
separately as other_broadcast_calls.

Usage:
    python tools/node2vec_probe.py [--out tools/probes/node2vec_probe_r11.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _session():
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _big_graph(spark):
    from pyspark.sql import functions as F
    import __spark_entry__ as entrymod
    base = entrymod._copurchase_edges(spark, SF_DIR) \
        .dropDuplicates(["src", "dst"])
    shift = (base.agg(F.max(F.greatest("src", "dst"))).collect()[0][0]
             or 0) + 1
    big = base
    for i in range(1, 10):
        big = big.unionAll(base.select(
            (F.col("src") + i * shift).alias("src"),
            (F.col("dst") + i * shift).alias("dst")))
    return big, shift


def run_cell(name: str) -> dict:
    spark = _session()
    from pyspark.sql import functions as F
    from bench import _stage_keys, _stage_metrics_delta
    import cypher_for_apache_flink_spark.functions.graph_algos as ga

    big, shift = _big_graph(spark)
    starts = (big.select(F.col("src").alias("node"))
              .dropDuplicates(["node"])
              .orderBy(F.md5(F.col("node").cast("string")))
              .limit(16))
    if name.startswith("n2v_hubstar"):
        # star hub: one node of out-degree 200k (16 starts x 200k x
        # 24 B = 73 MiB > the 64 MiB budget), plus an edge start -> hub
        # so walks CAN step onto the hub and pf inherit its fan-out
        hub = 10 * shift + 1
        fan = spark.range(200_000).select(
            F.lit(hub).alias("src"), (F.col("id") + 20 * shift).alias("dst"))
        onto = starts.select(F.col("node").alias("src"),
                             F.lit(hub).alias("dst"))
        big = big.unionAll(fan).unionAll(onto)
    big = big.repartition(int(CPUS)).persist()
    cell = {"cell": name, "n_edges": big.count()}

    counter = {"pf": 0, "other": 0}
    real_broadcast = ga.F.broadcast

    def counting_broadcast(df):
        if "__common" in df.columns:
            counter["pf"] += 1
        else:
            counter["other"] += 1
        return real_broadcast(df)

    old_budget = ga._PIN_DATA_BYTES
    try:
        if name == "n2v_hubstar_forced_broadcast":
            # what r10 did: no probe gate.  Emulated by a huge budget --
            # BOTH gates pass, so the frontier broadcasts (as it would
            # have) and pf broadcasts unconditionally.
            ga._PIN_DATA_BYTES = 1 << 40
        ga.F.broadcast = counting_broadcast
        before = {k for k, _ in _stage_keys(spark)}
        t0 = time.time()
        trace = ga.node2vec_walks(big, starts, length=6, p=4, q="0.25")
        n_rows = trace.count()
        cell["wall_s"] = round(time.time() - t0, 2)
        m = _stage_metrics_delta(spark, before)
        cell["n_trace_rows"] = n_rows
        cell["pf_broadcast_calls"] = counter["pf"]
        cell["other_broadcast_calls"] = counter["other"]
        cell.update({
            "cpu_ms": m["executor_cpu_ms"],
            "shuffle_write_bytes": m["shuffle_write_bytes"],
            "spill_bytes": m["spill_bytes"],
            "peak_task_memory": m["peak_task_memory"],
            "n_tasks": m["n_tasks"],
        })
    finally:
        ga.F.broadcast = real_broadcast
        ga._PIN_DATA_BYTES = old_budget
        big.unpersist()
        spark.stop()
    print(json.dumps(cell), file=sys.stderr)
    return cell


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tools/probes/node2vec_probe_r11.json")
    ap.add_argument("--cells", default="n2v_sampled_16,n2v_hubstar_16")
    args = ap.parse_args()
    cells = [run_cell(c) for c in args.cells.split(",") if c]
    payload = {"sf_dir": SF_DIR, "cpus": CPUS, "scale": 10,
               "pin_data_bytes": 64 << 20, "cells": cells}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
