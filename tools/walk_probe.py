"""Random-walk frontier-gate + k-truss spill probe (VERDICT r9 #1/#2
evidence, round 10).

Three walk cells over the x10 (12M-edge) shifted co-purchase replication
plus one k-truss quarter-sample cell, one fresh SparkSession each:

- walks_sampled_16: the bench configuration (16 md5-sampled starts,
  length 8).  The size gate must pick the BROADCAST regime (the start
  set is 16 rows); broadcast_calls > 0 proves it did.
- walks_allnodes_natural: starts = EVERY node of the 12M-edge graph,
  natural gate.  Records n_starts and which regime the gate picked
  given the real start-set size (n_starts x 16 B vs the 64 MiB budget).
- walks_allnodes_shuffled: same all-node start set with the budget
  patched to 1 byte, forcing the shuffled node-keyed join -- the
  100-TB regime where |starts| ~ |V| and a broadcast would be a
  driver-side collect of the node set per step.  broadcast_calls == 0
  proves no frontier broadcast happened; the cell completing at all is
  the VERDICT r9 #1 done-criterion.
- ktruss_quarter: the bench's sf1 quarter-sample cell (md5 < '4',
  k=5, rounds=1) after the round-10 size-gated shuffle_hash treatment;
  spill_bytes must be 0 (was 2,862,835,315 in BENCH_r09.json).

broadcast_calls counts invocations of pyspark.sql.functions.broadcast
made FROM graph_algos.random_walks (the module-level F alias is patched
around the call), so the regime proof is direct, not inferred from
shuffle shapes.

Usage:
    python tools/walk_probe.py [--out tools/probes/walk_probe_r10.json]
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
    big = big.repartition(int(CPUS)).persist()
    return big, big.count()


def run_cell(name: str) -> dict:
    spark = _session()
    from pyspark.sql import functions as F
    from bench import _stage_keys, _stage_metrics_delta
    import cypher_for_apache_flink_spark.functions.graph_algos as ga

    big, n_edges = _big_graph(spark)
    cell = {"cell": name, "n_edges": n_edges}

    counter = {"n": 0}
    real_broadcast = ga.F.broadcast
    old_force_pin = os.environ.get("SPARK_GRAFT_FORCE_PIN")

    def counting_broadcast(df):
        counter["n"] += 1
        return real_broadcast(df)

    old_budget = ga._PIN_DATA_BYTES
    try:
        if name.startswith("ktruss_quarter"):
            import warnings as W
            q = big.where(F.md5(F.concat_ws("|", F.col("src"),
                                            F.col("dst"))) < "4")
            if name.endswith("_big"):
                # force the big-regime branch (pinned exchanges +
                # shuffle_hash enumeration joins) on the same input
                ga._PIN_DATA_BYTES = 1
            elif name.endswith("_shj"):
                # big-regime join strategy WITHOUT the partition pin:
                # isolates the shuffle_hash hints from the 2x-parallelism
                # repartitions
                ga._PIN_DATA_BYTES = 1
                os.environ["SPARK_GRAFT_FORCE_PIN"] = "never"
            before = {k for k, _ in _stage_keys(spark)}
            t0 = time.time()
            with W.catch_warnings():
                W.simplefilter("ignore")
                ga.k_truss(q, k=5, rounds=1).collect()
            cell["wall_s"] = round(time.time() - t0, 2)
            m = _stage_metrics_delta(spark, before)
        else:
            if name == "walks_sampled_16":
                starts = (big.select(F.col("src").alias("node"))
                          .dropDuplicates(["node"])
                          .orderBy(F.md5(F.col("node").cast("string")))
                          .limit(16))
            else:
                starts = (big.select(F.col("src").alias("node"))
                          .unionAll(big.select(F.col("dst").alias("node")))
                          .dropDuplicates(["node"]))
            if name == "walks_allnodes_shuffled":
                ga._PIN_DATA_BYTES = 1
            ga.F.broadcast = counting_broadcast
            before = {k for k, _ in _stage_keys(spark)}
            t0 = time.time()
            trace = ga.random_walks(big, starts, length=8)
            n_rows = trace.count()
            cell["wall_s"] = round(time.time() - t0, 2)
            m = _stage_metrics_delta(spark, before)
            cell["n_trace_rows"] = n_rows
            cell["n_starts"] = trace.where(F.col("step") == 0).count()
            cell["frontier_broadcast_calls"] = counter["n"]
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
        if old_force_pin is None:
            os.environ.pop("SPARK_GRAFT_FORCE_PIN", None)
        else:
            os.environ["SPARK_GRAFT_FORCE_PIN"] = old_force_pin
        big.unpersist()
        spark.stop()
    print(json.dumps(cell), file=sys.stderr)
    return cell


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tools/probes/walk_probe_r10.json")
    ap.add_argument("--cells", default="walks_sampled_16,"
                    "walks_allnodes_natural,walks_allnodes_shuffled,"
                    "ktruss_quarter,ktruss_quarter_big,ktruss_quarter_shj")
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
