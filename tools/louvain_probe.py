"""louvain star-contraction + _ckpt_sever scale probe (round 11).

One cell over the x10 (12M-edge) shifted co-purchase replication, fresh
SparkSession: run louvain(rounds=24) on the full 12M-edge graph and
record wall, per-stage physical totals, convergence (no warning = the
merge loop hit its fixpoint inside the budget), and community count.
The point being certified:

- the contraction loop's per-round cost tracks the SHRINKING community
  multigraph -- round 1 aggregates the full edge list once, later
  rounds run on the contracted graph;
- `_ckpt_sever` keeps driver time flat across rounds: the plain
  localCheckpoint loop's carried Catalyst size estimates compound into
  huge BigIntegers and hit 204s/round by round 10 at ONE-HUNDREDTH of
  this probe's data (see the _ckpt_sever docstring) -- this cell
  completing at all, at 12M edges and a deeper round budget, is the
  fix's scale evidence.

Usage:
    python tools/louvain_probe.py [--out tools/probes/louvain_probe_r11.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import warnings

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tools/probes/louvain_probe_r11.json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from bench import _stage_keys, _stage_metrics_delta
    import __spark_entry__ as entrymod
    from cypher_for_apache_flink_spark.functions.graph_algos import louvain

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
    n_edges = big.count()

    before = {k for k, _ in _stage_keys(spark)}
    t0 = time.time()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = louvain(big, rounds=24)
        n_nodes = out.count()
        n_comms = out.select("community").distinct().count()
    wall = round(time.time() - t0, 2)
    m = _stage_metrics_delta(spark, before)
    cell = {
        "cell": "louvain_x10_full", "n_edges": n_edges,
        "n_nodes": n_nodes, "n_communities": n_comms,
        "wall_s": wall,
        "budget_warning": any("louvain" in str(w.message) for w in caught),
        "cpu_ms": m["executor_cpu_ms"],
        "shuffle_write_bytes": m["shuffle_write_bytes"],
        "spill_bytes": m["spill_bytes"],
        "peak_task_memory": m["peak_task_memory"],
        "n_tasks": m["n_tasks"],
    }
    payload = {"sf_dir": SF_DIR, "cpus": CPUS, "scale": 10,
               "cells": [cell]}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
