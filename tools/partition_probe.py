"""A/B partition-pin probe (VERDICT r8 #1 evidence).

Runs triangle_count + pagerank over the co-purchase graph at two scales
(x1 = sf-dir base, x10 = shifted replication) under every combination of
  mode  in {pinned (SPARK_GRAFT_FORCE_PIN=always), unpinned (=never)}
  spark.sql.shuffle.partitions in {32, 64, 200}
with one fresh SparkSession per cell so the config applies to every
exchange.  Records wall seconds AND the load-invariant physical totals
(executor cpu_ms, shuffle write bytes, tasks) via bench.py's
AppStatusStore stage diff — wall alone drifts ±50-90% on this sandbox.

This is the committed measurement behind functions/graph_algos.py
_pin_parts: the gate pins only when the session default is badly
mismatched because the pinned mode must win exactly there (200 parts on
a 32-core box) and must NOT be forced where it loses (32/64 parts).

Usage:
    python tools/partition_probe.py [--scales 1,10] [--parts 32,64,200] \
        [--out tools/probes/partition_probe_r9.json]

Supersedes tools/triangle_partition_probe.py (wall-only, unpinned-mode
measurements quoted in round 8 but never committed as an artifact).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def run_cell(mode: str, parts: int, scale: int) -> dict:
    os.environ["SPARK_GRAFT_FORCE_PIN"] = \
        "always" if mode == "pinned" else "never"
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", str(parts))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod
    from bench import _stage_keys, _stage_metrics_delta
    from cypher_for_apache_flink_spark.functions.graph_algos import (
        pagerank, triangle_count,
    )
    base = entrymod._copurchase_edges(spark, SF_DIR) \
        .dropDuplicates(["src", "dst"])
    shift = (base.agg(F.max(F.greatest("src", "dst"))).collect()[0][0]
             or 0) + 1
    big = base
    for i in range(1, scale):
        big = big.unionAll(base.select(
            (F.col("src") + i * shift).alias("src"),
            (F.col("dst") + i * shift).alias("dst")))
    big = big.repartition(int(CPUS)).persist()
    n_edges = big.count()
    cell = {"mode": mode, "parts": parts, "scale": scale,
            "n_edges": n_edges}
    for name, action in (
            ("triangle", lambda: triangle_count(big).collect()),
            ("pagerank", lambda: pagerank(big, iterations=3).count())):
        before = {k for k, _ in _stage_keys(spark)}
        t0 = time.time()
        res = action()
        wall = round(time.time() - t0, 2)
        m = _stage_metrics_delta(spark, before)
        cell[name] = {"wall_s": wall, "cpu_ms": m["executor_cpu_ms"],
                      "shuffle_write_bytes": m["shuffle_write_bytes"],
                      "spill_bytes": m["spill_bytes"],
                      "n_tasks": m["n_tasks"]}
        if name == "triangle":
            cell["n_triangles"] = res[0][0]
    spark.stop()
    return cell


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10")
    ap.add_argument("--parts", default="32,64,200")
    ap.add_argument("--out", default="tools/probes/partition_probe_r9.json")
    args = ap.parse_args()
    results = []
    for scale in [int(s) for s in args.scales.split(",")]:
        for parts in [int(p) for p in args.parts.split(",")]:
            for mode in ("unpinned", "pinned"):
                cell = run_cell(mode, parts, scale)
                results.append(cell)
                print(json.dumps(cell), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"sf_dir": SF_DIR, "cpus": CPUS, "cells": results}, f,
                  indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
