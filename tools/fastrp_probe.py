"""FastRP scale probe (round 11).

Two cells over the x10 (12M-edge) shifted co-purchase replication,
fresh SparkSession each: fastrp_embeddings at dims=32 on the full
graph, integer-exact and normalized variants.  The points being
certified:

- per-iteration cost is TWO node-id-keyed exchanges (embedding join +
  dims-column hash aggregate) over the bidirectional edge list -- no
  spill, no broadcast of anything unbounded, peak task memory flat in
  dims;
- the aggregate state is O(dims) per node and map-side combinable, so
  the 24M-row neighbor stream collapses before the exchange;
- `_ckpt_sever` keeps the per-iteration Catalyst tree O(dims), not
  O(dims x iterations) (same discipline as the louvain probe).

Usage:
    python tools/fastrp_probe.py [--out tools/probes/fastrp_probe_r11.json]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tools/probes/fastrp_probe_r11.json")
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
    from cypher_for_apache_flink_spark.functions.graph_algos import (
        fastrp_embeddings)

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

    cells = []
    # dims=32 keeps the 200k-node state at 53 MB -- the broadcast
    # regime; dims=48 pushes it to 78 MB, past the 64 MiB gate -- the
    # shuffle_hash fallback regime is exercised, not assumed.
    for name, dims, kw in (("fastrp_x10_int", 32, {}),
                           ("fastrp_x10_norm", 32, {"normalize": True}),
                           ("fastrp_x10_int_shuffled", 48, {})):
        before = {k for k, _ in _stage_keys(spark)}
        t0 = time.time()
        out = fastrp_embeddings(big, dims=dims, iterations=3, **kw)
        n_nodes = out.count()
        wall = round(time.time() - t0, 2)
        m = _stage_metrics_delta(spark, before)
        cells.append({
            "cell": name, "n_edges": n_edges, "n_nodes": n_nodes,
            "dims": dims, "iterations": 3, "wall_s": wall,
            "cpu_ms": m["executor_cpu_ms"],
            "shuffle_write_bytes": m["shuffle_write_bytes"],
            "spill_bytes": m["spill_bytes"],
            "peak_task_memory": m["peak_task_memory"],
            "n_tasks": m["n_tasks"],
        })
    payload = {"sf_dir": SF_DIR, "cpus": CPUS, "scale": 10,
               "cells": cells}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
