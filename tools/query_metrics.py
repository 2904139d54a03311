"""Load-invariant physical metrics for one declared query: run it warm
and print the stage-metrics delta (shuffle bytes/records, input bytes,
task/stage counts, executor run/CPU time, spill, peak task memory) the
same way bench.py captures them -- the A/B signal that survives sandbox
co-tenancy noise (guide §1, OPTIMIZATION_r11.md measurement caveat).

Usage: python tools/query_metrics.py <query> [sf_dir] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = list(sys.argv[1:])
    runs = 1
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    query = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.retainedStages", "3000")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    fn = qs[query]

    qs["scan_nodes"](spark, sf_dir).collect()
    t0 = time.time()
    fn(spark, sf_dir).collect()
    print(f"# warm run 0 (discarded): {time.time() - t0:.2f}s",
          file=sys.stderr)
    spark.catalog.clearCache()

    for r in range(runs):
        before = {k for k, _ in bench._stage_keys(spark)}
        t0 = time.time()
        n = len(fn(spark, sf_dir).collect())
        wall = time.time() - t0
        m = bench._stage_metrics_delta(spark, before)
        m["wall_s"] = round(wall, 2)
        m["rows"] = n
        print(json.dumps(m, sort_keys=True))
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
