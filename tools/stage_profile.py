"""Per-STAGE physical metrics for one declared query: run it warm once,
then dump every stage the action tree ran, sorted by executor CPU — the
attribution step between job_profile.py (per-job walls) and
query_metrics.py (query totals).

Usage: python tools/stage_profile.py <query> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main():
    query = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
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

    before = {k for k, _ in bench._stage_keys(spark)}
    t0 = time.time()
    n = len(fn(spark, sf_dir).collect())
    wall = time.time() - t0
    print(f"== {query}: {wall:.2f}s wall, {n} rows")
    rows = []
    for key, sd in bench._stage_keys(spark):
        if key in before:
            continue
        rows.append((
            sd.executorCpuTime() // 1_000_000, sd.executorRunTime(),
            sd.numCompleteTasks(), sd.shuffleWriteBytes(),
            sd.shuffleReadBytes(), sd.inputBytes(), sd.stageId(),
            (sd.description().get() if sd.description().isDefined()
             else sd.name())[:110]))
    rows.sort(reverse=True)
    print(f"{'cpu_ms':>8} {'run_ms':>8} {'tasks':>5} {'shW_MB':>7} "
          f"{'shR_MB':>7} {'in_MB':>7} {'stage':>5}  name")
    for cpu, run, tk, sw, sr, inp, sid, name in rows:
        print(f"{cpu:>8} {run:>8} {tk:>5} {sw/1e6:>7.1f} {sr/1e6:>7.1f} "
              f"{inp/1e6:>7.1f} {sid:>5}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
