"""Per-job wall-time breakdown for one declared query: run it once warm
and dump every Spark job the action tree submitted, with duration, task
count, and the job group/description — the measure-first step of the
round-11 optimization pass (guide §1).

Usage: python tools/job_profile.py <query> [sf_dir] [--runs N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def _jobs(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    lst = store.jobsList(None)
    out = []
    for i in range(lst.size()):
        j = lst.apply(i)
        sub = j.submissionTime()
        end = j.completionTime()
        t0 = sub.get().getTime() if sub.isDefined() else None
        t1 = end.get().getTime() if end.isDefined() else None
        out.append({
            "id": j.jobId(),
            "dur_ms": (t1 - t0) if t0 and t1 else None,
            "tasks": j.numCompletedTasks(),
            "stages": j.stageIds().size(),
            "desc": (j.description().get()
                     if j.description().isDefined() else "")[:90],
        })
    return sorted(out, key=lambda d: d["id"])


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
             .config("spark.ui.retainedJobs", "3000")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    fn = qs[query]

    # warm the JVM + parquet footers, as the bench does
    qs["scan_nodes"](spark, sf_dir).collect()
    t0 = time.time()
    fn(spark, sf_dir).collect()
    print(f"# warm run 0 (discarded): {time.time() - t0:.2f}s",
          file=sys.stderr)

    for r in range(runs):
        before_ids = {j["id"] for j in _jobs(spark)}
        t0 = time.time()
        n = len(fn(spark, sf_dir).collect())
        wall = time.time() - t0
        jobs = [j for j in _jobs(spark) if j["id"] not in before_ids]
        tot_ms = sum(j["dur_ms"] or 0 for j in jobs)
        print(f"\n== run {r + 1}: {wall:.2f}s wall, {n} rows, "
              f"{len(jobs)} jobs ({tot_ms / 1000:.2f}s summed job time)")
        for j in jobs:
            d = (j["dur_ms"] or 0) / 1000
            print(f"  job {j['id']:>5} {d:7.3f}s  tasks={j['tasks']:>5} "
                  f"stages={j['stages']:>2}  {j['desc']}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
