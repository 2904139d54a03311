"""Round-12 k_truss peak-memory probe at the 12M-edge regime (VERDICT r11
#5): one quarter-sample cell (3M edges) and one full-graph cell (12M
edges), same construction as bench.py's sf1 spot, recording the full
stage-metrics delta (peak_task_memory and spill included).

Usage: python tools/probes/ktruss_probe_r12.py [sf_dir] [out_json]
"""
import json
import os
import sys
import time
import warnings

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else \
        "tools/probes/ktruss_probe_r12.json"
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
    from cypher_for_apache_flink_spark.functions.graph_algos import k_truss

    base = entrymod._copurchase_edges(spark, sf_dir) \
        .dropDuplicates(["src", "dst"])
    shift = (base.agg(F.max(F.greatest("src", "dst"))).collect()[0][0]
             or 0) + 1
    big = base
    for i in range(1, 10):
        big = big.unionAll(base.select(
            (F.col("src") + i * shift).alias("src"),
            (F.col("dst") + i * shift).alias("dst")))
    big = big.repartition(int(cpus)).persist()
    n_edges = big.count()

    cells = {"n_edges": n_edges, "config": {
        "master": f"local[{cpus}]", "shuffle_partitions": int(cpus),
        "aqe": True, "driver_memory": "8g",
        "head": os.popen("git rev-parse --short HEAD").read().strip()}}

    def cell(label, df_fn):
        spark.sparkContext.setJobDescription(f"ktruss probe {label}")
        before = {k for k, _ in bench._stage_keys(spark)}
        t0 = time.time()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            n = df_fn().count()
        m = bench._stage_metrics_delta(spark, before)
        m["wall_s"] = round(time.time() - t0, 1)
        m["rows"] = n
        cells[label] = m
        spark.sparkContext.setJobDescription(None)
        print(f"{label}: wall={m['wall_s']}s rows={n} "
              f"peak={m['peak_task_memory']/2**30:.2f}GiB "
              f"spill={m['spill_bytes']} "
              f"shW={m['shuffle_write_bytes']/1e9:.2f}GB "
              f"cpu={m['executor_cpu_ms']/1e3:.0f}s", flush=True)

    q = big.where(
        F.md5(F.concat_ws("|", F.col("src"), F.col("dst"))) < "4")
    cell("quarter_3M", lambda: k_truss(q, k=5, rounds=1))
    cell("full_12M", lambda: k_truss(big, k=5, rounds=1))
    with open(out, "w") as f:
        json.dump(cells, f, indent=1, sort_keys=True)
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
