"""Round-12 decomposition of node_similarity's executor CPU by phase,
each phase evaluated in isolation with the noop sink (guide §1.4) and a
fresh cache, printing the stage-metrics delta.

Usage: python tools/probes/nodesim_phases.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .config("spark.ui.retainedStages", "3000")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as entry
    from cypher_for_apache_flink_spark.functions.dedup import word_shingles
    from cypher_for_apache_flink_spark.functions.graph_algos import (
        _mirror, _normalize_undirected)

    docs = entry._docs(spark, sf_dir)

    def phase(label, df):
        spark.catalog.clearCache()
        df.write.format("noop").mode("overwrite").save()  # warm
        spark.catalog.clearCache()
        before = {k for k, _ in bench._stage_keys(spark)}
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        m = bench._stage_metrics_delta(spark, before)
        print(f"{label:<28} wall={wall:6.2f}s cpu={m['executor_cpu_ms']/1e3:7.1f}s "
              f"tasks={m['n_tasks']:4d} shW={m['shuffle_write_bytes']/1e6:7.1f}MB "
              f"in={m['input_bytes']/1e6:7.1f}MB")

    edges = docs.select(
        F.concat(F.lit("D"), F.col("doc_id").cast("string")).alias("src"),
        F.explode(word_shingles(F.col("text"), 3)).alias("dst"))
    und = _normalize_undirected(edges, "src", "dst")
    adj = _mirror(und).select(F.col("u").alias("node"),
                              F.col("v").alias("nbr"))

    phase("A docs scan only", docs)
    phase("B edges (shingle+explode)", edges)
    phase("C und (distinct)", und)
    phase("D adj (mirror)", adj)
    phase("E deg (groupBy)", adj.groupBy("node").agg(
        F.count(F.lit(1)).alias("deg")))
    # full query for reference
    spark.catalog.clearCache()
    q = entry.queries()["node_similarity"]
    q(spark, sf_dir).collect()
    spark.catalog.clearCache()
    before = {k for k, _ in bench._stage_keys(spark)}
    t0 = time.time()
    q(spark, sf_dir).collect()
    m = bench._stage_metrics_delta(spark, before)
    print(f"{'F full node_similarity':<28} wall={time.time()-t0:6.2f}s "
          f"cpu={m['executor_cpu_ms']/1e3:7.1f}s tasks={m['n_tasks']:4d} "
          f"shW={m['shuffle_write_bytes']/1e6:7.1f}MB "
          f"in={m['input_bytes']/1e6:7.1f}MB")
    spark.stop()


if __name__ == "__main__":
    main()
