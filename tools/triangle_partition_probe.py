"""Reproduce VERDICT r7 'Wrong #4': triangle_count wall time vs
spark.sql.shuffle.partitions at the sf1-spot scale (10x co-purchase
replication).  One fresh SparkSession per setting so the config applies
to every exchange; k_core runs as the load control.

Usage: python tools/triangle_partition_probe.py [parts ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def run(parts: int) -> dict:
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
    from cypher_for_apache_flink_spark.functions.graph_algos import (
        k_core, pagerank, triangle_count,
    )
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
    out = {"parts": parts, "n_edges": n_edges}
    t0 = time.time()
    tri = triangle_count(big).collect()[0][0]
    out["triangle_s"] = round(time.time() - t0, 2)
    out["n_triangles"] = tri
    t0 = time.time()
    k_core(big, k=4).count()
    out["k_core_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    pagerank(big, iterations=3).count()
    out["pagerank_s"] = round(time.time() - t0, 2)
    spark.stop()
    return out


if __name__ == "__main__":
    settings = [int(x) for x in sys.argv[1:]] or [32, 64, 200]
    results = [run(p) for p in settings]
    print(json.dumps(results))
