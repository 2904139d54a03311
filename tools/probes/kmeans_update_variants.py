"""Round-12 probe (VERDICT r11 #8): where does kmeans_embeddings' wall
go, and does a narrow posexplode update step beat the 64-column sums agg?

Variant A (shipped): per iteration, groupBy(cluster).agg(count, 64 sum
columns) + collect of wide rows.
Variant B: posexplode(q) -> groupBy(cluster, pos).agg(sum) + collect of
k*dims narrow rows.  Same integer sums -> identical centroids.

Usage: python tools/probes/kmeans_update_variants.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def run(spark, sf_dir, variant, iterations=3, k=8, scale=1000):
    from cypher_for_apache_flink_spark.functions.clustering import (
        _dist_array, _quantize)
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = df.select(F.col("vec_id").alias("id"),
                  _quantize(F.col("embedding"), scale).alias("q")).persist()
    seed_rows = q.orderBy("id").limit(k).collect()
    dims = len(seed_rows[0]["q"])
    centroids = [list(r["q"]) for r in seed_rows]

    def assign(frame):
        dists = _dist_array(F.col("q"), centroids)
        return frame.select(
            "id", "q", dists.alias("__d"),
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int").alias("cluster"))

    for _ in range(iterations):
        assigned = assign(q)
        if variant == "A":
            sums = (assigned.groupBy("cluster").agg(
                F.count(F.lit(1)).alias("__n"),
                *[F.sum(F.col("q")[i]).alias(f"__s{i}")
                  for i in range(dims)]))
            new = {int(r["cluster"]):
                   [int(r[f"__s{i}"]) // int(r["__n"]) for i in range(dims)]
                   for r in sums.collect()}
        else:
            sums = (assigned.select("cluster",
                                    F.posexplode("q").alias("pos", "x"))
                    .groupBy("cluster", "pos")
                    .agg(F.sum("x").alias("s"),
                         F.count(F.lit(1)).alias("n")))
            rows = sums.collect()
            new = {}
            for r in rows:
                new.setdefault(int(r["cluster"]), [0] * dims)
            for r in rows:
                new[int(r["cluster"])][int(r["pos"])] = \
                    int(r["s"]) // int(r["n"])
        centroids = [new.get(j, centroids[j]) for j in range(k)]
    final = assign(q).select(
        "id", "cluster", F.array_min(F.col("__d")).alias("sq_dist"))
    out = (final.groupBy("cluster")
           .agg(F.count(F.lit(1)).alias("size"),
                F.sum("sq_dist").alias("inertia"))
           .orderBy("cluster").collect())
    q.unpersist()
    return [tuple(r) for r in out], centroids


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import os
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    outA, cA = run(spark, sf_dir, "A")   # warm both paths once
    outB, cB = run(spark, sf_dir, "B")
    assert outA == outB, "summaries differ!"
    assert cA == cB, "centroids differ!"
    print("outputs identical:", outA[:2], "...")
    for v in ("A", "B", "A", "B"):
        t0 = time.time()
        run(spark, sf_dir, v)
        print(f"variant {v}: {time.time()-t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
