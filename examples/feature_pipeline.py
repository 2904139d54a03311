"""End-to-end behavioral-feature pipeline over the event stream (round
10, beyond-reference — the reference has no temporal-alignment or
feature-engineering surface):

1. attribute every purchase to the user's most recent view within 30
   minutes (as-of join — the pandas merge_asof / kdb aj primitive),
2. resample each user's event values onto a dense 6-hour grid with
   forward gap fill,
3. compute trailing 2-hour activity sums at every event,
4. roll everything up to one feature row per user: purchases, attributed
   purchases, median-ish rolling activity, grid coverage.

Every stage is a DataFrame transform with one keyed exchange — the same
pipeline shape at 100 TB, and each primitive is independently
oracle-verified (asof_attribution / resample_fill_forward /
rolling_time_agg driver rows).
"""
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.asof import asof_join
from cypher_for_apache_flink_spark.functions.timeseries import (
    resample_fill_forward, rolling_time_agg)

SF_DIR = "/root/testdata/sf0.001"


def main(spark: SparkSession):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("user_id").alias("user"), "ts"))
    views = (ev.where(F.col("event_type") == "view")
             .select(F.col("user_id").alias("user"), "ts",
                     F.col("event_id").alias("view_id")))
    attributed = asof_join(purchases, views, on="user",
                           tolerance="30 minutes")
    attribution = (attributed.groupBy("user").agg(
        F.count(F.lit(1)).alias("purchases"),
        F.count("asof_view_id").alias("attributed")))

    grid = resample_fill_forward(ev, "user_id", "ts", "value",
                                 interval="6 hours", agg="avg")
    coverage = (grid.groupBy(F.col("key").alias("user")).agg(
        F.count(F.lit(1)).alias("grid_rows"),
        F.sum(F.col("is_gap").cast("int")).alias("gap_rows")))

    rolling = rolling_time_agg(ev, "user_id", "ts", "value",
                               window="2 hours", agg="sum")
    activity = (rolling.groupBy(F.col("key").alias("user")).agg(
        F.round(F.avg("rolling"), 3).alias("avg_2h_activity"),
        F.round(F.max("rolling"), 3).alias("peak_2h_activity")))

    return (coverage.join(activity, "user", "left")
            .join(attribution, "user", "left")
            .na.fill(0, ["purchases", "attributed"])
            .orderBy("user"))


if __name__ == "__main__":
    from examples._run import run
    run(main)
