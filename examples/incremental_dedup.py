"""Incremental ingestion dedup (beyond the reference's surface): persist
the corpus fingerprint index once, then dedup every new batch against it
with a dynamic-partition-pruned scan — no corpus rescans."""
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.dedup import (
    dedup_against_index, write_fingerprint_index)


def main(spark: SparkSession):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = tempfile.mkdtemp() + "/fp_index"
    write_fingerprint_index(docs.where(F.col("doc_id") < 300), path)
    batch = docs.where(F.col("doc_id") >= 250)      # overlaps the corpus
    fresh = dedup_against_index(spark, batch, path)
    return fresh.select("doc_id").orderBy("doc_id")


if __name__ == "__main__":
    from examples._run import run
    run(main)
