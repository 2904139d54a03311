"""Shared runner: build a local session and show the example's result."""
from pyspark.sql import SparkSession


def run(main):
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .appName("cfas-example").getOrCreate())
    main(spark).show(20, truncate=False)
