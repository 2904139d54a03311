"""DataFrameOutputExample.scala: a Cypher result IS a DataFrame — feed it
straight into DataFrame transformations."""
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.sources.create import graph_from_create


def main(spark: SparkSession):
    g = graph_from_create(
        spark, 'CREATE (:P {name: "Alice", age: 42}), '
               '(:P {name: "Bob", age: 23})')
    df = g.cypher("MATCH (p:P) RETURN p.name AS name, p.age AS age").df
    return df.where(F.col("age") > 30).select(F.upper("name").alias("name"))


if __name__ == "__main__":
    from examples._run import run
    run(main)
