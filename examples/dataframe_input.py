"""DataFrameInputExample.scala / CustomDataFrameInputExample.scala: build a
property graph straight from DataFrames and query it with Cypher."""
from pyspark.sql import SparkSession

from cypher_for_apache_flink_spark import PropertyGraph


def main(spark: SparkSession):
    nodes = {
        frozenset({"Person"}): spark.createDataFrame(
            [(0, "Alice", 42), (1, "Bob", 23)],
            "id long, name string, age long"),
    }
    rels = {
        "FRIEND_OF": spark.createDataFrame(
            [(10, 0, 1)], "id long, source long, target long"),
    }
    g = PropertyGraph(nodes, rels, name="social")
    return g.cypher(
        "MATCH (a:Person)-[:FRIEND_OF]->(b:Person) "
        "RETURN a.name AS a, b.name AS b").df


if __name__ == "__main__":
    from examples._run import run
    run(main)
