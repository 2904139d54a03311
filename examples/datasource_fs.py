"""DataSourceExample.scala: persist a graph to a filesystem graph
directory (parquet + schema sidecar) and load it back."""
import tempfile

from pyspark.sql import SparkSession

from cypher_for_apache_flink_spark.sources.create import graph_from_create
from cypher_for_apache_flink_spark.sources.fs import read_graph, write_graph


def main(spark: SparkSession):
    g = graph_from_create(
        spark, 'CREATE (a:P {name: "Alice"})-[:KNOWS]->(:P {name: "Bob"})')
    path = tempfile.mkdtemp() + "/graph"
    write_graph(g, path)
    g2 = read_graph(spark, path)
    return g2.cypher("MATCH (a:P)-[:KNOWS]->(b:P) "
                     "RETURN a.name AS a, b.name AS b").df


if __name__ == "__main__":
    from examples._run import run
    run(main)
