"""UpdateExample.scala: the reference's read-only analogue of updates —
CONSTRUCT a new graph with SET properties/labels and COPY OF entities
instead of mutating in place."""
from pyspark.sql import SparkSession

from cypher_for_apache_flink_spark.session import CypherSession
from cypher_for_apache_flink_spark.sources.create import graph_from_create


def main(spark: SparkSession):
    g = graph_from_create(
        spark, 'CREATE (:P {name: "Alice"}), (:P {name: "Bob"})')
    s = CypherSession.for_graph(g)
    updated = s.cypher(
        "MATCH (p:P) CONSTRUCT NEW (c COPY OF p :Reviewed {checked: true}) "
        "RETURN GRAPH").graph
    return updated.cypher(
        "MATCH (p:P:Reviewed) RETURN p.name AS name, p.checked AS checked "
        "ORDER BY name").df


if __name__ == "__main__":
    from examples._run import run
    run(main)
