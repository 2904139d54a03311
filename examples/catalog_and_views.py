"""CatalogExample.scala + ViewsExample.scala: register graphs in the
session catalog, define a parameterized view, and query through it."""
from pyspark.sql import SparkSession

from cypher_for_apache_flink_spark.session import CypherSession
from cypher_for_apache_flink_spark.sources.create import graph_from_create


def main(spark: SparkSession):
    g = graph_from_create(
        spark, 'CREATE (:P {name: "Alice", age: 42}), '
               '(:P {name: "Bob", age: 23}), (:P {name: "Carol", age: 55})')
    s = CypherSession.for_graph(g)
    s.register("people", g)
    s.cypher("CATALOG CREATE VIEW adults($g) { "
             "FROM GRAPH $g MATCH (p:P) WHERE p.age >= 40 "
             "CONSTRUCT CLONE p RETURN GRAPH }")
    return s.cypher("FROM GRAPH adults(people) MATCH (p:P) "
                    "RETURN p.name AS name ORDER BY name").df


if __name__ == "__main__":
    from examples._run import run
    run(main)
