"""MultipleGraphExample.scala: CONSTRUCT a new graph from matches, union
graphs, and switch graph context mid-query."""
from pyspark.sql import SparkSession

from cypher_for_apache_flink_spark.session import CypherSession
from cypher_for_apache_flink_spark.sources.create import graph_from_create


def main(spark: SparkSession):
    social = graph_from_create(
        spark, 'CREATE (a:Person {name: "Alice"}), (b:Person {name: "Bob"}),'
               ' (a)-[:KNOWS]->(b)')
    purchases = graph_from_create(
        spark, 'CREATE (:Person {name: "Alice"})-[:BOUGHT]->'
               '(:Product {title: "graph book"})')
    s = CypherSession.for_graph(social)
    s.register("social", social)
    s.register("purchases", purchases)
    linked = s.cypher(
        "FROM GRAPH social MATCH (p:Person) "
        "CONSTRUCT CLONE p SET p:Customer RETURN GRAPH").graph
    return linked.cypher(
        "MATCH (c:Customer) RETURN c.name AS name ORDER BY name").df


if __name__ == "__main__":
    from examples._run import run
    run(main)
