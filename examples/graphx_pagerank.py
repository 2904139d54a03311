"""GraphXPageRankExample.scala: Cypher projection -> PageRank -> ranks
rejoined to node properties.  The reference hops Cypher -> RDD -> GraphX;
here the whole loop is DataFrame-only (Catalyst-planned supersteps)."""
from pyspark.sql import SparkSession

from cypher_for_apache_flink_spark.functions.graph_algos import pagerank
from cypher_for_apache_flink_spark.session import CypherSession
from cypher_for_apache_flink_spark.sources.tpch import tpch_graph


def main(spark: SparkSession):
    g = tpch_graph(spark, "/root/testdata/sf0.001")
    edges = g.cypher(
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) "
        "RETURN id(c) AS src, id(n) AS dst").df
    ranks = pagerank(edges, iterations=5)
    s = CypherSession.for_graph(g)
    return s.cypher(
        "MATCH (n:Nation) WHERE id(n) = node "
        "RETURN n.n_name AS nation, round(rank, 6) AS rank "
        "ORDER BY rank DESC LIMIT 5",
        driving_table=ranks).df


if __name__ == "__main__":
    from examples._run import run
    run(main)
