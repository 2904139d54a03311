"""CypherSQLRoundtripExample.scala: SQL results drive a Cypher query
(driving table), and the Cypher result drops back into spark.sql."""
from pyspark.sql import SparkSession

from cypher_for_apache_flink_spark.session import CypherSession
from cypher_for_apache_flink_spark.sources.tpch import tpch_graph


def main(spark: SparkSession):
    g = tpch_graph(spark, "/root/testdata/sf0.001")
    s = CypherSession.for_graph(g)
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet") \
        .createOrReplaceTempView("nation_sql")
    picks = spark.sql(
        "SELECT n_name AS nname FROM nation_sql WHERE n_nationkey < 5")
    out = s.cypher(
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) "
        "WHERE n.n_name = nname "
        "RETURN n.n_name AS nation, count(*) AS customers",
        driving_table=picks).df
    out.createOrReplaceTempView("cypher_out")
    return spark.sql(
        "SELECT nation, customers FROM cypher_out ORDER BY nation")


if __name__ == "__main__":
    from examples._run import run
    run(main)
