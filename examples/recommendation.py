"""RecommendationExample.scala / Customer360Example.scala flavor: random
walk with restart over the part co-purchase graph recommends parts
related to a seed order's basket."""
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.graph_algos import (
    personalized_pagerank,
)


def main(spark: SparkSession):
    sf = "/root/testdata/sf0.001"
    li = (spark.read.parquet(f"{sf}/lineitem.parquet")
          .select("l_orderkey", "l_partkey"))
    grp = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    ps = F.col("ps")
    pairs = F.flatten(F.transform(
        ps, lambda x, i: F.transform(
            F.slice(ps, i + 2, F.size(ps)),
            lambda y: F.struct(x.alias("src"), y.alias("dst")))))
    edges = (grp.select(F.explode(pairs).alias("p"))
             .select("p.src", "p.dst").dropDuplicates(["src", "dst"]))
    first = li.groupBy().agg(F.min("l_orderkey").alias("l_orderkey"))
    basket = (li.join(F.broadcast(first), "l_orderkey")
              .select(F.col("l_partkey").alias("node")))
    ranks = personalized_pagerank(edges, basket, iterations=5)
    # recommend: highest-rank parts OUTSIDE the seed basket
    return (ranks.join(basket, "node", "left_anti")
            .orderBy(F.col("rank").desc(), "node")
            .select("node", F.round("rank", 6).alias("rank")).limit(10))


if __name__ == "__main__":
    from examples._run import run
    run(main)
