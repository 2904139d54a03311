"""CaseClassExample.scala: build a graph from typed Python records
(dataclasses stand in for Scala case classes)."""
from dataclasses import dataclass

from pyspark.sql import SparkSession

from cypher_for_apache_flink_spark.sources.rows import graph_from_rows


@dataclass
class Person:
    id: int
    name: str


@dataclass
class Knows:
    id: int
    source: int
    target: int
    since: int


def main(spark: SparkSession):
    g = graph_from_rows(
        spark,
        nodes={"Person": [Person(0, "Alice"), Person(1, "Bob")]},
        rels={"KNOWS": [Knows(10, 0, 1, 2018)]})
    return g.cypher("MATCH (a)-[k:KNOWS]->(b) "
                    "RETURN a.name AS a, k.since AS since, b.name AS b").df


if __name__ == "__main__":
    from examples._run import run
    run(main)
