"""Driving-table embedding (DrivingTableTests analogue) + edge-list source."""

import shutil

import pytest

from cypher_for_apache_flink_spark import CypherSession, PropertyGraph
from cypher_for_apache_flink_spark.sources.edgelist import read_edge_list

TMP = "/root/repo/.tmp_test_edgelist"


@pytest.fixture(scope="module")
def social(spark):
    nodes = {
        frozenset({"Person"}): spark.createDataFrame(
            [(1, "Alice", 42), (2, "Bob", 23), (3, "Carol", 55)],
            "id long, name string, age long"),
    }
    rels = {
        "KNOWS": spark.createDataFrame(
            [(100, 1, 2), (101, 2, 3)], "id long, source long, target long"),
    }
    return PropertyGraph(nodes, rels, name="social")


def test_driving_table_filters_match(spark, social):
    session = CypherSession.for_graph(social)
    driving = spark.createDataFrame([("Alice",), ("Carol",)], "wanted string")
    res = session.cypher(
        "MATCH (p:Person) WHERE p.name = wanted "
        "RETURN p.name AS name, p.age AS age ORDER BY name",
        graph=social, driving_table=driving)
    assert [tuple(r) for r in res.collect()] == [("Alice", 42), ("Carol", 55)]


def test_driving_table_carries_columns(spark, social):
    session = CypherSession.for_graph(social)
    driving = spark.createDataFrame([(1, "x"), (2, "y")], "pid long, tag string")
    res = session.cypher(
        "MATCH (p:Person) WHERE id(p) = pid "
        "RETURN tag, p.name AS name ORDER BY tag",
        graph=social, driving_table=driving)
    assert [tuple(r) for r in res.collect()] == [("x", "Alice"), ("y", "Bob")]


def test_edge_list_source(spark):
    shutil.rmtree(TMP, ignore_errors=True)
    try:
        df = spark.createDataFrame(
            [("# comment",), ("1 2",), ("2 3",), ("3 1",), ("3 4",)],
            "value string")
        df.coalesce(1).write.text(TMP)
        g = read_edge_list(spark, TMP)
        assert g.cypher("MATCH (v:V) RETURN count(*) AS n").collect()[0]["n"] == 4
        res = g.cypher(
            "MATCH (a:V)-[:REL]->(b:V)-[:REL]->(c:V) RETURN count(*) AS n")
        # chains: 1-2-3, 2-3-1, 2-3-4, 3-1-2
        assert res.collect()[0]["n"] == 4
    finally:
        shutil.rmtree(TMP, ignore_errors=True)
