"""Typed-row ingestion + Neo4j bulk CSV sink tests."""

import dataclasses
import glob
import shutil

from cypher_for_apache_flink_spark.sources.rows import (
    graph_from_rows,
    write_neo4j_bulk_csv,
)

TMP = "/root/repo/.tmp_test_rows"


@dataclasses.dataclass
class Person:
    id: int
    name: str
    age: int


@dataclasses.dataclass
class Knows:
    id: int
    source: int
    target: int
    since: int


def test_graph_from_dataclass_rows(spark):
    g = graph_from_rows(
        spark,
        nodes={"Person": [Person(1, "Alice", 42), Person(2, "Bob", 23)]},
        rels={"KNOWS": [Knows(100, 1, 2, 1999)]})
    res = g.cypher("MATCH (a:Person)-[k:KNOWS]->(b:Person) "
                   "RETURN a.name AS a, b.name AS b, k.since AS y")
    assert [tuple(r) for r in res.collect()] == [("Alice", "Bob", 1999)]


def test_graph_from_dict_rows(spark):
    g = graph_from_rows(
        spark,
        nodes={("Person", "Admin"): [
            {"id": 1, "name": "Zed"}, {"id": 2, "name": "Yara"}]})
    res = g.cypher("MATCH (p:Admin) RETURN count(*) AS n")
    assert res.collect()[0]["n"] == 2


def test_neo4j_bulk_csv_sink(spark):
    shutil.rmtree(TMP, ignore_errors=True)
    try:
        g = graph_from_rows(
            spark,
            nodes={"Person": [Person(1, "Alice", 42)]},
            rels={"KNOWS": [Knows(100, 1, 1, 2000)]})
        write_neo4j_bulk_csv(g, TMP)
        node_csv = glob.glob(f"{TMP}/nodes_Person/part-*.csv")
        rel_csv = glob.glob(f"{TMP}/rels_KNOWS/part-*.csv")
        assert node_csv and rel_csv
        nheader = open(node_csv[0]).readline().strip()
        rheader = open(rel_csv[0]).readline().strip()
        assert nheader == "id:ID,name,age,:LABEL"
        assert rheader == ":START_ID,:END_ID,since,:TYPE"
    finally:
        shutil.rmtree(TMP, ignore_errors=True)


def test_to_maps_renders_full_entities(spark):
    """records.toMaps analogue: RETURN n yields {id, labels, properties}."""
    from cypher_for_apache_flink_spark.sources.create import graph_from_create
    g = graph_from_create(
        spark, 'CREATE (a:Person:Admin {name: "Alice", age: 42})'
               '-[:KNOWS {since: 2019}]->(b:Person {name: "Bob"})')
    maps = g.cypher("MATCH (a)-[r:KNOWS]->(b) RETURN a, r, b.name AS bn").to_maps()
    assert len(maps) == 1
    m = maps[0]
    assert m["a"]["labels"] == {"Person", "Admin"}
    assert m["a"]["properties"] == {"name": "Alice", "age": 42}
    assert m["r"]["type"] == "KNOWS"
    assert m["r"]["properties"] == {"since": 2019}
    assert m["r"]["source"] == m["a"]["id"]
    assert m["bn"] == "Bob"
