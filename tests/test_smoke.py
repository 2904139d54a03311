"""M0 end-to-end slice (SURVEY §7.2): scan/filter/project/sort/limit."""

import pytest

from cypher_for_apache_flink_spark import CypherSession, PropertyGraph


@pytest.fixture(scope="module")
def social(spark):
    nodes = {
        frozenset({"Person"}): spark.createDataFrame(
            [(1, "Alice", 42), (2, "Bob", 23), (3, "Carol", 55),
             (4, "Dan", None), (5, "Eve", 31)],
            "id long, name string, age long"),
        frozenset({"Person", "Admin"}): spark.createDataFrame(
            [(6, "Zed", 60, 2020), (7, "Yara", 28, 2021)],
            "id long, name string, age long, since long"),
    }
    rels = {
        "KNOWS": spark.createDataFrame(
            [(100, 1, 2, 1999), (101, 2, 3, 2005), (102, 3, 1, 2010),
             (103, 1, 5, None), (104, 6, 1, 2018), (105, 5, 4, 2022)],
            "id long, source long, target long, since long"),
        "LIKES": spark.createDataFrame(
            [(200, 2, 1, None), (201, 4, 5, None)],
            "id long, source long, target long, weight double"),
    }
    return PropertyGraph(nodes, rels, name="social")


def rows(result):
    return [tuple(r) for r in result.collect()]


def test_scan_filter_project_sort_limit(social):
    res = social.cypher(
        "MATCH (n:Person) WHERE n.age > 30 "
        "RETURN n.name AS name, n.age AS age ORDER BY name LIMIT 5")
    assert rows(res) == [("Alice", 42), ("Carol", 55), ("Eve", 31), ("Zed", 60)]


def test_multi_label_scan(social):
    res = social.cypher("MATCH (n:Admin) RETURN n.name AS name ORDER BY name")
    assert rows(res) == [("Yara",), ("Zed",)]


def test_label_predicate_pushdown(social):
    res = social.cypher(
        "MATCH (n) WHERE n:Admin AND n.age < 30 RETURN n.name AS name")
    assert rows(res) == [("Yara",)]


def test_expand(social):
    res = social.cypher(
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) "
        "RETURN a.name AS a, b.name AS b ORDER BY a, b")
    assert rows(res) == [("Alice", "Bob"), ("Alice", "Eve"), ("Bob", "Carol"),
                         ("Carol", "Alice"), ("Eve", "Dan"), ("Zed", "Alice")]


def test_two_hop(social):
    res = social.cypher(
        "MATCH (a)-[:KNOWS]->(b)-[:KNOWS]->(c) "
        "RETURN a.name AS a, c.name AS c ORDER BY a, c")
    assert rows(res) == [("Alice", "Carol"), ("Alice", "Dan"), ("Bob", "Alice"),
                         ("Carol", "Bob"), ("Carol", "Eve"), ("Zed", "Bob"),
                         ("Zed", "Eve")]


def test_undirected(social):
    res = social.cypher(
        "MATCH (a {name: 'Bob'})-[:KNOWS]-(b) RETURN b.name AS b ORDER BY b")
    assert rows(res) == [("Alice",), ("Carol",)]


def test_incoming(social):
    res = social.cypher(
        "MATCH (a)<-[:KNOWS]-(b) WHERE a.name = 'Alice' "
        "RETURN b.name AS b ORDER BY b")
    assert rows(res) == [("Carol",), ("Zed",)]


def test_aggregation(social):
    res = social.cypher(
        "MATCH (a:Person)-[:KNOWS]->(b) "
        "RETURN a.name AS name, count(*) AS degree ORDER BY degree DESC, name")
    assert rows(res) == [("Alice", 2), ("Bob", 1), ("Carol", 1),
                         ("Eve", 1), ("Zed", 1)]


def test_global_aggregation(social):
    res = social.cypher("MATCH (n:Person) RETURN count(*) AS n")
    assert rows(res) == [(7,)]


def test_with_pipeline(social):
    res = social.cypher(
        "MATCH (a:Person)-[:KNOWS]->(b) WITH a, count(*) AS degree "
        "WHERE degree >= 2 RETURN a.name AS name, degree")
    assert rows(res) == [("Alice", 2)]


def test_optional_match(social):
    res = social.cypher(
        "MATCH (a:Person) OPTIONAL MATCH (a)-[r:LIKES]->(b) "
        "RETURN a.name AS name, b.name AS liked ORDER BY name")
    got = rows(res)
    assert ("Bob", "Alice") in got and ("Dan", "Eve") in got
    assert ("Alice", None) in got and ("Carol", None) in got
    assert len(got) == 7


def test_unwind(social):
    res = social.cypher("UNWIND [1, 2, 3] AS x RETURN x * 2 AS y ORDER BY y")
    assert rows(res) == [(2,), (4,), (6,)]


def test_union(social):
    res = social.cypher(
        "MATCH (n:Admin) RETURN n.name AS name "
        "UNION ALL MATCH (n:Person) WHERE n.age > 50 RETURN n.name AS name")
    assert sorted(rows(res)) == [("Carol",), ("Yara",), ("Zed",), ("Zed",)]


def test_var_length(social):
    res = social.cypher(
        "MATCH (a {name: 'Alice'})-[rs:KNOWS*1..2]->(b) "
        "RETURN b.name AS b, size(rs) AS hops ORDER BY hops, b")
    assert rows(res) == [("Bob", 1), ("Eve", 1), ("Carol", 2), ("Dan", 2)]


def test_exists_pattern(social):
    res = social.cypher(
        "MATCH (a:Person) WHERE (a)-[:LIKES]->() "
        "RETURN a.name AS name ORDER BY name")
    assert rows(res) == [("Bob",), ("Dan",)]


def test_not_exists_pattern(social):
    res = social.cypher(
        "MATCH (a:Person) WHERE NOT (a)-[:KNOWS]->() "
        "RETURN a.name AS name ORDER BY name")
    assert rows(res) == [("Dan",), ("Yara",)]


def test_expressions(social):
    res = social.cypher(
        "MATCH (n {name: 'Alice'}) "
        "RETURN toUpper(n.name) AS up, n.age / 2 AS half, "
        "       CASE WHEN n.age > 40 THEN 'old' ELSE 'young' END AS bucket")
    assert rows(res) == [("ALICE", 21, "old")]


def test_labels_function(social):
    res = social.cypher(
        "MATCH (n) WHERE n.name = 'Zed' RETURN labels(n) AS ls")
    assert rows(res) == [(["Admin", "Person"],)]


def test_distinct(social):
    res = social.cypher(
        "MATCH (a)-[:KNOWS]->(b) RETURN DISTINCT a.name IS NOT NULL AS x")
    assert rows(res) == [(True,)]
