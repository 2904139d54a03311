"""Offline tests for the Neo4j source's pure query builders
(Neo4jPropertyGraphDataSource.scala:108-140 / ElementReader flat queries)."""
import pytest

from cypher_for_apache_flink_spark.sources.neo4j import (
    exact_label_query, rel_type_query, schema_queries, _require_driver)


def test_exact_label_query_shape():
    q = exact_label_query({"Person", "Admin"}, {"name": "string", "age": "bigint"})
    assert q.startswith("MATCH (n:`Admin`:`Person`) WHERE size(labels(n)) = 2")
    assert "id(n) AS id" in q
    assert "n.`age` AS `age`" in q and "n.`name` AS `name`" in q


def test_exact_label_query_id_range_and_escapes():
    q = exact_label_query({"P"}, {"id": "bigint"}, id_range=(0, 100))
    assert "id(n) >= 0 AND id(n) < 100" in q
    # a property literally named 'id' lands in the escaped physical column
    assert "n.`id` AS `prop__id`" in q


def test_rel_type_query_shape():
    q = rel_type_query("KNOWS", {"since": "bigint"})
    assert "MATCH (s)-[r:`KNOWS`]->(t)" in q
    assert "id(r) AS id" in q and "id(s) AS source" in q and "id(t) AS target" in q
    assert "r.`since` AS `since`" in q


def test_rel_type_query_reserved_props():
    q = rel_type_query("R", {"source": "bigint"}, id_range=(5, 9))
    assert "id(r) >= 5 AND id(r) < 9" in q
    assert "r.`source` AS `prop__source`" in q


def test_schema_queries_complete():
    qs = schema_queries()
    assert set(qs) == {"combos", "rel_types", "node_props", "rel_props",
                      "id_bounds"}


def test_driver_gate_raises_without_package():
    try:
        import neo4j  # noqa: F401
        pytest.skip("driver installed")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="bolt driver"):
        _require_driver()
