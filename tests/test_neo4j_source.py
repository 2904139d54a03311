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


def test_merge_node_statement_shape():
    """Mirrors ElementWriter.mergeNodes (ElementWriter.scala:44-73): keys in
    the MERGE map, non-key properties as SETs, meta id stamped."""
    from cypher_for_apache_flink_spark.sources.neo4j import (
        META_PROP, merge_node_statement)

    stmt = merge_node_statement(
        {"Person"}, {"name"}, ["id", "name", "age"])
    assert "UNWIND $batch AS row" in stmt
    assert "MERGE (n:`Person` { `name`: row[1] })" in stmt
    assert f"SET n.`{META_PROP}` = row[0]" in stmt
    assert "SET n.`age` = row[2]" in stmt
    assert "SET n.`name`" not in stmt          # key never re-SET
    # meta label rides on the node
    stmt_ml = merge_node_statement({"Person"}, {"name"},
                                   ["id", "name"], meta_label="G")
    assert "MERGE (n:`G`:`Person`" in stmt_ml


def test_merge_rel_statement_shape():
    from cypher_for_apache_flink_spark.sources.neo4j import (
        META_PROP, merge_rel_statement)

    stmt = merge_rel_statement("KNOWS", set(),
                               ["id", "source", "target", "since"])
    assert f"MATCH (from {{`{META_PROP}`: row[1]}})" in stmt
    assert f"MATCH (to {{`{META_PROP}`: row[2]}})" in stmt
    assert "MERGE (from)-[rel:`KNOWS`]->(to)" in stmt
    assert "SET rel.`since` = row[3]" in stmt
    stmt_k = merge_rel_statement("KNOWS", {"since"},
                                 ["id", "source", "target", "since"])
    assert "MERGE (from)-[rel:`KNOWS` { `since`: row[3] }]->(to)" in stmt_k
    assert "SET rel.`since`" not in stmt_k


def test_merge_index_statements():
    from cypher_for_apache_flink_spark.sources.neo4j import (
        merge_index_statements)

    ddl = merge_index_statements({"Person": {"name"}}, meta_label="G")
    assert any("CONSTRAINT" in d and "NODE KEY" in d for d in ddl)
    assert any(":`G`" in d for d in ddl)


def test_merge_graph_requires_driver(spark):
    """Connected path is import-gated (no bolt driver in this container)."""
    import pytest as _pytest

    from cypher_for_apache_flink_spark import PropertyGraph
    from cypher_for_apache_flink_spark.sources.neo4j import merge_graph

    g = PropertyGraph({frozenset({"A"}): spark.createDataFrame(
        [(1, "x")], "id long, name string")}, {}, name="m")
    try:
        import neo4j  # noqa: F401
        _pytest.skip("driver present; connected merge needs a server")
    except ImportError:
        pass
    with _pytest.raises(ImportError, match="neo4j"):
        merge_graph(g, "bolt://localhost:7687", ("u", "p"),
                    node_keys={"A": {"name"}})
