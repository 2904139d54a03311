"""Every reference-example port runs end-to-end and returns rows."""

import importlib

import pytest

EXAMPLES = [
    ("dataframe_input", 1),
    ("dataframe_output", 1),
    ("case_class", 1),
    ("catalog_and_views", 2),
    ("multiple_graph", 2),
    ("cypher_sql_roundtrip", 5),
    ("graphx_pagerank", 5),
    ("recommendation", 1),
    ("update_construct", 2),
    ("datasource_fs", 1),
    ("incremental_dedup", 1),
    ("embedding_corpus", 1),
    ("feature_pipeline", 1),
]


@pytest.mark.parametrize("name, min_rows", EXAMPLES, ids=[n for n, _ in EXAMPLES])
def test_example_runs(spark, name, min_rows):
    mod = importlib.import_module(f"examples.{name}")
    rows = mod.main(spark).collect()
    assert len(rows) >= min_rows
