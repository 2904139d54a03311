"""Corpus-curation pipeline: each stage's removals are observable."""

from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.pipeline import curate_corpus


def test_curate_removes_each_category(spark):
    good = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, good + " one"),
        (2, good + " one"),              # exact dup of 1 -> dropped
        (3, good + " two"),              # near dup of 1 -> dropped (higher id)
        (4, "!!! ??? !!! ??? !!!"),      # punctuation garbage -> quality drop
        (5, "completely different text about spark catalyst optimizer plans "
            "and distributed shuffle execution strategies in modern engines"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  curate_corpus(docs, quality_min=0.4,
                                jaccard_threshold=0.3).collect())
    assert kept == [1, 5]


def test_curate_keeps_all_distinct_quality_docs(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} with plenty of reasonable english words "
             f"to pass the quality bar easily every single time variant {i*7}")
         for i in range(10)],
        "doc_id long, text string")
    kept = curate_corpus(docs, quality_min=0.4, jaccard_threshold=0.9)
    assert kept.count() == 10
    # survivors keep their original columns
    assert set(kept.columns) == {"doc_id", "text"}


def test_curate_transitive_removes_whole_cluster(spark):
    from cypher_for_apache_flink_spark.functions.pipeline import curate_corpus
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairwise = {r["doc_id"] for r in
                curate_corpus(docs).select("doc_id").collect()}
    transitive = {r["doc_id"] for r in
                  curate_corpus(docs, transitive=True)
                  .select("doc_id").collect()}
    # transitive policy can only remove more, never fewer
    assert transitive <= pairwise
