"""BM25 retrieval (functions/text.py bm25_topk)."""

import math

import pytest

from cypher_for_apache_flink_spark.functions.text import bm25_topk


def _corpus(spark):
    rows = [
        (1, "spark hash join fast"),
        (2, "hash hash hash table"),
        (3, "sort merge join slow slow slow slow"),
        (4, "the quick brown fox"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def _bm25_py(rows, query, k1=1.2, b=0.75):
    docs = {i: t.lower().split() for i, t in rows}
    n = len(docs)
    total = sum(len(t) for t in docs.values())
    qts = sorted(set(query.lower().split()))
    df = {q: sum(1 for t in docs.values() if q in t) for q in qts}
    out = {}
    for i, toks in docs.items():
        s = 0.0
        for q in qts:
            tf = toks.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(toks) * n / total))
        if s > 0:
            out[i] = round(s, 6)
    return out


def test_bm25_hand_computed(spark):
    df, rows = _corpus(spark)
    got = {r.doc_id: r.score
           for r in bm25_topk(df, "hash join", k=10).collect()}
    assert got == _bm25_py(rows, "hash join")
    # ranking: doc 2 (tf=3 hash) and doc 1 (both terms) outrank doc 3
    order = [r.doc_id for r in bm25_topk(df, "hash join", k=10).collect()]
    assert set(order) == {1, 2, 3}
    assert order == sorted(order, key=lambda d: (-got[d], d))


def test_bm25_topk_truncates_and_breaks_ties_by_id(spark):
    df, _ = _corpus(spark)
    got = bm25_topk(df, "hash join", k=1).collect()
    assert len(got) == 1


def test_bm25_no_match_returns_empty(spark):
    df, _ = _corpus(spark)
    assert bm25_topk(df, "zebra", k=5).count() == 0
    with pytest.raises(ValueError, match="no tokens"):
        bm25_topk(df, "   ")


def test_bm25_deterministic_under_repartition(spark):
    df, _ = _corpus(spark)
    a = [tuple(r) for r in bm25_topk(df, "slow join hash", k=4).collect()]
    b = [tuple(r) for r in bm25_topk(df.repartition(5), "slow join hash",
                                     k=4).collect()]
    assert a == b


def test_bm25_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    words = ["hash", "join", "scan", "sort", "spark", "table", "fast",
             "slow", "agg", "row"]
    rows = [(i, " ".join(words[(i * j + j * j) % len(words)]
                         for j in range(5 + i % 7)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.doc_id, r.score)
           for r in bm25_topk(df, "hash join spark", k=8).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = [(i, float(s)) for i, s in con.execute(r"""
WITH tk AS (SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS t
    FROM d),
tot AS (SELECT count(*) AS n, sum(len(t)) AS total FROM tk),
terms AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM tk),
m AS (SELECT * FROM terms WHERE term IN ('hash', 'join', 'spark')),
tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
       FROM m GROUP BY doc_id, term),
dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM m GROUP BY term)
SELECT doc_id, round(sum(
    ln(1 + (tot.n - dfq.df + 0.5) / (dfq.df + 0.5))
    * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl * tot.n
                                      / tot.total))), 6) AS score
FROM tf JOIN dfq USING (term) CROSS JOIN tot
GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 8""").fetchall()]
    assert got == want


def test_bm25_plan_scans_corpus_once(spark):
    """Plan gate (round 10): document frequency is a window over the tf
    rows, so the corpus parquet/tokenize pipeline appears EXACTLY once —
    a second scan branch would double the dominant cost at 100 TB."""
    df, _ = _corpus(spark)
    plan = (bm25_topk(df, "hash join", k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") \
        + plan.count("FileScan") == 1
    assert "TakeOrderedAndProject" in plan
