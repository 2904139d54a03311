"""Round-12 equivalence gate for the HOF let-binding rewrite.

``word_shingles`` / ``rolling_fingerprints`` / ``duplicate_spans``'s window
builder / ``minhash_from_shingles`` historically embedded the tokens()
subtree (regex split + filter) inside their transform lambdas, which Spark
re-evaluates once PER ARRAY ELEMENT.  Round 12 binds the subtree once per
row via ``util.bind_once``.  These tests pin result equivalence against
(a) the r11 expressions copied verbatim, and (b) a pure-Python reference,
over edge-case texts and a real corpus slice — the shingle/token/minhash
definitions are the oracle contract and must not move.
"""

import hashlib
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.dedup import (
    minhash_from_shingles, word_shingles)
from cypher_for_apache_flink_spark.functions.text import (
    rolling_fingerprints, tokens)

EDGE_TEXTS = [
    None,
    "",
    "   ",
    "\t\n ",
    "one",
    "one two",
    "one two three",
    "one two three four",
    "a a a a a a",                      # duplicate shingles
    "The  QUICK\tbrown\n\nfox  jumps",  # mixed whitespace + case
    "x " * 200,                          # long, fully repetitive
    "word" + " word" * 50,
]


@pytest.fixture(scope="module")
def edge_df(spark):
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(EDGE_TEXTS)]
    return spark.createDataFrame(
        rows, schema="doc_id bigint, text string")


def _old_word_shingles(text, n=3):
    """The pre-round-12 expression, verbatim (tokens subtree in-lambda)."""
    toks = tokens(text)
    cnt = F.size(toks) - (n - 1)
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n))))
    return F.when(cnt > 0, grams).otherwise(F.array().cast("array<string>"))


def _old_rolling_fingerprints(text, window=4):
    """The pre-round-12 expression, verbatim."""
    toks = tokens(text)
    n = F.size(toks)
    spans = F.transform(
        F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, window))))
    return F.slice(F.array_sort(spans), 1, 4)


def _py_tokens(text):
    if text is None:
        return None
    return [t for t in re.split(r"\s+", text.lower()) if t != ""]


def _py_word_shingles(text, n=3):
    toks = _py_tokens(text)
    if toks is None or len(toks) < n:
        return []
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        g = " ".join(toks[i:i + n])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _py_rolling_fingerprints(text, window=4):
    toks = _py_tokens(text)
    if toks is None:
        toks = []
    spans = []
    for i in range(max(len(toks) - window + 1, 1)):
        s = " ".join(toks[i:i + window])
        spans.append(hashlib.md5(s.encode()).hexdigest())
    return sorted(spans)[:4]


def test_word_shingles_matches_old_expression(edge_df):
    for n in (2, 3, 5):
        bad = edge_df.select(
            word_shingles(F.col("text"), n).alias("new"),
            _old_word_shingles(F.col("text"), n).alias("old"),
        ).where(
            (F.col("new").isNull() != F.col("old").isNull())
            | ~(F.col("new") == F.col("old"))).count()
        assert bad == 0, f"word_shingles(n={n}) diverged from r11 form"


def test_word_shingles_matches_python_reference(edge_df):
    rows = edge_df.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("s")).collect()
    got = {r["doc_id"]: r["s"] for r in rows}
    for i, t in enumerate(EDGE_TEXTS):
        assert got[i] == _py_word_shingles(t, 3), f"text #{i}: {t!r}"


def test_rolling_fingerprints_matches_old_expression(edge_df):
    bad = edge_df.select(
        rolling_fingerprints(F.col("text"), 4).alias("new"),
        _old_rolling_fingerprints(F.col("text"), 4).alias("old"),
    ).where(
        (F.col("new").isNull() != F.col("old").isNull())
        | ~(F.col("new") == F.col("old"))).count()
    assert bad == 0


def test_rolling_fingerprints_matches_python_reference(edge_df):
    rows = edge_df.select(
        "doc_id", rolling_fingerprints(F.col("text"), 4).alias("s")).collect()
    got = {r["doc_id"]: r["s"] for r in rows}
    for i, t in enumerate(EDGE_TEXTS):
        assert got[i] == _py_rolling_fingerprints(t, 4), f"text #{i}: {t!r}"


def test_minhash_from_shingles_matches_unbound_form(edge_df):
    """minhash over an inline shingle SUBTREE (the worst case the binding
    targets) must equal the naive per-seed re-evaluation."""
    sh = word_shingles(F.col("text"), 3)

    def seed_hash(i):
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    old = F.array(*[F.array_min(F.transform(sh, seed_hash(i)))
                    for i in range(8)])
    bad = edge_df.select(
        minhash_from_shingles(sh, 8).alias("new"), old.alias("old"),
    ).where(
        (F.col("new").isNull() != F.col("old").isNull())
        | ~(F.col("new") == F.col("old"))).count()
    assert bad == 0


def test_duplicate_spans_window_builder_matches_old(spark, edge_df):
    """The exploded (pos, h) window rows must be identical to the r11 form."""
    from cypher_for_apache_flink_spark.functions.dedup import _span_windows
    n = 3
    toks = tokens(F.col("text"))
    cnt = F.size(toks) - (n - 1)
    old_wins = F.transform(
        F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
        lambda i: F.struct(
            (i - 1).cast("long").alias("pos"),
            F.md5(F.concat_ws(" ", F.slice(toks, i, n))).alias("h")))
    old_wins = F.when(cnt > 0, old_wins).otherwise(
        F.array().cast("array<struct<pos:bigint,h:string>>"))
    bad = edge_df.select(
        _span_windows(F.col("text"), n).alias("new"),
        old_wins.alias("old"),
    ).where(
        (F.col("new").isNull() != F.col("old").isNull())
        | ~(F.col("new") == F.col("old"))).count()
    assert bad == 0
