"""Repetition filters, PII scrubbing, and document chunking."""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.text import (
    chunk_documents, pii_scrub, repetition_profile)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# repetition_profile
# ---------------------------------------------------------------------------

def test_repetition_all_distinct(spark):
    df = _docs(spark, [(1, "alpha beta gamma delta")])
    r = repetition_profile(df).collect()[0]
    assert r.n_tokens == 4
    assert r.dup_token_frac == 0.0
    assert r.max_token_frac == 0.25
    assert r.dup_line_frac == 0.0


def test_repetition_degenerate_doc(spark):
    df = _docs(spark, [(1, "spam spam spam spam")])
    r = repetition_profile(df).collect()[0]
    assert r.dup_token_frac == 0.75          # 3 of 4 repeat an earlier token
    assert r.max_token_frac == 1.0
    # bigram "spam spam" occurs 3 times, len 9 -> 27 / 19 chars, capped? no:
    # coverage can exceed 1 for overlapping bigrams; just check it's high
    assert r.top_bigram_cover > 1.0


def test_repetition_bigram_coverage(spark):
    # "a b" occurs twice (len 3) in 11 chars -> 6/11
    df = _docs(spark, [(1, "a b c a b d")])
    r = repetition_profile(df).collect()[0]
    assert r.top_bigram_cover == pytest.approx(6 / 11, abs=1e-6)


def test_repetition_duplicate_lines(spark):
    df = _docs(spark, [(1, "foo bar\nbaz\nfoo bar\nqux")])
    r = repetition_profile(df).collect()[0]
    assert r.dup_line_frac == 0.25


def test_repetition_empty_doc(spark):
    df = _docs(spark, [(1, "")])
    r = repetition_profile(df).collect()[0]
    assert r.n_tokens == 0
    assert r.dup_token_frac == 0.0
    assert r.max_token_frac == 0.0
    assert r.top_bigram_cover == 0.0


# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------

def test_pii_email_ip_phone(spark):
    df = _docs(spark, [
        (1, "mail bob@example.com or 10.0.0.1 or +1 555-123-4567 done")])
    r = pii_scrub(df).collect()[0]
    assert r.n_email == 1 and r.n_ip == 1 and r.n_phone == 1
    assert r.text == "mail <EMAIL> or <IP> or <PHONE> done"


def test_pii_no_double_count(spark):
    # digits inside the email/IP must not recount as phone numbers
    df = _docs(spark, [(1, "x 1234567890@example.com 192.168.100.200 y")])
    r = pii_scrub(df).collect()[0]
    assert r.n_email == 1
    assert r.n_ip == 1
    assert r.n_phone == 0
    assert r.text == "x <EMAIL> <IP> y"


def test_pii_clean_text_unchanged(spark):
    df = _docs(spark, [(1, "no sensitive content here")])
    r = pii_scrub(df).collect()[0]
    assert (r.n_email, r.n_ip, r.n_phone) == (0, 0, 0)
    assert r.text == "no sensitive content here"


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------

def _toks(n):
    return " ".join(f"t{i}" for i in range(1, n + 1))


def test_chunk_exact_window(spark):
    # 16 tokens, size 16 -> exactly one chunk
    df = _docs(spark, [(1, _toks(16))])
    rows = chunk_documents(df, size=16, overlap=4).collect()
    assert len(rows) == 1
    assert rows[0].chunk_id == 0 and rows[0].n_chunk_tokens == 16


def test_chunk_overlap_and_tail(spark):
    # 20 tokens, size 16, overlap 4 (step 12): chunks at 1 and 13
    df = _docs(spark, [(1, _toks(20))])
    rows = sorted(chunk_documents(df, size=16, overlap=4).collect(),
                  key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in rows] == [0, 1]
    assert rows[0].chunk_text.split()[:2] == ["t1", "t2"]
    assert rows[1].chunk_text.split()[0] == "t13"
    assert rows[1].n_chunk_tokens == 8


def test_chunk_tokens_partition_with_overlap(spark):
    # every token appears in >= 1 chunk; consecutive chunks share `overlap`
    df = _docs(spark, [(1, _toks(50))])
    rows = sorted(chunk_documents(df, size=16, overlap=4).collect(),
                  key=lambda r: r.chunk_id)
    seen = [t for r in rows for t in r.chunk_text.split()]
    assert set(seen) == {f"t{i}" for i in range(1, 51)}
    for a, b in zip(rows, rows[1:]):
        assert a.chunk_text.split()[-4:] == b.chunk_text.split()[:4]


def test_chunk_empty_doc_yields_no_rows(spark):
    df = _docs(spark, [(1, ""), (2, "one two")])
    rows = chunk_documents(df, size=16, overlap=4).collect()
    assert {r.doc_id for r in rows} == {2}


def test_chunk_rejects_bad_overlap(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, overlap=4)


def test_chunk_no_shuffle_plan(spark):
    # chunking is a per-row fan-out: the physical plan must not exchange
    df = _docs(spark, [(1, _toks(30))])
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_word_shingles_short_docs_yield_empty(spark):
    # regression: sequence(1, 0) descends -> slice(toks, 0, n) used to throw
    from cypher_for_apache_flink_spark.functions.dedup import word_shingles
    df = _docs(spark, [(1, ""), (2, "a b"), (3, "a b c d")])
    got = {r.doc_id: r.s for r in
           df.select("doc_id",
                     word_shingles(F.col("text"), 3).alias("s")).collect()}
    assert got[1] == [] and got[2] == []
    assert got[3] == ["a b c", "b c d"]


def test_repetition_profile_no_shuffle_plan(spark):
    df = _docs(spark, [(1, _toks(30))])
    plan = (repetition_profile(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_pii_scrub_no_shuffle_plan(spark):
    df = _docs(spark, [(1, "a b c")])
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
