"""Scalar-function sweep (FunctionTests / ExpressionTests analogue): every
function family from SURVEY §2.5 evaluated over a one-node graph."""

import math

import pytest

from cypher_for_apache_flink_spark import PropertyGraph


@pytest.fixture(scope="module")
def g(spark):
    nodes = {frozenset({"N"}): spark.createDataFrame(
        [(1, "Hello World", -2.7, 16, [3, 1, 2])],
        "id long, s string, f double, i long, l array<long>")}
    return PropertyGraph(nodes, {}, name="fn")


def row(g, expr_sql: str):
    res = g.cypher(f"MATCH (n:N) RETURN {expr_sql}")
    rows = res.collect()
    assert len(rows) == 1
    return rows[0]


def test_string_functions(g):
    r = row(g, "toUpper(n.s) AS up, toLower(n.s) AS lo, reverse(n.s) AS rv, "
               "trim('  x  ') AS t, lTrim('  x') AS lt, rTrim('x  ') AS rt, "
               "replace(n.s, 'World', 'there') AS rp, "
               "split(n.s, ' ') AS sp, left(n.s, 5) AS l5, right(n.s, 5) AS r5")
    assert r["up"] == "HELLO WORLD" and r["lo"] == "hello world"
    assert r["rv"] == "dlroW olleH"
    assert r["t"] == "x" and r["lt"] == "x" and r["rt"] == "x"
    assert r["rp"] == "Hello there"
    assert list(r["sp"]) == ["Hello", "World"]
    assert r["l5"] == "Hello" and r["r5"] == "World"


def test_math_functions(g):
    r = row(g, "abs(n.f) AS ab, ceil(n.f) AS ce, floor(n.f) AS fl, "
               "sign(n.f) AS sg, round(n.f, 1) AS rd, sqrt(n.i) AS sq, "
               "exp(0.0) AS ex, log(e()) AS lg, log10(100.0) AS l10, "
               "n.i % 5 AS md, 2 ^ 10 AS pw")
    assert r["ab"] == 2.7 and r["ce"] == -2 and r["fl"] == -3
    assert r["sg"] == -1 and r["rd"] == -2.7
    assert r["sq"] == 4.0 and r["ex"] == 1.0
    assert r["lg"] == pytest.approx(1.0) and r["l10"] == 2.0
    assert r["md"] == 1 and r["pw"] == 1024.0


def test_trig_functions(g):
    r = row(g, "round(sin(pi()/2), 6) AS s, round(cos(0.0), 6) AS c, "
               "round(tan(0.0), 6) AS t, round(atan2(1.0, 1.0), 6) AS a2, "
               "round(degrees(pi()), 6) AS dg, round(radians(180.0), 6) AS rd, "
               "round(haversin(pi()), 6) AS hv")
    assert r["s"] == 1.0 and r["c"] == 1.0 and r["t"] == 0.0
    assert r["a2"] == round(math.pi / 4, 6)
    assert r["dg"] == 180.0 and r["rd"] == round(math.pi, 6)
    assert r["hv"] == 1.0


def test_list_functions(g):
    r = row(g, "head(n.l) AS h, last(n.l) AS la, tail(n.l) AS tl, "
               "size(n.l) AS sz, range(2, 6, 2) AS rg, n.l[1] AS ix, "
               "n.l[-1] AS neg, n.l[0..2] AS sl")
    assert r["h"] == 3 and r["la"] == 2
    assert list(r["tl"]) == [1, 2] and r["sz"] == 3
    assert list(r["rg"]) == [2, 4, 6]
    assert r["ix"] == 1 and r["neg"] == 2
    assert list(r["sl"]) == [3, 1]


def test_list_comprehension_and_predicates(g):
    r = row(g, "[x IN n.l WHERE x > 1 | x * 10] AS comp, "
               "any(x IN n.l WHERE x = 3) AS a, "
               "all(x IN n.l WHERE x > 0) AS al, "
               "none(x IN n.l WHERE x > 5) AS no, "
               "single(x IN n.l WHERE x = 1) AS si, "
               "reduce(acc = 0, x IN n.l | acc + x) AS red")
    assert sorted(r["comp"]) == [20, 30]
    assert r["a"] is True and r["al"] is True
    assert r["no"] is True and r["si"] is True and r["red"] == 6


def test_casts_and_meta(g):
    r = row(g, "toString(n.i) AS ts, toInteger('42') AS ti, "
               "toFloat('2.5') AS tf, toBoolean('true') AS tb, "
               "toInteger('abc') AS bad, labels(n) AS lbl, keys(n) AS ks")
    assert r["ts"] == "16" and r["ti"] == 42 and r["tf"] == 2.5
    assert r["tb"] is True and r["bad"] is None
    assert list(r["lbl"]) == ["N"]
    assert list(r["ks"]) == ["f", "i", "l", "s"]


def test_case_forms(g):
    r = row(g, "CASE n.i WHEN 16 THEN 'hit' ELSE 'miss' END AS simple, "
               "CASE WHEN n.f < 0 THEN 'neg' WHEN n.f > 0 THEN 'pos' END AS searched")
    assert r["simple"] == "hit" and r["searched"] == "neg"


def test_string_size_and_regex(g):
    r = row(g, "size(n.s) AS n_chars, substring(n.s, 6) AS sub")
    assert r["n_chars"] == 11 and r["sub"] == "World"
    res = g.cypher("MATCH (n:N) WHERE n.s =~ 'Hello.*' RETURN count(*) AS c")
    assert res.collect()[0]["c"] == 1
    res = g.cypher("MATCH (n:N) WHERE n.s =~ 'World' RETURN count(*) AS c")
    assert res.collect()[0]["c"] == 0   # =~ must match the ENTIRE string


def test_top_ngrams_by_doc_freq(spark):
    from cypher_for_apache_flink_spark.functions.text import (
        top_ngrams_by_doc_freq,
    )
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "a b"), (4, "x y")],
        "doc_id long, text string")
    rows = [tuple(r) for r in top_ngrams_by_doc_freq(docs, n=2, k=3).collect()]
    assert rows[0] == ("a b", 3)
    # ties broken lexicographically
    assert rows[1:] == [("b c", 1), ("b d", 1)]


def test_tfidf_top_terms_ranks_rare_terms(spark):
    from cypher_for_apache_flink_spark.functions.text import tfidf_top_terms
    docs = spark.createDataFrame(
        [(1, "common common rare"), (2, "common other"), (3, "common thing")],
        "doc_id long, text string")
    got = {(r.doc_id, r.term) for r in tfidf_top_terms(docs, k=1).collect()}
    # 'common' appears everywhere -> idf 0; the rare term wins per doc
    assert got == {(1, "rare"), (2, "other"), (3, "thing")}
