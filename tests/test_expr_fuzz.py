"""Differential fuzz of the scalar-expression compiler against DuckDB.

Random integer-arithmetic/CASE/comparison trees are evaluated through the
full Cypher stack (RETURN <expr>) and as plain SQL in DuckDB; results must
agree exactly.  The grammar sticks to exact-integer operations (+ - *,
unary minus, abs, CASE, comparisons) so there is no float-noise margin —
complements the 3VL predicate fuzzer (test_3vl_fuzz).
"""

import random

import duckdb
import pytest

SEEDS = [3, 17, 99]


def gen_int_expr(rng, depth=0):
    """Returns (cypher_text, sql_text) — identical except Cypher spells
    integer division with / (not exercised) and exponent with ^ (not
    exercised)."""
    if depth >= 3 or rng.random() < 0.3:
        v = rng.randint(-9, 9)
        return (f"({v})", f"({v})")
    pick = rng.random()
    if pick < 0.55:
        op = rng.choice(["+", "-", "*"])
        lc, ls = gen_int_expr(rng, depth + 1)
        rc, rs = gen_int_expr(rng, depth + 1)
        return (f"({lc} {op} {rc})", f"({ls} {op} {rs})")
    if pick < 0.7:
        c, s = gen_int_expr(rng, depth + 1)
        return (f"(-{c})", f"(-{s})")
    if pick < 0.85:
        c, s = gen_int_expr(rng, depth + 1)
        return (f"abs({c})", f"abs({s})")
    cond_op = rng.choice(["<", "<=", "=", "<>", ">", ">="])
    lc, ls = gen_int_expr(rng, depth + 1)
    rc, rs = gen_int_expr(rng, depth + 1)
    tc, ts = gen_int_expr(rng, depth + 1)
    ec, es = gen_int_expr(rng, depth + 1)
    return (f"(CASE WHEN {lc} {cond_op} {rc} THEN {tc} ELSE {ec} END)",
            f"(CASE WHEN {ls} {cond_op} {rs} THEN {ts} ELSE {es} END)")


@pytest.mark.parametrize("seed", SEEDS)
def test_int_expression_fuzz_matches_duckdb(spark, seed):
    from cypher_for_apache_flink_spark.sources.create import graph_from_create
    g = graph_from_create(spark, "CREATE (:X)")
    rng = random.Random(seed)
    pairs = [gen_int_expr(rng) for _ in range(25)]
    cy = "RETURN " + ", ".join(f"{c} AS c{i}" for i, (c, _) in enumerate(pairs))
    sql = "SELECT " + ", ".join(f"{s} AS c{i}" for i, (_, s) in enumerate(pairs))
    got = list(g.cypher(cy).collect()[0])
    want = list(duckdb.connect().execute(sql).fetchone())
    assert got == want, [(i, pairs[i][0], a, b)
                         for i, (a, b) in enumerate(zip(got, want))
                         if a != b][:3]


def gen_str_expr(rng, depth=0):
    """String-typed trees: literals, +, toUpper/toLower/trim/reverse,
    substring, left/right, replace — identical Cypher and SQL spellings
    modulo function names."""
    if depth >= 3 or rng.random() < 0.35:
        v = "".join(rng.choice("ab C") for _ in range(rng.randint(0, 4)))
        return (f"'{v}'", f"'{v}'")
    pick = rng.random()
    if pick < 0.4:
        lc, ls = gen_str_expr(rng, depth + 1)
        rc, rs = gen_str_expr(rng, depth + 1)
        return (f"({lc} + {rc})", f"({ls} || {rs})")
    if pick < 0.6:
        f = rng.choice([("toUpper", "upper"), ("toLower", "lower"),
                        ("trim", "trim"), ("reverse", "reverse")])
        c, s = gen_str_expr(rng, depth + 1)
        return (f"{f[0]}({c})", f"{f[1]}({s})")
    if pick < 0.8:
        c, s = gen_str_expr(rng, depth + 1)
        start = rng.randint(0, 3)
        ln = rng.randint(0, 3)
        # Cypher substring is 0-based, SQL 1-based
        return (f"substring({c}, {start}, {ln})",
                f"substring({s}, {start + 1}, {ln})")
    c, s = gen_str_expr(rng, depth + 1)
    return (f"replace({c}, 'a', 'xy')", f"replace({s}, 'a', 'xy')")


@pytest.mark.parametrize("seed", SEEDS)
def test_str_expression_fuzz_matches_duckdb(spark, seed):
    from cypher_for_apache_flink_spark.sources.create import graph_from_create
    g = graph_from_create(spark, "CREATE (:X)")
    rng = random.Random(seed)
    pairs = [gen_str_expr(rng) for _ in range(25)]
    cy = "RETURN " + ", ".join(f"{c} AS c{i}" for i, (c, _) in enumerate(pairs))
    sql = "SELECT " + ", ".join(f"{s} AS c{i}" for i, (_, s) in enumerate(pairs))
    got = list(g.cypher(cy).collect()[0])
    want = list(duckdb.connect().execute(sql).fetchone())
    assert got == want, [(i, pairs[i][0], a, b)
                         for i, (a, b) in enumerate(zip(got, want))
                         if a != b][:3]
