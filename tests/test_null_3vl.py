"""Null / three-valued-logic acceptance suite.

Ports the semantics of the reference's NullTests / PredicateTests /
ExpressionTests (morpheus-testing/src/test/scala/org/opencypher/morpheus/
impl/acceptance/NullTests.scala, PredicateTests.scala, ExpressionTests.scala)
against the FIXTURES.md §C.3 ``typed`` micro-graph.  SURVEY §7.5 ranks 3VL on
top of Spark SQL as hard part #1: a WHERE filter keeps only TRUE (null is
dropped), expressions propagate null, aggregates skip null, ORDER BY sorts
null largest.
"""

import pytest
from pyspark.sql import types as T

from cypher_for_apache_flink_spark import PropertyGraph


@pytest.fixture(scope="module")
def typed(spark):
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("f", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("l", T.ArrayType(T.LongType())),
    ])
    rows = [
        (1, "abc", 1, 1.5, True, [1, 2, 3]),
        (2, "def", 2, 2.5, False, [4]),
        (3, None, 3, 3.5, True, []),
        (4, "ghi", None, None, None, None),
        (5, "jkl", 5, 5.5, False, [1, None]),
        (6, None, None, None, None, None),
    ]
    nodes = {frozenset({"T"}): spark.createDataFrame(rows, schema)}
    return PropertyGraph(nodes, {}, name="typed")


from collections import Counter


def vals(result):
    """Order-insensitive bag of row tuples."""
    return Counter(tuple(r) for r in result.collect())


def bag(*rows):
    return Counter(rows)


def one(result):
    rows = result.collect()
    assert len(rows) == 1
    return tuple(rows[0])


# --- WHERE keeps only TRUE --------------------------------------------------

def test_comparison_with_null_filters_row(typed):
    # i > 1 is null for rows 4 and 6 -> dropped, not kept
    res = typed.cypher("MATCH (t:T) WHERE t.i > 1 RETURN id(t) AS id")
    assert vals(res) == bag((2,), (3,), (5,))


def test_equality_null_never_matches(typed):
    res = typed.cypher("MATCH (t:T) WHERE t.s = t.s RETURN id(t) AS id")
    assert vals(res) == bag((1,), (2,), (4,), (5,))


def test_is_null_is_not_null(typed):
    res = typed.cypher("MATCH (t:T) WHERE t.s IS NULL RETURN id(t) AS id")
    assert vals(res) == bag((3,), (6,))
    res = typed.cypher("MATCH (t:T) WHERE t.s IS NOT NULL RETURN id(t) AS id")
    assert vals(res) == bag((1,), (2,), (4,), (5,))


def test_not_null_is_null(typed):
    # NOT (null comparison) is still null -> dropped
    res = typed.cypher("MATCH (t:T) WHERE NOT (t.i > 1) RETURN id(t) AS id")
    assert vals(res) == bag((1,))


# --- 3VL truth tables -------------------------------------------------------

def test_and_or_truth_table(typed):
    # null AND false = false; null AND true = null; null OR true = true
    res = typed.cypher(
        "MATCH (t:T) WHERE t.b OR t.i = 1 RETURN id(t) AS id")
    # b true: 1,3; b false: i=1? no; b null rows: i=1 null/no
    assert vals(res) == bag((1,), (3,))
    res = typed.cypher(
        "MATCH (t:T) WHERE t.b AND t.f > 0.0 RETURN id(t) AS id")
    assert vals(res) == bag((1,), (3,))


def test_xor_with_null(typed):
    # XOR with a null operand is null -> dropped
    res = typed.cypher(
        "MATCH (t:T) WHERE t.b XOR (t.i = 2) RETURN id(t) AS id")
    # rows: 1 (T xor F=T), 2 (F xor T=T), 3 (T xor F=T), 5 (F xor F=F)
    assert vals(res) == bag((1,), (2,), (3,))


# --- null propagation in expressions ---------------------------------------

def test_arithmetic_propagates_null(typed):
    res = typed.cypher("MATCH (t:T) RETURN id(t) AS id, t.i + 1 AS x")
    assert vals(res) == bag((1, 2), (2, 3), (3, 4), (4, None), (5, 6), (6, None))


def test_string_predicate_propagates_null(typed):
    res = typed.cypher(
        "MATCH (t:T) WHERE t.s STARTS WITH 'a' RETURN id(t) AS id")
    assert vals(res) == bag((1,))


def test_in_with_null_element(typed):
    # 1 IN [1, null] = true ; 9 IN [1, null] = null
    res = typed.cypher("MATCH (t:T) WHERE 1 IN t.l RETURN id(t) AS id")
    assert vals(res) == bag((1,), (5,))
    res = typed.cypher("MATCH (t:T) WHERE 9 IN t.l RETURN id(t) AS id")
    assert vals(res) == Counter()


def test_size_of_null_list(typed):
    res = typed.cypher("MATCH (t:T) RETURN id(t) AS id, size(t.l) AS n")
    assert vals(res) == bag((1, 3), (2, 1), (3, 0), (4, None), (5, 2), (6, None))


def test_coalesce(typed):
    res = typed.cypher(
        "MATCH (t:T) RETURN id(t) AS id, coalesce(t.s, 'missing') AS s")
    assert vals(res) == bag((1, "abc"), (2, "def"), (3, "missing"),
                         (4, "ghi"), (5, "jkl"), (6, "missing"))


def test_case_with_null(typed):
    # a null WHEN condition falls through to ELSE
    res = typed.cypher(
        "MATCH (t:T) RETURN id(t) AS id, "
        "CASE WHEN t.i > 2 THEN 'big' ELSE 'other' END AS c")
    assert vals(res) == bag((1, "other"), (2, "other"), (3, "big"),
                         (4, "other"), (5, "big"), (6, "other"))


def test_missing_property_is_null(typed):
    # property absent from the schema -> null for every row, no error
    res = typed.cypher("MATCH (t:T) WHERE t.nosuch IS NULL RETURN count(*) AS n")
    assert one(res) == (6,)


# --- aggregation null semantics --------------------------------------------

def test_count_skips_nulls_count_star_does_not(typed):
    res = typed.cypher(
        "MATCH (t:T) RETURN count(*) AS all, count(t.i) AS nonnull, "
        "count(DISTINCT t.b) AS distinct_b")
    assert one(res) == (6, 4, 2)


def test_sum_avg_min_max_skip_nulls(typed):
    res = typed.cypher(
        "MATCH (t:T) RETURN sum(t.i) AS s, avg(t.f) AS a, "
        "min(t.i) AS mn, max(t.i) AS mx")
    s, a, mn, mx = one(res)
    assert s == 11 and mn == 1 and mx == 5
    assert a == pytest.approx((1.5 + 2.5 + 3.5 + 5.5) / 4)


def test_collect_skips_nulls(typed):
    res = typed.cypher("MATCH (t:T) RETURN collect(t.s) AS ss")
    (ss,) = one(res)
    assert sorted(ss) == ["abc", "def", "ghi", "jkl"]


def test_grouping_key_null_forms_group(typed):
    # null IS a grouping key value (one group for the two null-s rows)
    res = typed.cypher(
        "MATCH (t:T) RETURN t.s AS s, count(*) AS n")
    got = {r["s"]: r["n"] for r in res.collect()}
    assert got[None] == 2 and got["abc"] == 1


# --- ordering ---------------------------------------------------------------

def test_order_by_nulls_last_asc(typed):
    res = typed.cypher("MATCH (t:T) RETURN t.i AS i ORDER BY i")
    assert [r["i"] for r in res.collect()] == [1, 2, 3, 5, None, None]


def test_order_by_nulls_first_desc(typed):
    res = typed.cypher("MATCH (t:T) RETURN t.i AS i ORDER BY i DESC")
    assert [r["i"] for r in res.collect()] == [None, None, 5, 3, 2, 1]


# --- DISTINCT with nulls ----------------------------------------------------

def test_distinct_keeps_single_null(typed):
    res = typed.cypher("MATCH (t:T) RETURN DISTINCT t.b AS b")
    assert vals(res) == bag((None,), (False,), (True,))


# --- list predicates under null ---------------------------------------------

def test_any_all_none_with_nulls(typed):
    # any over [1, null] where x = 1 -> true
    res = typed.cypher(
        "MATCH (t:T) WHERE any(x IN t.l WHERE x = 1) RETURN id(t) AS id")
    assert vals(res) == bag((1,), (5,))
    # none over the empty list is true; but over [1, null] the predicate is
    # (false, null) -> any = null -> none = NOT null = null -> row dropped
    res = typed.cypher(
        "MATCH (t:T) WHERE none(x IN t.l WHERE x = 99) RETURN id(t) AS id")
    assert vals(res) == bag((1,), (2,), (3,))


def test_cross_type_equality_is_false_not_null(typed):
    """openCypher: equality between values of different type classes is
    DECIDED (false / true for <>), not null — `1 = '1'` is false; only a
    null operand makes it null (VERDICT r3 missing #3)."""
    res = typed.cypher(
        "MATCH (t:T) WHERE t.s = 'abc' "
        "RETURN 1 = '1' AS eq, 1 <> '1' AS ne, "
        "t.i = t.s AS col_eq, t.i <> t.s AS col_ne, "
        "true = 'true' AS beq")
    row = res.collect()[0]
    assert row["eq"] is False and row["ne"] is True
    assert row["col_eq"] is False and row["col_ne"] is True
    assert row["beq"] is False


def test_cross_type_equality_null_operand_still_null(typed):
    # the 'ghi' row has i = null: null vs string stays null even cross-type
    res = typed.cypher(
        "MATCH (t:T) WHERE t.s = 'ghi' "
        "RETURN t.i = 'x' AS eq, t.i <> 'x' AS ne")
    row = res.collect()[0]
    assert row["eq"] is None and row["ne"] is None


def test_cross_type_equality_filters_drop_false(typed):
    # a WHERE with a decided-false cross-type equality keeps no rows,
    # and NOT of it keeps all non-null rows
    assert typed.cypher(
        "MATCH (t:T) WHERE t.i = t.s RETURN count(*) AS n"
    ).collect()[0]["n"] == 0
    # rows where both sides non-null: ids 1, 2, 5 (i and s both present)
    assert typed.cypher(
        "MATCH (t:T) WHERE t.i <> t.s RETURN count(*) AS n"
    ).collect()[0]["n"] == 3


def test_cross_type_ordering_still_null(typed):
    assert typed.cypher(
        "MATCH (t:T) WHERE t.i < t.s RETURN count(*) AS n"
    ).collect()[0]["n"] == 0
