"""CALL procedure support (beyond-reference: the reference blacklists its
entire ProcedureCallAcceptance corpus — morpheus-tck failing_blacklist).

Table-backed procedures plan as a broadcast null-safe equi-join on the
argument columns (no per-row Python); function-backed procedures run a
Python callable once for constant arguments.
"""

import pytest

from cypher_for_apache_flink_spark import PropertyGraph
from cypher_for_apache_flink_spark.procedures import (
    function_procedure,
    parse_signature,
    table_procedure,
)


@pytest.fixture(scope="module")
def g(spark):
    PropertyGraph._tests_spark = spark
    return PropertyGraph({}, {}, name="empty")


@pytest.fixture(scope="module")
def procs():
    return [
        table_procedure(
            "test.my.proc(name :: STRING?, id :: INTEGER?) "
            ":: (city :: STRING?, code :: INTEGER?)",
            [("Andres", 1, "Malmo", 46), ("Stefan", 1, "Berlin", 49),
             ("Stefan", 2, "Europe", None), (None, 1, "York", 28)]),
        table_procedure("test.labels() :: (label :: STRING?)",
                        [("A",), ("B",), ("C",)]),
        table_procedure("test.void() :: VOID", []),
    ]


def test_parse_signature():
    name, ins, outs = parse_signature(
        "a.b.c(x :: INTEGER?, y :: STRING?) :: (z :: FLOAT?)")
    assert name == "a.b.c"
    assert ins == (("x", "INTEGER"), ("y", "STRING"))
    assert outs == (("z", "FLOAT"),)
    assert parse_signature("v() :: VOID")[2] == ()
    with pytest.raises(ValueError):
        parse_signature("nope")


def test_table_procedure_row_width_checked():
    with pytest.raises(ValueError, match="row"):
        table_procedure("p(a :: INTEGER?) :: (b :: INTEGER?)", [(1,)])


def test_standalone_call(g, procs):
    rows = g.cypher("CALL test.my.proc('Stefan', 1)",
                    procedures=procs).to_maps()
    assert rows == [{"city": "Berlin", "code": 49}]


def test_standalone_call_null_safe(g, procs):
    rows = g.cypher("CALL test.my.proc(null, 1)",
                    procedures=procs).to_maps()
    assert rows == [{"city": "York", "code": 28}]


def test_implicit_arguments_from_params(g, procs):
    rows = g.cypher("CALL test.my.proc",
                    params={"name": "Stefan", "id": 2},
                    procedures=procs).to_maps()
    assert rows == [{"city": "Europe", "code": None}]


def test_in_query_call_joins_per_row(g, procs):
    rows = g.cypher(
        "UNWIND ['Andres', 'Stefan'] AS n "
        "CALL test.my.proc(n, 1) YIELD city RETURN n, city",
        procedures=procs).to_maps()
    assert sorted((r["n"], r["city"]) for r in rows) == [
        ("Andres", "Malmo"), ("Stefan", "Berlin")]


def test_in_query_call_plan_is_broadcast_join(g, procs):
    res = g.cypher(
        "UNWIND ['Andres', 'Stefan'] AS n "
        "CALL test.my.proc(n, 1) YIELD city RETURN n, city",
        procedures=procs)
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_void_call_keeps_rows(g, procs):
    rows = g.cypher("UNWIND [1, 2, 3] AS i CALL test.void() "
                    "RETURN count(i) AS c", procedures=procs).to_maps()
    assert rows == [{"c": 3}]


def test_yield_alias(g, procs):
    rows = g.cypher("CALL test.labels() YIELD label AS l "
                    "RETURN l ORDER BY l LIMIT 1", procedures=procs).to_maps()
    assert rows == [{"l": "A"}]


def test_unknown_procedure_and_output(g, procs):
    from cypher_for_apache_flink_spark.errors import PlanError
    with pytest.raises(PlanError) as ei:
        g.cypher("CALL test.nope()", procedures=procs).to_maps()
    assert ei.value.code == "ProcedureNotFound"
    with pytest.raises(PlanError) as ei:
        g.cypher("CALL test.labels() YIELD zap RETURN zap",
                 procedures=procs).to_maps()
    assert ei.value.code == "UnknownProcedureOutput"
    with pytest.raises(PlanError) as ei:
        g.cypher("CALL test.my.proc('x') YIELD city RETURN city",
                 procedures=procs).to_maps()
    assert ei.value.code == "InvalidNumberOfArguments"


def test_function_backed_procedure(g):
    def fn(spark, lo, hi):
        return spark.range(lo, hi).toDF("value")

    proc = function_procedure(
        "test.range(lo :: INTEGER?, hi :: INTEGER?) "
        ":: (value :: INTEGER?)", fn)
    rows = g.cypher("CALL test.range(1, 4) YIELD value RETURN value",
                    procedures=[proc]).to_maps()
    assert sorted(r["value"] for r in rows) == [1, 2, 3]
