"""Property-based 3VL conformance: random predicate/expression trees are
rendered BOTH as Cypher (run by the engine) and as SQL (run by DuckDB on the
same rows); surviving row-id sets must match.  This fuzzes the null
semantics SURVEY §7.5 calls hard part #1 far beyond the hand-written suite.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cypher_for_apache_flink_spark import PropertyGraph

ROWS = [
    (1, 1, 1.5, True, "a"),
    (2, 2, 2.5, False, "b"),
    (3, None, 3.5, True, "ab"),
    (4, 4, None, None, None),
    (5, None, None, False, ""),
    (6, 0, 0.0, None, "ba"),
]


@pytest.fixture(scope="module")
def fixture(spark):
    g = PropertyGraph({frozenset({"T"}): spark.createDataFrame(
        ROWS, "id long, i long, f double, b boolean, s string")}, {},
        name="fuzz")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id BIGINT, i BIGINT, f DOUBLE, b BOOLEAN, s TEXT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)", ROWS)
    return g, con


# Expression AST rendered to both dialects -----------------------------------

def atom_num():
    simple = st.one_of(
        st.just(("col", "i")), st.just(("col", "f")),
        st.integers(-3, 3).map(lambda v: ("lit", v)))
    # small arithmetic over columns/literals (+ - * render identically in
    # both dialects; / is excluded — DuckDB int/int is a double)
    return st.one_of(
        simple,
        st.tuples(st.just("arith"), st.sampled_from(["+", "-", "*"]),
                  simple, simple))


def atom_str():
    return st.one_of(
        st.just(("col", "s")),
        st.sampled_from(["a", "b", "ab", ""]).map(lambda v: ("slit", v)))


def pred(depth=0):
    base = st.one_of(
        st.tuples(st.just("cmp"),
                  st.sampled_from(["=", "<>", "<", "<=", ">", ">="]),
                  atom_num(), atom_num()),
        st.tuples(st.just("cmp"),
                  st.sampled_from(["=", "<>", "<", "<=", ">", ">="]),
                  atom_str(), atom_str()),
        st.tuples(st.just("strop"),
                  st.sampled_from(["starts", "ends", "contains"]),
                  atom_str(), atom_str()),
        st.tuples(st.just("in"), atom_num(),
                  st.lists(st.one_of(st.integers(-3, 3), st.none()),
                           min_size=0, max_size=3).map(tuple)),
        st.tuples(st.just("isnull"), st.sampled_from(["i", "f", "b", "s"])),
        st.tuples(st.just("isnotnull"),
                  st.sampled_from(["i", "f", "b", "s"])),
        st.just(("col_b",)),
    )
    if depth >= 2:
        return base
    sub = st.deferred(lambda: pred(depth + 1))
    return st.one_of(
        base,
        st.tuples(st.just("not"), sub),
        st.tuples(st.just("and"), sub, sub),
        st.tuples(st.just("or"), sub, sub),
        st.tuples(st.just("xor"), sub, sub),
    )


def render(node, dialect):
    kind = node[0]
    if kind == "col":
        return f"n.{node[1]}" if dialect == "cypher" else node[1]
    if kind == "lit":
        return str(node[1])
    if kind == "col_b":
        return "n.b" if dialect == "cypher" else "b"
    if kind == "slit":
        return "'" + node[1] + "'"
    if kind == "arith":
        _, op, a, b = node
        return f"({render(a, dialect)} {op} {render(b, dialect)})"
    if kind == "cmp":
        _, op, a, b = node
        return f"({render(a, dialect)} {op} {render(b, dialect)})"
    if kind == "strop":
        _, op, a, b = node
        ra, rb = render(a, dialect), render(b, dialect)
        if dialect == "cypher":
            kw = {"starts": "STARTS WITH", "ends": "ENDS WITH",
                  "contains": "CONTAINS"}[op]
            return f"({ra} {kw} {rb})"
        fn = {"starts": "starts_with", "ends": "ends_with",
              "contains": "contains"}[op]
        return f"{fn}({ra}, {rb})"
    if kind == "in":
        _, a, items = node
        ra = render(a, dialect)
        vals = ", ".join("null" if v is None else str(v) for v in items)
        if dialect == "cypher":
            return f"({ra} IN [{vals}])"
        if not items:
            return "(1 = 0)"   # SQL has no empty IN list
        return f"({ra} IN ({vals}))"
    if kind == "isnull":
        c = f"n.{node[1]}" if dialect == "cypher" else node[1]
        return f"({c} IS NULL)"
    if kind == "isnotnull":
        c = f"n.{node[1]}" if dialect == "cypher" else node[1]
        return f"({c} IS NOT NULL)"
    if kind == "not":
        return f"(NOT {render(node[1], dialect)})"
    if kind in ("and", "or"):
        return f"({render(node[1], dialect)} {kind.upper()} {render(node[2], dialect)})"
    if kind == "xor":
        a, b = render(node[1], dialect), render(node[2], dialect)
        if dialect == "cypher":
            return f"({a} XOR {b})"
        # SQL-standard 3VL xor: (a OR b) AND NOT (a AND b)
        return f"(({a} OR {b}) AND NOT ({a} AND {b}))"
    raise AssertionError(kind)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=pred())
def test_predicate_matches_duckdb(fixture, tree):
    g, con = fixture
    cy = render(tree, "cypher")
    sql = render(tree, "sql")
    got = sorted(r["id"] for r in g.cypher(
        f"MATCH (n:T) WHERE {cy} RETURN id(n) AS id").collect())
    want = sorted(r[0] for r in con.execute(
        f"SELECT id FROM t WHERE {sql}").fetchall())
    assert got == want, f"cypher={cy!r} sql={sql!r}"
