"""TCK-style data-driven scenario harness (SURVEY §5 layer 1).

Mirrors the reference's openCypher TCK runner
(morpheus-tck/.../TckSparkCypherTest.scala:39): each scenario is a
(setup CREATE statement, query, expected bag of rows) triple; the graph is
built from the CREATE string exactly as the TCK does, the query runs through
the full parser → planner → DataFrame stack, and results compare with
multiset semantics.  Scenarios below are re-derived from openCypher TCK
feature themes (Match, Return, Where, Aggregation, Unwind, Null, List,
Case) — hand-written expectations, not copied feature files.
"""
from collections import Counter

import pytest

from cypher_for_apache_flink_spark.sources.create import graph_from_create

# (name, setup CREATE (None = empty graph), query, expected rows)
ABC = ('CREATE (a:A {name: "a", num: 1}), (b:B {name: "b", num: 2}), '
       '(c:C {name: "c", num: 3}), (a)-[:KNOWS {w: 1}]->(b), '
       '(b)-[:KNOWS {w: 2}]->(c)')
NUMS = "CREATE (:N {x: 1}), (:N {x: 2}), (:N {x: 3}), (:N {x: 4}), (:N)"

SCENARIOS = [
    # --- Match ---------------------------------------------------------------
    ("match all nodes", ABC,
     "MATCH (n) RETURN n.name AS name",
     [("a",), ("b",), ("c",)]),
    ("match by label", ABC,
     "MATCH (n:B) RETURN n.name AS name",
     [("b",)]),
    ("match nothing on unknown label", ABC,
     "MATCH (n:Zzz) RETURN n.name AS name",
     []),
    ("match with inline property map", ABC,
     "MATCH (n {num: 2}) RETURN n.name AS name",
     [("b",)]),
    ("match rel with inline property map", ABC,
     "MATCH ()-[r {w: 2}]->(m) RETURN m.name AS name",
     [("c",)]),
    ("match directed expand", ABC,
     "MATCH (x)-[:KNOWS]->(y) RETURN x.name AS x, y.name AS y",
     [("a", "b"), ("b", "c")]),
    ("match reversed arrow", ABC,
     "MATCH (x)<-[:KNOWS]-(y) RETURN x.name AS x, y.name AS y",
     [("b", "a"), ("c", "b")]),
    ("match two hop chain", ABC,
     "MATCH (x)-[:KNOWS]->()-[:KNOWS]->(z) RETURN x.name AS x, z.name AS z",
     [("a", "c")]),
    ("match undirected counts both orientations", ABC,
     "MATCH (b:B)--(o) RETURN o.name AS o",
     [("a",), ("c",)]),
    ("var length inline property map filters every hop",
     'CREATE (a:V {n: "a"})-[:K {w: 1}]->(b:V {n: "b"}), '
     '(b)-[:K {w: 2}]->(:V {n: "c"}), (b)-[:K {w: 1}]->(:V {n: "d"})',
     'MATCH (a:V {n: "a"})-[:K*1..2 {w: 1}]->(x) RETURN x.n AS x',
     [("b",), ("d",)]),
    ("match var length 1..2", ABC,
     "MATCH (a:A)-[:KNOWS*1..2]->(t) RETURN t.name AS t",
     [("b",), ("c",)]),

    # --- Where / 3-valued logic ----------------------------------------------
    ("where comparison", NUMS,
     "MATCH (n:N) WHERE n.x > 2 RETURN n.x AS x",
     [(3,), (4,)]),
    ("where null comparison filters row", NUMS,
     "MATCH (n:N) WHERE n.x > 0 RETURN n.x AS x",
     [(1,), (2,), (3,), (4,)]),
    ("where is null", NUMS,
     "MATCH (n:N) WHERE n.x IS NULL RETURN count(*) AS c",
     [(1,)]),
    ("where is not null", NUMS,
     "MATCH (n:N) WHERE n.x IS NOT NULL RETURN count(*) AS c",
     [(4,)]),
    ("where in list", NUMS,
     "MATCH (n:N) WHERE n.x IN [2, 4, 6] RETURN n.x AS x",
     [(2,), (4,)]),
    ("where in list with null member keeps matches", NUMS,
     "MATCH (n:N) WHERE n.x IN [1, null] RETURN n.x AS x",
     [(1,)]),
    ("in empty list is false even for null", NUMS,
     "MATCH (n:N) WHERE NOT (n.x IN []) RETURN count(*) AS c",
     [(5,)]),
    ("where not in", NUMS,
     "MATCH (n:N) WHERE NOT n.x IN [1, 2] RETURN n.x AS x",
     [(3,), (4,)]),
    ("where and or precedence", NUMS,
     "MATCH (n:N) WHERE n.x = 1 OR n.x = 2 AND n.x < 2 RETURN n.x AS x",
     [(1,)]),
    ("where xor", NUMS,
     "MATCH (n:N) WHERE n.x > 1 XOR n.x < 3 RETURN n.x AS x",
     [(1,), (3,), (4,)]),
    ("incomparable types compare to null",
     "CREATE (:A {val: 4})-[:REL]->(:B {val2: 'string'})",
     "MATCH (a:A)-->(b:B) WHERE a.val < b.val2 RETURN a.val AS v",
     []),
    ("numeric comparison across int and float",
     "CREATE (:A {val: 4})-[:REL]->(:B {val2: 1.0}), "
     "(:A {val: 1})-[:REL]->(:B {val2: 4.0})",
     "MATCH (a:A)-->(b:B) WHERE a.val < b.val2 RETURN a.val AS v",
     [(1,)]),
    ("where string predicates", ABC,
     'MATCH (n) WHERE n.name STARTS WITH "a" OR n.name CONTAINS "c" '
     "RETURN n.name AS name",
     [("a",), ("c",)]),

    # --- Optional match ------------------------------------------------------
    ("optional match null padded", ABC,
     "MATCH (c:C) OPTIONAL MATCH (c)-[:KNOWS]->(x) "
     "RETURN c.name AS c, x.name AS x",
     [("c", None)]),
    ("optional match property of null is null", ABC,
     "MATCH (n) OPTIONAL MATCH (n)-[:KNOWS]->(m) "
     "RETURN n.name AS n, m.name AS m",
     [("a", "b"), ("b", "c"), ("c", None)]),

    # --- Return --------------------------------------------------------------
    ("return literal without match", None,
     "RETURN 1 + 2 AS x",
     [(3,)]),
    ("return string concat", None,
     'RETURN "a" + "b" AS s',
     [("ab",)]),
    ("return distinct", NUMS,
     "MATCH (a:N), (b:N) WHERE a.x = b.x RETURN DISTINCT a.x AS x",
     [(1,), (2,), (3,), (4,)]),
    ("order by desc limit", NUMS,
     "MATCH (n:N) WHERE n.x IS NOT NULL RETURN n.x AS x ORDER BY n.x DESC LIMIT 2",
     [(4,), (3,)]),
    ("skip and limit", NUMS,
     "MATCH (n:N) WHERE n.x IS NOT NULL RETURN n.x AS x ORDER BY n.x SKIP 1 LIMIT 2",
     [(2,), (3,)]),
    ("arithmetic in return", NUMS,
     "MATCH (n:N) WHERE n.x = 3 RETURN n.x * 2 + 1 AS y, n.x % 2 AS m, n.x ^ 2 AS p",
     [(7, 1, 9.0)]),

    # --- Aliasing lineage (ReturnTests "tricky alias") -----------------------
    ("entity alias keeps property lineage",
     'CREATE (:A {name: "me"}), (:A)',
     "MATCH (a:A) WITH a, a AS foo RETURN foo.name AS n",
     [("me",), (None,)]),
    ("alias then property filter",
     'CREATE (:A {name: "me"}), (:A)',
     "MATCH (a:A) WITH a AS x, a.name AS n WHERE n = 'me' RETURN x.name AS m",
     [("me",)]),

    # --- Aggregation ---------------------------------------------------------
    ("count star vs count property", NUMS,
     "MATCH (n:N) RETURN count(*) AS all_rows, count(n.x) AS non_null",
     [(5, 4)]),
    ("sum min max avg", NUMS,
     "MATCH (n:N) RETURN sum(n.x) AS s, min(n.x) AS lo, max(n.x) AS hi, "
     "avg(n.x) AS a",
     [(10, 1, 4, 2.5)]),
    ("grouped count", ABC,
     "MATCH (x)-[:KNOWS]->() RETURN x.name AS x, count(*) AS c",
     [("a", 1), ("b", 1)]),
    ("count distinct", ABC,
     "MATCH ()-[r:KNOWS]->() RETURN count(DISTINCT type(r)) AS t",
     [(1,)]),
    ("collect skips nulls", NUMS,
     "MATCH (n:N) RETURN size(collect(n.x)) AS c",
     [(4,)]),
    ("aggregation on empty match is zero", ABC,
     "MATCH (n:Zzz) RETURN count(n) AS c",
     [(0,)]),

    # --- Unwind --------------------------------------------------------------
    ("unwind list literal", None,
     "UNWIND [1, 2, 3] AS i RETURN i",
     [(1,), (2,), (3,)]),
    ("unwind null is empty", None,
     "UNWIND null AS i RETURN i",
     []),
    ("unwind empty list is empty", None,
     "UNWIND [] AS i RETURN i",
     []),
    ("unwind range with step", None,
     "UNWIND range(1, 10, 3) AS i RETURN i",
     [(1,), (4,), (7,), (10,)]),
    ("unwind nested via two unwinds", None,
     "UNWIND [[1, 2], [3]] AS xs UNWIND xs AS x RETURN x",
     [(1,), (2,), (3,)]),
    ("unwind preserves duplicates for distinct", None,
     "UNWIND [1, 1, 2] AS i RETURN DISTINCT i",
     [(1,), (2,)]),

    # --- Lexical -------------------------------------------------------------
    ("comments and numeric literal forms", None,
     "RETURN /* block\ncomment */ 0x1F AS h, // line comment\n"
     " 0o17 AS o, 1e3 AS e, .5 AS d",
     [(31, 15, 1000.0, 0.5)]),

    # --- Union ---------------------------------------------------------------
    ("union distinct dedupes", ABC,
     "MATCH (n:A) RETURN n.name AS name UNION MATCH (n:A) RETURN n.name AS name",
     [("a",)]),
    ("union all keeps duplicates", ABC,
     "MATCH (n:A) RETURN n.name AS name UNION ALL "
     "MATCH (n:A) RETURN n.name AS name",
     [("a",), ("a",)]),

    # --- Functions / expressions ---------------------------------------------
    ("coalesce", NUMS,
     "MATCH (n:N) RETURN coalesce(n.x, -1) AS x",
     [(1,), (2,), (3,), (4,), (-1,)]),
    ("case searched with else", NUMS,
     "MATCH (n:N) RETURN CASE WHEN n.x <= 2 THEN 'lo' WHEN n.x > 2 THEN 'hi' "
     "ELSE 'none' END AS bucket",
     [("lo",), ("lo",), ("hi",), ("hi",), ("none",)]),
    ("null propagation through operators", None,
     "RETURN 1 + null AS a, null AND false AS b, null OR true AS c, "
     "null XOR true AS d, NOT null AS e, 'a' + null AS f",
     [(None, False, True, None, None, None)]),
    ("case with null condition takes else", None,
     "RETURN CASE WHEN null THEN 1 ELSE 2 END AS a, "
     "CASE null WHEN null THEN 1 ELSE 2 END AS b",
     [(2, 2)]),
    ("comprehension filters null members", None,
     "RETURN [x IN [1, null, 3] WHERE x > 0 | x] AS lc, "
     "reduce(a = 0, x IN [1, null] | a + x) AS r",
     [((1, 3), None)]),
    ("case simple form", NUMS,
     "MATCH (n:N) WHERE n.x IS NOT NULL "
     "RETURN CASE n.x WHEN 1 THEN 'one' ELSE 'many' END AS w",
     [("one",), ("many",), ("many",), ("many",)]),
    ("string functions", None,
     'RETURN toUpper("ab") AS u, substring("hello", 1, 3) AS s, '
     'size("hello") AS n, reverse("ab") AS r',
     [("AB", "ell", 5, "ba")]),
    ("list indexing and slicing", None,
     "RETURN [1, 2, 3][0] AS hd, [1, 2, 3][-1] AS lst, [1, 2, 3][1..3] AS sl",
     [(1, 3, (2, 3))]),
    ("list index out of range is null", None,
     "RETURN [1, 2, 3][3] AS a, [1, 2, 3][-4] AS b, [1, 2, 3][-1] AS c",
     [(None, None, 3)]),
    ("list functions on null are null", None,
     "RETURN size(null) AS s, head(null) AS h, head([]) AS he, "
     "last([]) AS le, tail(null) AS t",
     [(None, None, None, None, None)]),
    ("map literal missing key is null", None,
     "RETURN {a: 1}['b'] AS miss, {a: 1}['a'] AS hit",
     [(None, 1)]),
    ("list head last tail size", None,
     "RETURN head([1, 2, 3]) AS h, last([1, 2, 3]) AS l, "
     "tail([1, 2, 3]) AS t, size([1, 2, 3]) AS s",
     [(1, 3, (2, 3), 3)]),
    ("list comprehension with filter", None,
     "RETURN [x IN range(1, 5) WHERE x % 2 = 0 | x * 10] AS xs",
     [((20, 40),)]),
    ("reduce", None,
     "RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS total",
     [(6,)]),
    ("list predicates", None,
     "RETURN any(x IN [1, 2] WHERE x > 1) AS a, all(x IN [1, 2] WHERE x > 1) AS b, "
     "none(x IN [1, 2] WHERE x > 2) AS c, single(x IN [1, 2] WHERE x = 2) AS d",
     [(True, False, True, True)]),
    ("type and labels", ABC,
     "MATCH (a:A)-[r]->() RETURN labels(a) AS l, type(r) AS t",
     [(("A",), "KNOWS")]),
    ("toInteger toFloat toString", None,
     'RETURN toInteger("42") AS i, toFloat("2.5") AS f, toString(7) AS s',
     [(42, 2.5, "7")]),
    ("casts of unparseable strings are null", None,
     'RETURN toBoolean("x") AS b, toInteger("abc") AS i, toFloat("z") AS f, '
     'toBoolean("true") AS t',
     [(None, None, None, True)]),
    # bag comparison can't see order — LIMIT makes null placement observable
    ("order by puts nulls last ascending", "CREATE (:N {x: 2}), (:N {x: 1}), (:N)",
     "MATCH (n:N) RETURN n.x AS x ORDER BY n.x LIMIT 2",
     [(1,), (2,)]),
    ("order by desc puts nulls first", "CREATE (:N {x: 2}), (:N {x: 1}), (:N)",
     "MATCH (n:N) RETURN n.x AS x ORDER BY n.x DESC LIMIT 1",
     [(None,)]),
    ("abs sign round", None,
     "RETURN abs(-3) AS a, sign(-3) AS s, round(2.5) AS r, floor(2.9) AS f",
     [(3, -1, 3.0, 2.0)]),

    # --- Exists pattern predicate -------------------------------------------
    ("exists pattern", ABC,
     "MATCH (n) WHERE exists((n)-[:KNOWS]->()) RETURN n.name AS name",
     [("a",), ("b",)]),
    ("not exists pattern", ABC,
     "MATCH (n) WHERE NOT exists((n)-[:KNOWS]->()) RETURN n.name AS name",
     [("c",)]),

    # --- Predicates on labels / patterns (PredicateTests.scala) --------------
    ("or on labels", "CREATE (:A {val: 1}), (:B {val: 2}), (:C {val: 3})",
     "MATCH (a) WHERE a:A OR a:B RETURN a.val AS v",
     [(1,), (2,)]),
    ("or on labels and properties",
     "CREATE (:A {val: 1}), (:B {val: 2}), (:A:B {val: 3})",
     "MATCH (a) WHERE (a:A AND a.val = 1) OR (a:B) RETURN a.val AS v",
     [(1,), (2,), (3,)]),
    ("bare pattern predicate with var length",
     "CREATE (v {id: 1})-[:REL]->({id: 2})-[:REL]->({id: 3})<-[:REL]-(v)",
     "MATCH (a)-->(b) WHERE (a)-[*1..3]->()-->(b) RETURN a.id AS a, b.id AS b",
     [(1, 3)]),
    ("nested pattern predicate under or",
     "CREATE ({id: 1, age: 21}) CREATE ({id: 2, age: 18, foo: true}) "
     "CREATE ({id: 3, age: 18, foo: true})-[:KNOWS]->(:Foo) "
     "CREATE ({id: 4, age: 18, foo: false})-[:KNOWS]->(:Foo)",
     "MATCH (a) WHERE a.age > 20 OR ( (a)-[:KNOWS]->(:Foo) AND a.foo = true ) "
     "RETURN a.id AS i",
     [(1,), (3,)]),
    ("pattern predicate with derived node property",
     "CREATE ({id: 1, val: 0})-[:REL]->({id: 3, val: 2}) "
     "CREATE ({id: 2, val: 0})-[:REL]->({id: 3, val: 1})",
     "MATCH (a) WHERE (a)-->({val: a.val + 2}) RETURN a.id AS i",
     [(1,)]),
    ("pattern predicate with property map",
     "CREATE ({id: 1})-[:REL]->({id: 2, foo: true})",
     "MATCH (a) WHERE (a)-->({id: 2, foo: true}) RETURN a.id AS i",
     [(1,)]),
    ("exists in projection",
     "CREATE (:P {id: 1})-[:KNOWS]->(:P {id: 2})",
     "MATCH (a:P) RETURN a.id AS i, exists((a)-[:KNOWS]->(:P)) AS f",
     [(1, True), (2, False)]),
    ("reserved property names on relationships",
     'CREATE (x {n: "x"})-[:R {id: 7, source: 8, target: 9}]->(y {n: "y"})',
     "MATCH ()-[r:R]->() RETURN r.id AS i, r.source AS s, r.target AS t",
     [(7, 8, 9)]),

    # --- With pipeline -------------------------------------------------------
    ("with filters aggregate", ABC,
     "MATCH (x)-[:KNOWS]->(y) WITH x, count(y) AS degree WHERE degree >= 1 "
     "RETURN x.name AS name, degree",
     [("a", 1), ("b", 1)]),
    ("with alias then reuse", NUMS,
     "MATCH (n:N) WITH n.x AS v WHERE v > 2 RETURN sum(v) AS s",
     [(7,)]),
    ("with collect then unwind",
     'CREATE (:M {x: 1, y: "a"}), (:M {x: 2, y: "b"}), (:M {x: 3, y: "a"})',
     "MATCH (n:M) WITH n.y AS y, collect(n.x) AS xs UNWIND xs AS x "
     "RETURN y, x",
     [("a", 1), ("a", 3), ("b", 2)]),
    ("with order limit on node then project",
     'CREATE (:M {x: 1, y: "a"}), (:M {x: 2, y: "b"}), (:M {x: 3, y: "a"})',
     "MATCH (n:M) WITH n ORDER BY n.x DESC LIMIT 2 RETURN n.x AS x",
     [(2,), (3,)]),
    ("with aggregate feeds second match",
     'CREATE (:M {x: 1, y: "a"}), (:M {x: 2, y: "b"}), (:M {x: 3, y: "a"})',
     "MATCH (n:M) WITH max(n.x) AS mx MATCH (m:M) WHERE m.x = mx "
     "RETURN m.y AS y",
     [("a",)]),
    ("with limit then rematch",
     'CREATE (:M {x: 1, y: "a"}), (:M {x: 2, y: "b"}), (:M {x: 3, y: "a"})',
     "MATCH (n:M) WITH n LIMIT 2 MATCH (m:M) WHERE m.x = n.x "
     "RETURN count(*) AS c",
     [(2,)]),
    ("unwind list of maps and project",
     None,
     "UNWIND [{a: 1}, {a: 2}] AS m RETURN m.a AS a",
     [(1,), (2,)]),
    ("aggregate inside larger expression",
     'CREATE (:M {x: 1}), (:M {x: 2}), (:M {x: 3})',
     "MATCH (n:M) RETURN sum(n.x) / count(*) AS avg_int, count(*) + 1 AS c1",
     [(2, 4)]),

    # --- Equality semantics (openCypher: cross-type equality is decided) -----
    ("equality across incomparable types is false", NUMS,
     "MATCH (n:N) WHERE n.x = '1' RETURN count(*) AS c",
     [(0,)]),
    ("inequality across incomparable types is true", NUMS,
     "MATCH (n:N) WHERE n.x <> '1' RETURN count(*) AS c",
     [(4,)]),
    ("cross-type equality with null operand is null", NUMS,
     "MATCH (n:N) WHERE n.x IS NULL AND (n.x = 'a') IS NULL "
     "RETURN count(*) AS c",
     [(1,)]),

    # --- Type conversion functions -------------------------------------------
    ("toInteger parses and rejects", None,
     "RETURN toInteger('42') AS i, toInteger('nope') AS bad",
     [(42, None)]),
    ("toFloat parses", None, "RETURN toFloat('3.5') AS f", [(3.5,)]),
    ("toBoolean parses and rejects", None,
     "RETURN toBoolean('true') AS t, toBoolean('x') AS bad",
     [(True, None)]),
    ("toString on numbers", None,
     "RETURN toString(3) AS s, toString(3.5) AS f",
     [("3", "3.5")]),

    # --- Lists / higher-order ------------------------------------------------
    ("list comprehension with filter and map", None,
     "RETURN [x IN range(1,5) WHERE x % 2 = 0 | x * 10] AS l",
     [((20, 40),)]),
    ("reduce accumulates", None,
     "RETURN reduce(acc = 0, x IN [1,2,3] | acc + x) AS s",
     [(6,)]),
    ("quantifiers", None,
     "RETURN any(x IN [1,2] WHERE x > 1) AS a, "
     "all(x IN [1,2] WHERE x > 0) AS b, "
     "none(x IN [1,2] WHERE x > 5) AS c, "
     "single(x IN [1,2] WHERE x = 2) AS d",
     [(True, True, True, True)]),
    ("head last tail reverse", None,
     "RETURN head([1,2,3]) AS h, last([1,2,3]) AS l, tail([1,2,3]) AS t, "
     "reverse([1,2,3]) AS r",
     [(1, 3, (2, 3), (3, 2, 1))]),
    ("range with step", None, "RETURN range(1, 9, 3) AS r", [((1, 4, 7),)]),
    ("list slice and negative index", None,
     "RETURN [1,2,3,4][1..3] AS s, [1,2,3][2] AS i, [1,2,3][-1] AS neg",
     [((2, 3), 3, 3)]),
    ("size of string and list", None,
     "RETURN size('abc') AS a, size([1,2]) AS b",
     [(3, 2)]),

    # --- Maps ----------------------------------------------------------------
    ("nested map literal access", None,
     "RETURN {a: {b: 2}}.a.b AS v", [(2,)]),
    ("keys of node", ABC, "MATCH (a:A) RETURN keys(a) AS k",
     [(("name", "num"),)]),

    # --- Scalar / string functions -------------------------------------------
    ("abs sign floor ceil", None,
     "RETURN abs(-3) AS a, sign(-2) AS s, floor(1.7) AS f, ceil(1.2) AS c",
     [(3, -1, 1, 2)]),
    ("string function chain", None,
     "RETURN toUpper('ab') AS u, trim('  x ') AS t, "
     "replace('aba','a','c') AS r, split('a,b', ',') AS sp, "
     "substring('hello', 1, 3) AS su",
     [("AB", "x", "cbc", ("a", "b"), "ell")]),
    ("starts with null operand filters row", ABC,
     "MATCH (n) WHERE n.name STARTS WITH null RETURN count(*) AS c",
     [(0,)]),

    # --- Unwind / aggregation edge cases -------------------------------------
    ("double unwind cross product", None,
     "UNWIND [1,2] AS a UNWIND ['x','y'] AS b RETURN a, b",
     [(1, "x"), (1, "y"), (2, "x"), (2, "y")]),
    ("unwind null produces no rows", None,
     "UNWIND null AS x RETURN x", []),
    ("collect skips nulls", NUMS,
     "MATCH (n:N) RETURN size(collect(n.x)) AS s", [(4,)]),
    ("min max over strings", ABC,
     "MATCH (n) RETURN min(n.name) AS mn, max(n.name) AS mx",
     [("a", "c")]),
    ("exists property function", NUMS,
     "MATCH (n:N) WHERE exists(n.x) RETURN count(*) AS c", [(4,)]),
    ("with distinct expression", NUMS,
     "MATCH (n:N) WITH DISTINCT n.x IS NOT NULL AS present "
     "RETURN count(*) AS c",
     [(2,)]),

    # --- Pattern comprehensions ----------------------------------------------
    ("pattern comprehension", ABC,
     "MATCH (a:A) RETURN [(a)-[:KNOWS]->(b) | b.name] AS l",
     [(("b",),)]),
    ("pattern comprehension empty for no match", ABC,
     "MATCH (c:C) RETURN [(c)-[:KNOWS]->(x) | x.name] AS l",
     [((),)]),
    ("pattern comprehension with where", ABC,
     "MATCH (a:A) RETURN [(a)-[:KNOWS]->(b) WHERE b.num > 5 | b.name] AS l",
     [((),)]),
    ("pattern comprehension inside size", ABC,
     "MATCH (n) RETURN n.name AS n, "
     "size([(n)-[:KNOWS]->(m) | m.name]) AS deg",
     [("a", 1), ("b", 1), ("c", 0)]),
    ("pattern comprehension as predicate", ABC,
     "MATCH (n) WHERE size([(n)-[:KNOWS]->(x) | x.name]) > 0 "
     "RETURN n.name AS name",
     [("a",), ("b",)]),

    # --- Operator precedence / lambdas ---------------------------------------
    ("unary minus binds looser than exponent", None,
     "RETURN -2 ^ 2 AS a, 2 ^ -1 AS b, 2 ^ 3 ^ 2 AS e",
     [(-4.0, 0.5, 512.0)]),
    ("reduce over strings concatenates", None,
     "RETURN reduce(s = '', x IN ['a','b'] | s + x) AS s",
     [("ab",)]),
    ("string comprehension with typed lambda var", None,
     "RETURN [x IN ['ab','c'] WHERE x STARTS WITH 'a' | x + '!'] AS l",
     [(("ab!",),)]),
    ("with pipeline chains wheres", NUMS,
     "MATCH (n:N) WITH n.x AS x WHERE x > 1 WITH x WHERE x < 4 "
     "RETURN x", [(2,), (3,)]),
    ("with order skip limit", NUMS,
     "MATCH (n:N) WITH n.x AS x ORDER BY x SKIP 1 LIMIT 2 RETURN x",
     [(2,), (3,)]),
    ("aggregates on empty match", None,
     # sum over zero values is 0 (TCK Aggregation), min/collect stay empty
     "MATCH (q:Nope) RETURN count(q) AS c, sum(q.x) AS s, "
     "size(collect(q.x)) AS l",
     [(0, 0, 0)]),
    ("sum of all nulls is zero", None,
     "UNWIND [null, null] AS x RETURN sum(x) AS s", [(0,)]),
    ("dynamic property lookup", ABC,
     "MATCH (n:A) RETURN n['name'] AS r", [("a",)]),
    ("dynamic property lookup missing key", ABC,
     "MATCH (n:A) RETURN n['zzz'] AS r", [(None,)]),
    ("dynamic property lookup computed key", ABC,
     "MATCH (n:A) WITH 'nu' + 'm' AS k, n RETURN n[k] AS r", [(1,)]),
    ("list equality by value", None,
     "RETURN [1,2] = [1,2] AS a, [1,2] = [2,1] AS b",
     [(True, False)]),
    ("null arithmetic propagates", None,
     "RETURN 1 + null AS a, null * 2 AS b, null + 'x' AS c",
     [(None, None, None)]),
    ("substring beyond end is empty", None,
     "RETURN substring('abc', 5, 2) AS a, substring('abc', 1) AS b",
     [("", "bc")]),

    # --- IN 3-valued logic (TCK ListOperations null semantics) ---------------
    ("null in empty list is false", None,
     "RETURN null IN [] AS r", [(False,)]),
    ("null in nonempty list is null", None,
     "RETURN null IN [1] AS r", [(None,)]),
    ("in list with null member undecided", None,
     "RETURN 1 IN [null] AS a, 1 IN [2, null] AS b", [(None, None)]),
    ("in list found despite null member", None,
     "RETURN 1 IN [1, null] AS r", [(True,)]),

    # --- Ordering null placement (openCypher: null is largest) ---------------
    ("order by puts nulls last ascending", NUMS,
     "MATCH (n:N) RETURN n.x AS x ORDER BY x LIMIT 5",
     [(1,), (2,), (3,), (4,), (None,)]),
    ("order by desc puts nulls first", NUMS,
     "MATCH (n:N) RETURN n.x AS x ORDER BY x DESC LIMIT 1",
     [(None,)]),

    # --- CASE / container access edge cases ----------------------------------
    ("case without else yields null", None,
     "RETURN CASE WHEN false THEN 1 END AS r", [(None,)]),
    ("simple case on value", NUMS,
     "MATCH (n:N) RETURN CASE n.x WHEN 1 THEN 'one' WHEN 2 THEN 'two' "
     "ELSE 'many' END AS w",
     [("one",), ("two",), ("many",), ("many",), ("many",)]),
    ("index out of bounds is null", None,
     "RETURN [1,2,3][5] AS a, [1,2,3][-1] AS b", [(None, 3)]),

    # --- Comparability (incomparable types compare to null) ------------------
    ("cross type comparison is null", NUMS,
     "MATCH (n:N) WITH n WHERE n.x < 'a' RETURN count(*) AS c", [(0,)]),
    ("string ordering", None,
     "RETURN 'a' < 'b' AS a, 'abc' <= 'abd' AS b", [(True, True)]),

    # --- Aggregation null handling -------------------------------------------
    ("collect skips nulls", NUMS,
     "MATCH (n:N) RETURN size(collect(n.x)) AS c", [(4,)]),
    ("count property skips nulls", NUMS,
     "MATCH (n:N) RETURN count(n.x) AS a, count(*) AS b", [(4, 5)]),
    ("min max skip nulls", NUMS,
     "MATCH (n:N) RETURN min(n.x) AS lo, max(n.x) AS hi", [(1, 4)]),
    ("distinct projection keeps one null", NUMS,
     "MATCH (n:N) RETURN DISTINCT n.x IS NULL AS b",
     [(False,), (True,)]),

    # --- Boolean operators ---------------------------------------------------
    ("xor truth table", None,
     "RETURN true XOR false AS a, true XOR true AS b, "
     "false XOR false AS c", [(True, False, False)]),
    ("string predicate on null is null", NUMS,
     "MATCH (n:N) WHERE (CASE WHEN n.x IS NULL THEN null ELSE 'ab' END) "
     "STARTS WITH 'a' RETURN count(*) AS c", [(4,)]),

    # --- Unwind composition --------------------------------------------------
    ("double unwind is a cartesian", None,
     "UNWIND [1,2] AS a UNWIND [10,20] AS b RETURN a, b",
     [(1, 10), (1, 20), (2, 10), (2, 20)]),
    ("unwind range with step", None,
     "UNWIND range(1, 10, 3) AS x RETURN x",
     [(1,), (4,), (7,), (10,)]),
    ("with distinct deduplicates mid-pipeline", NUMS,
     "MATCH (n:N) WITH DISTINCT n.x IS NULL AS b RETURN b",
     [(False,), (True,)]),

    # --- Scalar function edges -----------------------------------------------
    ("size of null is null", None,
     "RETURN size(null) AS r", [(None,)]),
    ("modulo", None,
     "RETURN 7 % 3 AS a, -7 % 3 AS b", [(1, -1)]),
    ("min aggregator over strings", None,
     "UNWIND ['b', 'a'] AS s RETURN min(s) AS lo, max(s) AS hi",
     [("a", "b")]),

    ("union matches columns by name not position", ABC,
     "MATCH (a:A) RETURN a.name AS n, a.num AS x "
     "UNION MATCH (b:B) RETURN b.num AS x, b.name AS n",
     [("a", 1), ("b", 2)]),
    ("union all keeps duplicates across parts", ABC,
     "MATCH (a:A) RETURN a.num AS x UNION ALL MATCH (a:A) RETURN a.num AS x",
     [(1,), (1,)]),

    # --- Paths / entity meta functions ---------------------------------------
    ("path length of two hop", ABC,
     "MATCH p = (a:A)-[:KNOWS]->()-[:KNOWS]->() RETURN length(p) AS l",
     [(2,)]),
    ("comprehension over path nodes reads properties", ABC,
     "MATCH p = (a:A)-[:KNOWS]->(b) RETURN [n IN nodes(p) | n.name] AS ns",
     [(("a", "b"),)]),
    ("filtered comprehension over path nodes", ABC,
     "MATCH p = (a:A)-[:KNOWS]->()-[:KNOWS]->() "
     "RETURN [n IN nodes(p) WHERE n.num > 1 | n.name] AS ns",
     [(("b", "c"),)]),
    ("comprehension over path relationships", ABC,
     "MATCH p = (a:A)-[:KNOWS]->()-[:KNOWS]->() "
     "RETURN [r IN relationships(p) | r.w] AS ws",
     [((1, 2),)]),
    ("all quantifier over path relationships", ABC,
     "MATCH p = (x)-[:KNOWS]->()-[:KNOWS]->(z) "
     "WHERE all(r IN relationships(p) WHERE r.w <= 2) "
     "RETURN x.name AS x, z.name AS z",
     [("a", "c")]),
    ("none quantifier over path relationships", ABC,
     "MATCH p = (x)-[:KNOWS]->(y) "
     "WHERE none(r IN relationships(p) WHERE r.w > 1) "
     "RETURN x.name AS x", [("a",)]),
    ("path nodes and rels sizes", ABC,
     "MATCH p = (a:A)-[:KNOWS*1..2]->(x) "
     "RETURN size(nodes(p)) AS n, size(relationships(p)) AS r",
     [(2, 1), (3, 2)]),
    ("start and end node ids match endpoints", ABC,
     "MATCH (x)-[r:KNOWS {w: 1}]->(y) "
     "RETURN startNode(r) = id(x) AS s, endNode(r) = id(y) AS e",
     [(True, True)]),
    ("type and labels of matched entities", ABC,
     "MATCH (x:A)-[r]->() RETURN labels(x)[0] AS lbl, type(r) AS t",
     [("A", "KNOWS")]),
    ("keys of a node", ABC,
     "MATCH (x:A) RETURN size(keys(x)) AS k", [(2,)]),
    ("properties as map", ABC,
     "MATCH (x:A) RETURN properties(x).num AS num", [(1,)]),
    ("id is stable within a query", ABC,
     "MATCH (x:A)-[:KNOWS]->(y) WITH x, y "
     "MATCH (x2) WHERE id(x2) = id(x) RETURN x2.name AS name",
     [("a",)]),

    # --- Map projections ------------------------------------------------------
    ("map projection with computed entry", ABC,
     "MATCH (x:A) WITH x {.name, double: x.num * 2} AS m "
     "RETURN m.name AS name, m.double AS d",
     [("a", 2)]),

    # --- Temporal scalars -----------------------------------------------------
    ("date accessors", None,
     "WITH date('2024-03-15') AS d "
     "RETURN d.year AS y, d.month AS m, d.day AS dd",
     [(2024, 3, 15)]),
    ("datetime comparison", None,
     "RETURN localdatetime('2024-01-01T10:00:00') < "
     "localdatetime('2024-01-01T11:30:00') AS a",
     [(True,)]),
    ("duration map constructor components", None,
     "WITH duration({days: 3, hours: 4}) AS d "
     "RETURN d.days AS days, d.hours AS h",
     [(3, 4)]),

    # --- Container index / slice edges (TCK ListOperations) ------------------
    ("negative list index", None, "RETURN [1,2,3][-1] AS r", [(3,)]),
    ("out of range index is null", None, "RETURN [1,2,3][5] AS r", [(None,)]),
    ("open-ended slice", None, "RETURN [1,2,3][1..] AS r", [((2, 3),)]),
    ("open-start slice", None, "RETURN [1,2,3][..2] AS r", [((1, 2),)]),
    ("negative slice start", None, "RETURN [1,2,3][-2..] AS r", [((2, 3),)]),

    # --- Arithmetic semantics -------------------------------------------------
    ("integer division truncates", None, "RETURN 5 / 2 AS r", [(2,)]),
    ("mixed division is float", None, "RETURN 5.0 / 2 AS r", [(2.5,)]),
    ("modulo", None, "RETURN 5 % 2 AS r", [(1,)]),
    ("float equality is exact", None,
     "RETURN 0.1 + 0.2 = 0.3 AS r", [(False,)]),
    ("string plus null is null", None, "RETURN 'a' + null AS r", [(None,)]),

    # --- Quantifiers over empty lists ----------------------------------------
    ("any over empty list is false", None,
     "RETURN any(x IN [] WHERE x) AS r", [(False,)]),
    ("all over empty list is true", None,
     "RETURN all(x IN [] WHERE x) AS r", [(True,)]),

    # --- DISTINCT treats null as a value -------------------------------------
    ("distinct keeps one null", None,
     "UNWIND [1, null, 1, null] AS x RETURN DISTINCT x AS x",
     [(1,), (None,)]),

    # --- Repeated variable across MATCH clauses ------------------------------
    ("rebound variable must satisfy both labels", ABC,
     "MATCH (a:A) MATCH (a:B) RETURN a.name AS r", []),
    ("property map pattern filters", ABC,
     "MATCH (n {name: 'a'}) RETURN n.num AS r", [(1,)]),
    ("relationship property map pattern", ABC,
     "MATCH ()-[r:KNOWS {w: 1}]->() RETURN r.w AS r", [(1,)]),

    # --- keys() on maps (TCK Keys: literal-map keys include null values) -----
    ("keys of literal map keeps null-valued keys", None,
     "RETURN keys({a: 1, b: null}) AS r", [(("a", "b"),)]),
    # key order is unspecified in Cypher; map-typed structs compile with
    # canonical (sorted) field order so map equality is order-blind
    ("keys of map projection", ABC,
     "MATCH (n:A) RETURN keys(n {.name, extra: 5}) AS r",
     [(("extra", "name"),)]),
    ("keys of nested map", None,
     "WITH {x: 1, y: {z: 2}} AS m RETURN keys(m.y) AS r", [(("z",),)]),

    # --- range with step / reverse -------------------------------------------
    ("range descending", None, "RETURN range(3, 0, -1) AS r",
     [((3, 2, 1, 0),)]),
    ("reverse list", None, "RETURN reverse([1,2,3]) AS r", [((3, 2, 1),)]),

    # --- size() of a pattern expression / isEmpty ----------------------------
    ("size of pattern expression counts matches", ABC,
     "MATCH (n) RETURN n.name AS n, size((n)-[:KNOWS]->()) AS c",
     [("a", 1), ("b", 1), ("c", 0)]),
    ("size of pattern in where", ABC,
     "MATCH (n) WHERE size((n)-[:KNOWS]->()) = 1 RETURN n.name AS r",
     [("a",), ("b",)]),
    ("isEmpty on list and string", None,
     "RETURN isEmpty([]) AS a, isEmpty('x') AS b, isEmpty('') AS c",
     [(True, False, True)]),

    # --- Multi-label / type alternation / WITH semantics ---------------------
    ("conjunctive label pattern",
     'CREATE (:A:B {name: "ab"}), (:A {name: "a"}), (:B {name: "b"})',
     "MATCH (n:A:B) RETURN n.name AS r", [("ab",)]),
    ("relationship type alternation counts both", ABC,
     "MATCH ()-[r:KNOWS|NOPE]->() RETURN count(*) AS c", [(2,)]),
    ("anonymous fixed-length var expand", ABC,
     "MATCH ()-[*2]->(z) RETURN z.name AS r", [("c",)]),
    ("with star keeps all variables", ABC,
     "MATCH (a:A) WITH * RETURN a.num AS r", [(1,)]),
    ("three part union distinct", None,
     "RETURN 1 AS x UNION RETURN 2 AS x UNION RETURN 1 AS x",
     [(1,), (2,)]),
    ("with shadows its own alias", None,
     "WITH 1 AS x WITH x + 1 AS x RETURN x", [(2,)]),
    ("case in where", NUMS,
     "MATCH (n:N) WHERE CASE WHEN n.x IS NULL THEN false "
     "ELSE n.x > 2 END RETURN n.x AS x", [(3,), (4,)]),

    # --- split literal delimiter / empty range -------------------------------
    ("split delimiter is literal not regex", None,
     "RETURN split('a.b.c', '.') AS r", [(("a", "b", "c"),)]),
    ("split computed delimiter", None,
     "WITH '.' AS d RETURN split('x.y', d) AS r", [(("x", "y"),)]),
    ("range with wrong-direction step is empty", None,
     "RETURN range(1, 0) AS r, range(0, -5, 1) AS s",
     [((), ())]),

    # --- Probe-verified semantics (round 4 batches 2-4) ----------------------
    ("order by aggregate expression", ABC,
     "MATCH (x)-[:KNOWS]->() RETURN x.name AS n, count(*) AS c "
     "ORDER BY count(*) DESC, n", [("a", 1), ("b", 1)]),
    ("with aggregate then where", ABC,
     "MATCH (x)-[:KNOWS]->() WITH x, count(*) AS c WHERE c >= 1 "
     "RETURN x.name AS n", [("a",), ("b",)]),
    ("count star without match", None, "RETURN count(*) AS c", [(1,)]),
    ("count distinct over expression", ABC,
     "MATCH (n) RETURN count(DISTINCT n.num + 1) AS c", [(3,)]),
    ("exists with var length pattern", ABC,
     "MATCH (a:A) WHERE exists((a)-[*1..2]->()) RETURN a.name AS r",
     [("a",)]),
    ("optional match where filters inside", ABC,
     "MATCH (a:A) OPTIONAL MATCH (a)-[:KNOWS]->(x) WHERE x.num > 5 "
     "RETURN a.name AS a, x.name AS x", [("a", None)]),
    ("list comprehension over collected", ABC,
     "MATCH (a) WITH collect(a.num) AS xs "
     "RETURN [x IN xs WHERE x > 1] AS r", [((2, 3),)]),
    ("pattern predicate with property map", ABC,
     "MATCH (a:A)-[:KNOWS]->(b) WHERE (b)-[:KNOWS]->(:C) "
     "RETURN b.name AS r", [("b",)]),
    ("with order by limit then expand", ABC,
     "MATCH (n) WITH n ORDER BY n.num DESC LIMIT 1 "
     "MATCH (n)<-[:KNOWS]-(m) RETURN m.name AS r", [("b",)]),
    ("toBoolean", None,
     "RETURN toBoolean('true') AS a, toBoolean('nope') AS b",
     [(True, None)]),
    ("toUpper of null", None, "RETURN toUpper(null) AS r", [(None,)]),
    ("aggregates over no rows", ABC,
     "MATCH (n:Zzz) RETURN sum(n.num) AS s, min(n.num) AS lo, "
     "avg(n.num) AS a", [(0, None, None)]),
    ("none and single quantifiers", None,
     "RETURN none(x IN [1,2] WHERE x > 5) AS a, "
     "single(x IN [1,2] WHERE x = 2) AS b", [(True, True)]),
    ("property access on map literal", None,
     "RETURN {a: 1}.a AS r", [(1,)]),
    ("index into nested map list", None,
     "WITH {list: [1,2]} AS m RETURN m.list[0] AS r", [(1,)]),
    ("limit zero", NUMS,
     "MATCH (n:N) RETURN n.x AS x ORDER BY x LIMIT 0", []),
    ("skip beyond rows", ABC,
     "MATCH (n:A) RETURN n.name AS r SKIP 10", []),
    ("simple form case", None,
     "RETURN CASE 2 WHEN 1 THEN 'one' WHEN 2 THEN 'two' "
     "ELSE 'other' END AS r", [("two",)]),
    ("head and last", None,
     "RETURN head([1,2,3]) AS h, last([1,2,3]) AS l", [(1, 3)]),
    ("substring one arg", None,
     "RETURN substring('hello', 3) AS r", [("lo",)]),
    ("replace grows", None,
     "RETURN replace('aaa', 'a', 'ab') AS r", [("ababab",)]),
    ("date plus month lands on month end", None,
     "RETURN toString(date('2024-01-31') + duration({months: 1})) AS r",
     [("2024-02-29",)]),
    ("date accessors week", None,
     "RETURN date('2024-01-01').week AS w", [(1,)]),
    ("duration between months accessor", None,
     "RETURN duration.between(date('2024-01-01'), "
     "date('2024-03-15')).months AS m", [(2,)]),
    ("negative exponent", None, "RETURN 10 ^ -1 AS r", [(0.1,)]),

    # --- subscript null / computed keys on maps ------------------------------
    ("map subscript with null key", None,
     "RETURN {a: 1}[null] AS r", [(None,)]),
    ("map subscript with computed key", None,
     "WITH 'a' AS k RETURN {a: 1, b: 2}[k] AS r", [(1,)]),
    ("map subscript computed key missing", None,
     "WITH 'z' AS k RETURN {a: 1}[k] AS r", [(None,)]),
    ("entity subscript with null key", ABC,
     "MATCH (n:A) RETURN n[null] AS r", [(None,)]),

    # --- duration rendering / epoch constructors -----------------------------
    ("duration toString is iso8601", None,
     "RETURN toString(duration({days: 2, hours: 3})) AS a, "
     "toString(duration({years: 1, months: 2})) AS b, "
     "toString(duration({seconds: 90, milliseconds: 500})) AS c, "
     "toString(duration({days: 0})) AS d",
     [("P2DT3H", "P1Y2M", "PT1M30.5S", "PT0S")]),
    ("duration toString round trips", None,
     "RETURN toString(duration('P1Y2M3DT4H5M6.5S')) AS r",
     [("P1Y2M3DT4H5M6.5S",)]),
    ("datetime from epoch millis", None,
     "RETURN datetime({epochMillis: 86400000}).day AS d, "
     "datetime({epochSeconds: 60}).minute AS m", [(2, 1)]),

    # --- plus overloads / rel meta / temporal comparability ------------------
    ("string plus number concatenates", None,
     "RETURN 'a' + 1 AS a, 1 + 'a' AS b, 'n' + 1.5 AS c",
     [("a1", "1a", "n1.5")]),
    ("list concat and append with plus", None,
     "RETURN [1] + [2, 3] AS a, [1, 2] + 3 AS b",
     [((1, 2, 3), (1, 2, 3))]),
    ("keys and dynamic lookup on relationships", ABC,
     "MATCH (:A)-[r:KNOWS]->() RETURN keys(r) AS k, r['w'] AS w",
     [(("w",), 1)]),
    ("date comparable with datetime", None,
     "RETURN date('2024-01-01') < localdatetime('2024-01-01T10:00:00') AS r",
     [(True,)]),
    ("duration equality is component-wise", None,
     "RETURN duration({days: 1}) = duration({hours: 24}) AS a, "
     "duration({days: 1}) < duration({days: 2}) AS b",
     [(False, True)]),

    # Passes since round 8: nested heterogeneous comparisons box into the
    # tagged-union Any struct (operators/anyvalue.py), so list-of-list
    # equality is native struct comparison
    ("heterogeneous nested list literal", None,
     "RETURN [1, [2]] = [1, [2]] AS a", [(True,)]),

    # --- Known gaps: blacklisted (see BLACKLIST below) -----------------------
    ("merge clause", None, "MERGE (n:X) RETURN n", [(None,)]),
]

# Scenarios expected to fail, with the reason — mirroring the reference's
# blacklist semantics (TckSparkCypherTest.scala:51-77): a blacklisted
# scenario that PASSES fails the suite, so stale entries can't linger.
BLACKLIST = {
    "merge clause": "harness gap: this mini-harness compares raw tuples, "
                    "and its placeholder expectation predates the round-7 "
                    "mutation surface; the REAL MERGE coverage is the "
                    "Merge{Node,Relationship,Into}Acceptance families in "
                    "tests/tck/features (83 scenarios, whitelisted)",
}


_cache: dict = {}


def _graph(spark, setup):
    key = setup or "CREATE (:Empty)"
    if key not in _cache:
        _cache[key] = graph_from_create(spark, key)
    return _cache[key]


def _norm(v):
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


@pytest.mark.parametrize(
    "name,setup,query,expected",
    SCENARIOS,
    ids=[n for n, _, _, _ in SCENARIOS])
def test_tck_scenario(spark, name, setup, query, expected):
    blacklisted = name in BLACKLIST
    try:
        g = _graph(spark, setup)
        got = Counter(tuple(_norm(v) for v in row)
                      for row in g.cypher(query).collect())
        assert got == Counter(expected)
    except Exception:
        if blacklisted:
            pytest.xfail(BLACKLIST[name])
        raise
    if blacklisted:
        pytest.fail(f"blacklisted scenario {name!r} PASSES - remove it from "
                    "BLACKLIST (stale entries are failures, like the "
                    "reference's TCK runner)")
