"""Build an in-memory :class:`PropertyGraph` from a Cypher ``CREATE`` statement.

The reference's test-fixture factory (``GraphInit.initGraph`` —
morpheus-testing/.../acceptance/GraphInit.scala:36, parsing in
okapi-testing/.../propertygraph/CreateQueryParser.scala:97-101 and
CreateGraphFactory): a multi-clause ``CREATE`` string declares nodes and
relationships, variables carry identity across clauses, and the result is a
queryable graph.  This is a driver-side fixture builder for small graphs
(acceptance/TCK scenarios) — the data never exceeds a few hundred rows, so
building rows on the driver is the right trade-off.
"""
from __future__ import annotations

from pyspark.sql import types as T

from ..graph import PropertyGraph, prop_phys
from ..ir import expr as E
from ..parser import ast as A
from ..parser.parser import Parser


def _eval_literal(e):
    """Evaluate a property-value expression that must be a literal."""
    if isinstance(e, E.Lit):
        return e.value
    if isinstance(e, E.Neg):
        return -_eval_literal(e.child)
    if isinstance(e, E.ListLit):
        return [_eval_literal(x) for x in e.items]
    raise ValueError(f"CREATE property values must be literals, got {e!r}")


def _spark_type(value):
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, list):
        elem = None
        for v in value:
            if v is not None:
                elem = _spark_type(v)
                break
        return T.ArrayType(elem or T.StringType())
    raise ValueError(f"unsupported CREATE property value {value!r}")


def _merge_type(current, value, key):
    if value is None:
        return current
    t = _spark_type(value)
    if current is None or current == t:
        return t
    # int + float widen to double, like the reference's CypherValue coercion
    pair = {type(current), type(t)}
    if pair == {T.LongType, T.DoubleType}:
        return T.DoubleType()
    raise ValueError(f"conflicting types for property '{key}': {current} vs {t}")


def _build_df(spark, rows, key_cols):
    """rows: list of (fixed-cols dict, props dict).  Infers a schema over the
    union of property keys and pads missing values with null.  Property names
    colliding with the reserved id/source/target columns (ubiquitous in TCK
    fixtures, e.g. ``{id: 1}``) are stored escaped per the table contract."""
    reserved = set(key_cols)
    prop_types: dict = {}
    for _, props in rows:
        for k, v in props.items():
            prop_types[k] = _merge_type(prop_types.get(k), v, k)
    fields = [T.StructField(c, T.LongType(), False) for c in key_cols]
    fields += [T.StructField(prop_phys(k, reserved), t or T.StringType(), True)
               for k, t in prop_types.items()]
    schema = T.StructType(fields)
    data = []
    for fixed, props in rows:
        row = [fixed[c] for c in key_cols]
        for k, t in prop_types.items():
            v = props.get(k)
            if isinstance(t, T.DoubleType) and isinstance(v, int) \
                    and not isinstance(v, bool):
                v = float(v)
            row.append(v)
        data.append(tuple(row))
    return spark.createDataFrame(data, schema)


class _Node:
    __slots__ = ("id", "labels", "props")

    def __init__(self, nid):
        self.id = nid
        self.labels: set = set()
        self.props: dict = {}


def graph_from_create(spark, statement: str, name: str = "graph") -> PropertyGraph:
    """Parse one-or-more ``CREATE`` clauses into a :class:`PropertyGraph`.

    Supported element grammar (the subset the reference's fixture queries
    use): ``(var:Label1:Label2 {key: literal, ...})`` nodes, re-referenced by
    bare ``(var)``, and directed single-hop relationships
    ``-[:TYPE {..}]->`` / ``<-[:TYPE]-`` (multi-hop paths chain).
    """
    p = Parser(statement)
    parts = []
    if p.peek().kind == "EOF":
        raise ValueError("empty CREATE statement")
    while p.peek().kind != "EOF":
        if not p.at_kw("create"):
            p.err("expected CREATE")
        p.next()
        parts.append(p.parse_pattern_part())
        while p.opt_punct(","):
            parts.append(p.parse_pattern_part())

    nodes: dict = {}          # var -> _Node
    anon: list = []           # anonymous _Nodes
    rels: list = []           # (id, src_id, dst_id, type, props)
    counter = [0]

    def fresh_id() -> int:
        counter[0] += 1
        return counter[0]

    def node_for(np: A.NodePattern) -> _Node:
        if np.var is not None and np.var in nodes:
            n = nodes[np.var]
        else:
            n = _Node(fresh_id())
            if np.var is not None:
                nodes[np.var] = n
            else:
                anon.append(n)
        n.labels.update(np.labels)
        for k, e in np.props:
            n.props[k] = _eval_literal(e)
        return n

    for part in parts:
        els = part.elements
        prev = node_for(els[0])
        i = 1
        while i < len(els):
            rp, np = els[i], els[i + 1]
            nxt = node_for(np)
            if rp.var_length:
                raise ValueError("CREATE does not allow variable-length patterns")
            if rp.direction == "both":
                raise ValueError("CREATE requires a relationship direction")
            if len(rp.types) != 1:
                raise ValueError("CREATE requires exactly one relationship type")
            src, dst = (prev, nxt) if rp.direction == "out" else (nxt, prev)
            rels.append((fresh_id(), src.id, dst.id, rp.types[0],
                         {k: _eval_literal(e) for k, e in rp.props}))
            prev = nxt
            i += 2

    by_combo: dict = {}
    for n in list(nodes.values()) + anon:
        by_combo.setdefault(frozenset(n.labels), []).append(n)
    node_tables = {
        combo: _build_df(spark, [({"id": n.id}, n.props) for n in ns], ["id"])
        for combo, ns in by_combo.items()
    }
    by_type: dict = {}
    for rid, src, dst, rtype, props in rels:
        by_type.setdefault(rtype, []).append(
            ({"id": rid, "source": src, "target": dst}, props))
    rel_tables = {
        rtype: _build_df(spark, rows, ["id", "source", "target"])
        for rtype, rows in by_type.items()
    }
    return PropertyGraph(node_tables, rel_tables, name=name)
