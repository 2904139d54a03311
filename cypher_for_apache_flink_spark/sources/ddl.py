"""Graph DDL: a small language mapping existing SQL views/tables onto a
property graph.

Reference: ``graph-ddl`` module — ``GraphDdl.scala:42`` (NodeToViewMapping
:306, EdgeToViewMapping with explicit ``JOIN ON`` key columns :332-360),
language shape per ``GraphDdlTest.scala:41-65``:

    SET SCHEMA ds.db

    CREATE GRAPH TYPE fooSchema (
      Person ( name STRING, age INTEGER ),
      READS  ( rating FLOAT ),
      (Person),
      (Person)-[READS]->(Book)
    )

    CREATE GRAPH fooGraph OF fooSchema (
      (Person) FROM personView ( person_name AS name ) KEY (person_id),
      (Person)-[READS]->(Book)
        FROM readsView e
          START NODES (Person) FROM personView p JOIN ON p.person_id = e.person
          END NODES   (Book)   FROM bookView   b JOIN ON e.book = b.book_id
    )

Spark-first id scheme (SURVEY §1.6): node id = ``xxhash64(label, key
columns)`` (declared ``KEY``, else all view columns plus the view name), a
pure column expression — no binary encoding, no driver-side id assignment.
Relationship endpoints resolve by joining the edge view to the node views on
the declared ``JOIN ON`` columns and reusing the node id expression, exactly
the reference's EdgeToViewMapping semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import PropertyGraph


class DdlError(Exception):
    pass


_TOKEN = re.compile(r"""
    (?P<WS>\s+|--[^\n]*)
  | (?P<PUNCT><=|>=|<>|\)-\[|\]->\(|[(),.=\[\]-])
  | (?P<IDENT>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<NUM>\d+)
""", re.VERBOSE)

_TYPES = {
    "string": "string", "integer": "bigint", "float": "double",
    "boolean": "boolean", "date": "date", "datetime": "timestamp",
    "timestamp": "timestamp",
}


def _tokenize(src: str):
    out, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise DdlError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        if m.lastgroup != "WS":
            out.append(m.group())
    out.append("<eof>")
    return out


@dataclass
class NodeMapping:
    label: str
    view: str
    alias: str | None = None
    renames: dict = field(default_factory=dict)   # view col -> property
    key: tuple = ()


@dataclass
class EndpointMapping:
    label: str
    view: str
    alias: str
    joins: tuple = ()        # ((node_col, edge_col), ...)


@dataclass
class EdgeMapping:
    rel_type: str
    src_label: str
    dst_label: str
    view: str
    alias: str
    renames: dict = field(default_factory=dict)
    start: EndpointMapping | None = None
    end: EndpointMapping | None = None


@dataclass
class GraphDdl:
    element_types: dict = field(default_factory=dict)  # name -> {prop: dtype}
    node_types: set = field(default_factory=set)
    patterns: set = field(default_factory=set)         # (src, rel, dst)
    nodes: list = field(default_factory=list)          # [NodeMapping]
    edges: list = field(default_factory=list)          # [EdgeMapping]
    graph_name: str = "graph"
    set_schema: tuple | None = None


class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self, ahead=0):
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def kw(self, *words) -> bool:
        return self.peek().lower() in words

    def eat_kw(self, word):
        if not self.kw(word):
            raise DdlError(f"expected {word.upper()}, got {self.peek()!r}")
        return self.next()

    def eat(self, tok):
        if self.peek() != tok:
            raise DdlError(f"expected {tok!r}, got {self.peek()!r}")
        return self.next()

    def opt(self, tok) -> bool:
        if self.peek() == tok:
            self.next()
            return True
        return False

    # ------------------------------------------------------------------
    def parse(self) -> GraphDdl:
        ddl = GraphDdl()
        while self.peek() != "<eof>":
            if self.kw("set"):
                self.next()
                self.eat_kw("schema")
                ds = self.next()
                parts = [ds]
                while self.opt("."):
                    parts.append(self.next())
                ddl.set_schema = tuple(parts)
            elif self.kw("create"):
                self.next()
                self.eat_kw("graph")
                if self.kw("type"):
                    self.next()
                    self.next()  # type name (informational)
                    self.parse_graph_type(ddl)
                else:
                    ddl.graph_name = self.next()
                    if self.kw("of"):
                        self.next()
                        self.next()  # schema name (informational)
                    self.parse_graph(ddl)
            else:
                raise DdlError(f"expected SET or CREATE, got {self.peek()!r}")
        return ddl

    def parse_graph_type(self, ddl: GraphDdl):
        self.eat("(")
        while not self.opt(")"):
            if self.peek() == "(":
                # (Node) or (A)-[R]->(B) pattern
                self.eat("(")
                a = self.next()
                if self.opt(")"):
                    ddl.node_types.add(a)
                    if self.peek() == "-":   # (A)-[R]->(B) split-token form
                        self.eat("-")
                        self.eat("[")
                        r = self.next()
                        self.eat("]->(")
                        b = self.next()
                        self.eat(")")
                        ddl.patterns.add((a, r, b))
                elif self.peek() == ")-[":
                    self.next()
                    r = self.next()
                    self.eat("]->(")
                    b = self.next()
                    self.eat(")")
                    ddl.node_types.add(a)
                    ddl.node_types.add(b)
                    ddl.patterns.add((a, r, b))
            else:
                # ElementType ( prop TYPE, ... )
                name = self.next()
                props = {}
                if self.opt("("):
                    while not self.opt(")"):
                        p = self.next()
                        t = self.next().lower()
                        if t not in _TYPES:
                            raise DdlError(f"unknown property type {t!r}")
                        props[p] = _TYPES[t]
                        self.opt(",")
                ddl.element_types[name] = props
            self.opt(",")

    def parse_graph(self, ddl: GraphDdl):
        self.eat("(")
        while not self.opt(")"):
            self.eat("(")
            a = self.next()
            if self.opt(")"):
                self.parse_node_mapping(ddl, a)
            elif self.peek() == ")-[":
                self.next()
                r = self.next()
                self.eat("]->(")
                b = self.next()
                self.eat(")")
                self.parse_edge_mapping(ddl, a, r, b)
            else:
                raise DdlError(f"bad mapping near {self.peek()!r}")
            self.opt(",")

    def parse_node_mapping(self, ddl: GraphDdl, label: str):
        while self.kw("from"):
            self.next()
            view = self.next()
            alias = None
            if self.peek() not in ("(", ",", ")", "<eof>") and \
                    not self.kw("from", "key"):
                alias = self.next()
            renames = {}
            if self.opt("("):
                while not self.opt(")"):
                    src = self.next()
                    self.eat_kw("as")
                    renames[src] = self.next()
                    self.opt(",")
            key = ()
            if self.kw("key"):
                self.next()
                self.eat("(")
                cols = []
                while not self.opt(")"):
                    cols.append(self.next())
                    self.opt(",")
                key = tuple(cols)
            ddl.nodes.append(NodeMapping(label, view, alias, renames, key))

    def parse_edge_mapping(self, ddl: GraphDdl, a: str, r: str, b: str):
        while self.kw("from"):
            self.next()
            view = self.next()
            alias = self.next()
            renames = {}
            if self.opt("("):
                while not self.opt(")"):
                    src = self.next()
                    self.eat_kw("as")
                    renames[src] = self.next()
                    self.opt(",")
            em = EdgeMapping(r, a, b, view, alias, renames)
            for which in ("start", "end"):
                self.eat_kw(which)
                self.eat_kw("nodes")
                self.eat("(")
                lbl = self.next()
                self.eat(")")
                self.eat_kw("from")
                nview = self.next()
                nalias = self.next()
                self.eat_kw("join")
                self.eat_kw("on")
                joins = []
                while True:
                    t1 = self.next()
                    self.eat(".")
                    c1 = self.next()
                    self.eat("=")
                    t2 = self.next()
                    self.eat(".")
                    c2 = self.next()
                    if t1 == nalias:
                        joins.append((c1, c2))
                    elif t2 == nalias:
                        joins.append((c2, c1))
                    else:
                        raise DdlError(f"JOIN ON aliases {t1}/{t2} do not "
                                       f"match node alias {nalias}")
                    if self.kw("and"):
                        self.next()
                        continue
                    break
                ep = EndpointMapping(lbl, nview, nalias, tuple(joins))
                if which == "start":
                    em.start = ep
                else:
                    em.end = ep
            ddl.edges.append(em)


def parse_ddl(src: str) -> GraphDdl:
    return _Parser(src).parse()


# ---------------------------------------------------------------------------
# DDL -> PropertyGraph
# ---------------------------------------------------------------------------

def _node_id_expr(nm: NodeMapping, df: DataFrame):
    """Deterministic 64-bit node id: xxhash64 over label + key columns.
    Without a declared KEY, all view columns plus the view name participate
    (rows from different views stay distinct, like the reference's
    per-NodeViewKey identity)."""
    if nm.key:
        cols = [F.col(c) for c in nm.key]
        return F.xxhash64(F.lit(nm.label), *cols)
    return F.xxhash64(F.lit(nm.label), F.lit(nm.view),
                      *[F.col(c) for c in df.columns])


def graph_from_jdbc(spark: SparkSession, ddl: str | GraphDdl, url: str,
                    properties: dict | None = None) -> PropertyGraph:
    """Graph DDL over JDBC tables (reference: SqlPropertyGraphDataSource):
    every view name referenced by the DDL loads via ``spark.read.jdbc``.
    Thin adapter over :func:`graph_from_ddl` — semantics identical to the
    in-memory-views path, which is what the tests cover."""
    parsed = parse_ddl(ddl) if isinstance(ddl, str) else ddl
    names = {nm.view for nm in parsed.nodes} | {em.view for em in parsed.edges}
    for em in parsed.edges:
        names |= {em.start.view, em.end.view}
    views = {n: spark.read.jdbc(url, n, properties=properties or {})
             for n in names}
    return graph_from_ddl(spark, parsed, views)


def graph_from_ddl(spark: SparkSession, ddl: str | GraphDdl,
                   views: dict | None = None) -> PropertyGraph:
    """Materialise the DDL's graph over DataFrame views.

    ``views`` maps view names to DataFrames; unlisted names fall back to
    ``spark.table`` (optionally qualified by SET SCHEMA), so warehouse
    tables work unchanged.
    """
    if isinstance(ddl, str):
        ddl = parse_ddl(ddl)
    views = views or {}

    def view(name: str) -> DataFrame:
        if name in views:
            return views[name]
        if ddl.set_schema and len(ddl.set_schema) > 1:
            # SET SCHEMA dataSource.database -> database-qualified table
            return spark.table(f"{ddl.set_schema[-1]}.{name}")
        return spark.table(name)

    # -- nodes ----------------------------------------------------------
    node_tables: dict = {}
    node_id_exprs: dict = {}     # (label, view) -> id Column factory
    for nm in ddl.nodes:
        df = view(nm.view)
        props = ddl.element_types.get(nm.label, {})
        id_col = _node_id_expr(nm, df)
        node_id_exprs[(nm.label, nm.view)] = nm
        cols = [id_col.alias("id")]
        rename_inv = dict(nm.renames)   # view col -> prop
        for prop, dtype in props.items():
            src = next((v for v, p in rename_inv.items() if p == prop), prop)
            if src in df.columns:
                cols.append(F.col(src).cast(dtype).alias(prop))
            else:
                cols.append(F.lit(None).cast(dtype).alias(prop))
        ndf = df.select(*cols)
        combo = frozenset({nm.label})
        node_tables[combo] = ndf if combo not in node_tables else \
            node_tables[combo].unionByName(ndf)

    # -- edges ----------------------------------------------------------
    rel_tables: dict = {}
    for i, em in enumerate(ddl.edges):
        edf = view(em.view)
        props = ddl.element_types.get(em.rel_type, {})

        def endpoint_id(ep: EndpointMapping, out_name: str, edf_now):
            nm = node_id_exprs.get((ep.label, ep.view))
            if nm is None:
                raise DdlError(f"endpoint ({ep.label}) FROM {ep.view} has no "
                               f"matching node mapping")
            ndf = view(ep.view)
            keep = {j[0] for j in ep.joins}
            ndf_small = ndf.select(
                _node_id_expr(nm, ndf).alias(out_name),
                *[F.col(c).alias(f"__j_{out_name}_{c}") for c in keep])
            cond = None
            for ncol, ecol in ep.joins:
                term = F.col(f"__j_{out_name}_{ncol}") == edf_now[ecol]
                cond = term if cond is None else (cond & term)
            joined = edf_now.join(ndf_small, cond, "inner")
            return joined.drop(*[f"__j_{out_name}_{c}" for c in keep])

        work = endpoint_id(em.start, "__src", edf)
        work = endpoint_id(em.end, "__dst", work)
        # Edge id: xxhash64 over type + the edge view row + endpoints.
        id_col = F.xxhash64(F.lit(em.rel_type), F.lit(em.view),
                            F.col("__src"), F.col("__dst"),
                            *[F.col(c) for c in edf.columns])
        cols = [id_col.alias("id"),
                F.col("__src").alias("source"),
                F.col("__dst").alias("target")]
        for prop, dtype in props.items():
            src = next((v for v, p in em.renames.items() if p == prop), prop)
            if src in edf.columns:
                cols.append(F.col(src).cast(dtype).alias(prop))
            else:
                cols.append(F.lit(None).cast(dtype).alias(prop))
        rdf = work.select(*cols)
        rel_tables[em.rel_type] = rdf if em.rel_type not in rel_tables else \
            rel_tables[em.rel_type].unionByName(rdf)

    return PropertyGraph(node_tables, rel_tables, name=ddl.graph_name)
