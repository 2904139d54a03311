"""Records = RecordHeader + DataFrame, plus the physical operator helpers.

This is the PySpark realisation of the reference's backend table contract
(okapi-relational/.../api/table/Table.scala:43-177 — 15 ops) and scan/join
machinery (ScanGraph.scala:59-105, RelationalPlanner.scala:434-563).  Each
helper transforms (header, DataFrame) pairs; nothing here executes — the
DataFrame stays lazy until the session collects (SURVEY §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..graph import (NODE_ID, PropertyGraph, REL_ID, REL_SOURCE, REL_TARGET,
                     _RESERVED_NODE, _RESERVED_REL, prop_phys)
from ..ir import expr as E
from .header import Header, TypeOf, column_name, type_column_name

# Graph-prefix bits reserved in the high end of the 64-bit id space
# (Spark-first replacement for the reference's byte-prefixed binary ids:
# EncodeLong.scala:40, AddPrefix.scala — SURVEY §1.6).
PREFIX_SHIFT = 48

# Scans whose declared row count is below this get an explicit broadcast
# hint (well under the default 10 MB autoBroadcastJoinThreshold for
# dimension-shaped tables).
BROADCAST_ROW_THRESHOLD = 100_000


class Records:
    """A table of records with a header describing its columns."""

    __slots__ = ("session", "header", "df")

    def __init__(self, session, header: Header, df: DataFrame):
        self.session = session
        self.header = header
        self.df = df

    def with_df(self, df: DataFrame) -> "Records":
        return Records(self.session, self.header, df)

    def with_header(self, header: Header) -> "Records":
        return Records(self.session, header, self.df)

    def cache(self) -> "Records":
        return self.with_df(self.df.cache())


# ---------------------------------------------------------------------------
# Scans (reference: ScanGraph.scanOperator ScanGraph.scala:59-86 with
# alignment RelationalPlanner.alignExpressions :447-523)
# ---------------------------------------------------------------------------

def _parse_dtype(simple: str):
    return T._parse_datatype_string(simple)


def scan_nodes(session, graph: PropertyGraph, var_name: str,
               labels: frozenset = frozenset()) -> Records:
    """Union-aligned scan of all node tables whose label combo ⊇ labels.

    Each branch projects:  id  →  var column,  literal true/false per label,
    null-filled property columns — so Catalyst sees a ``Union`` of parquet
    scans with pruned columns; a label predicate on top folds literal-false
    branches away entirely (the planner also prunes here, which is the
    graph-side partition pruning of ScanGraph.scansForType).
    """
    var = E.NodeVar(var_name)
    combos = graph.schema.combos_with(labels)
    all_labels = sorted(set().union(*combos)) if combos else sorted(labels)
    props = graph.schema.union_props(combos)

    header = Header({var: column_name(var)})
    for lbl in all_labels:
        e = E.HasLabel(var, lbl)
        header = header.added(e)
    for key in sorted(props):
        e = E.Property(var, key)
        header = header.added(e)

    if not combos:
        return empty_records(session, header)

    branches = []
    for combo in combos:
        df = graph.node_tables[combo]
        cols = [F.col(NODE_ID).cast("long").alias(column_name(var))]
        for lbl in all_labels:
            cols.append(F.lit(lbl in combo).alias(column_name(E.HasLabel(var, lbl))))
        combo_props = graph.schema.node_props[combo]
        for key in sorted(props):
            cname = column_name(E.Property(var, key))
            if key in combo_props:
                cols.append(F.col(prop_phys(key, _RESERVED_NODE))
                            .cast(_parse_dtype(props[key])).alias(cname))
            else:
                cols.append(F.lit(None).cast(_parse_dtype(props[key])).alias(cname))
        branches.append(df.select(*cols))

    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    known = [graph.stats.get(c) for c in combos]
    if known and all(n is not None for n in known) and \
            sum(known) <= BROADCAST_ROW_THRESHOLD:
        out = F.broadcast(out)
    return Records(session, header, out)


def scan_rels(session, graph: PropertyGraph, var_name: str,
              types: tuple = ()) -> Records:
    """Union-aligned scan of relationship tables (all types, or the given
    subset — type pruning happens here, not in a filter)."""
    var = E.RelVar(var_name)
    rtypes = sorted(types) if types else sorted(graph.rel_tables)
    rtypes = [t for t in rtypes if t in graph.rel_tables]

    props: dict = {}
    for t in rtypes:
        for k, dt in graph.schema.rel_props[t].items():
            props.setdefault(k, dt)

    header = Header({var: column_name(var)})
    header = header.added(E.StartNode(var))
    header = header.added(E.EndNode(var))
    header = header.added(TypeOf(var), type_column_name(var))
    for key in sorted(props):
        header = header.added(E.Property(var, key))

    if not rtypes:
        return empty_records(session, header)

    branches = []
    for t in rtypes:
        df = graph.rel_tables[t]
        cols = [
            F.col(REL_ID).cast("long").alias(column_name(var)),
            F.col(REL_SOURCE).cast("long").alias(column_name(E.StartNode(var))),
            F.col(REL_TARGET).cast("long").alias(column_name(E.EndNode(var))),
            F.lit(t).alias(type_column_name(var)),
        ]
        t_props = graph.schema.rel_props[t]
        for key in sorted(props):
            cname = column_name(E.Property(var, key))
            if key in t_props:
                cols.append(F.col(prop_phys(key, _RESERVED_REL))
                            .cast(_parse_dtype(props[key])).alias(cname))
            else:
                cols.append(F.lit(None).cast(_parse_dtype(props[key])).alias(cname))
        branches.append(df.select(*cols))

    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    known = [graph.stats.get(t) for t in rtypes]
    if known and all(n is not None for n in known) and \
            sum(known) <= BROADCAST_ROW_THRESHOLD:
        out = F.broadcast(out)
    return Records(session, header, out)


def scan_pattern(session, graph: PropertyGraph, rel_var_name: str,
                 rel_type: str, dst_var_name: str) -> Records:
    """Scan a materialized triplet table: relationship + destination node in
    one read, no join (reference: replaceScansWithRecognizedPatterns /
    TripletPattern — Pattern.scala:182, LogicalOptimizer.scala:67-134)."""
    df, dst_combo = graph.pattern_tables[rel_type]
    rvar = E.RelVar(rel_var_name)
    dvar = E.NodeVar(dst_var_name)

    rel_props = graph.schema.rel_props[rel_type]
    dst_props = graph.schema.union_props([dst_combo])

    header = Header({rvar: column_name(rvar)})
    header = header.added(E.StartNode(rvar))
    header = header.added(E.EndNode(rvar))
    header = header.added(TypeOf(rvar), type_column_name(rvar))
    cols = [
        F.col(REL_ID).cast("long").alias(column_name(rvar)),
        F.col(REL_SOURCE).cast("long").alias(column_name(E.StartNode(rvar))),
        F.col(REL_TARGET).cast("long").alias(column_name(E.EndNode(rvar))),
        F.lit(rel_type).alias(type_column_name(rvar)),
    ]
    for key in sorted(rel_props):
        e = E.Property(rvar, key)
        header = header.added(e)
        cols.append(F.col(prop_phys(key, _RESERVED_REL)).alias(column_name(e)))
    # destination node rides along: id = target, labels literal, props t_*
    header = header.added(dvar, column_name(E.EndNode(rvar)))
    for lbl in sorted(dst_combo):
        e = E.HasLabel(dvar, lbl)
        header = header.added(e)
        cols.append(F.lit(True).alias(column_name(e)))
    for key in sorted(dst_props):
        e = E.Property(dvar, key)
        header = header.added(e)
        cols.append(F.col("t_" + prop_phys(key, _RESERVED_NODE))
                    .alias(column_name(e)))
    return Records(session, header, df.select(*cols))


def empty_records(session, header: Header) -> Records:
    # column types match what a non-empty scan would produce: the rel-type
    # column is a string, label flags are boolean, ids are long — so unions
    # against created/matched rows (mutation MERGE) align without casts
    by_col: dict = {}
    for e, c in header.mapping.items():
        if isinstance(e, TypeOf):
            by_col[c] = T.StringType()
        elif isinstance(e, E.HasLabel):
            by_col.setdefault(c, T.BooleanType())
    fields = [T.StructField(c, by_col.get(c, T.LongType()))
              for c in header.columns()]
    df = session.spark.createDataFrame([], T.StructType(fields))
    return Records(session, header, df)


# ---------------------------------------------------------------------------
# Join / union (reference: RelationalOperator.Join :423, withDisjointColumnNames
# RelationalPlanner.scala:524-545, TabularUnionAll :451)
# ---------------------------------------------------------------------------

def join_records(lhs: Records, rhs: Records, pairs, how: str = "inner",
                 extra_cond=None) -> Records:
    """Join on (lhs_expr, rhs_expr) pairs.  Always rename-before-join so the
    two plans never share column names (Catalyst ambiguity discipline —
    SURVEY §4.3); rhs join columns are dropped afterwards and their exprs
    remapped onto the lhs columns.

    ``extra_cond(merged_header) -> Column`` contributes additional join
    predicates compiled against the post-rename merged header — used for
    correlated OPTIONAL MATCH predicates, which must null-pad (join
    condition) rather than drop rows (post-join filter)."""
    lcols = [lhs.header.col(le) for le, _ in pairs]
    rcols = [rhs.header.col(re_) for _, re_ in pairs]

    # Disjointness: rename every rhs column that collides with an lhs column.
    lset = set(lhs.df.columns)
    rename = {}
    for c in rhs.df.columns:
        if c in lset:
            rename[c] = f"__r_{c}"
    rdf = rhs.df
    if rename:
        rdf = rdf.select(*[F.col(c).alias(rename.get(c, c)) for c in rhs.df.columns])
    rheader = rhs.header.renamed(rename)

    if pairs or extra_cond is not None:
        cond = None
        for lc, rc in zip(lcols, rcols):
            rc2 = rename.get(rc, rc)
            term = F.col(lc) == F.col(rc2)
            cond = term if cond is None else (cond & term)
        if extra_cond is not None:
            # lhs entries win key collisions (shared vars resolve left)
            merged = Header({**rheader.mapping, **lhs.header.mapping})
            ec = extra_cond(merged)
            cond = ec if cond is None else (cond & ec)
        joined = lhs.df.join(rdf, cond, how)
    else:
        joined = lhs.df.crossJoin(rdf) if how == "cross" else \
            lhs.df.join(rdf, F.lit(True), how)

    if how in ("left_semi", "left_anti"):
        return Records(lhs.session, lhs.header, joined)

    # Drop rhs join columns; remap their exprs (and aliases of them) to lhs.
    merged = dict(lhs.header.mapping)
    rjoin_cols = {rename.get(c, c): lhs.header.col(le)
                  for (le, _), c in zip(pairs, rcols)}
    for e, c in rheader.mapping.items():
        if c in rjoin_cols:
            merged.setdefault(e, rjoin_cols[c])
        else:
            merged.setdefault(e, c)
    joined = joined.drop(*rjoin_cols.keys())
    # Orphaned rhs columns: physical rhs columns whose every expr already
    # resolved to an lhs column (shared variables in OPTIONAL MATCH / EXISTS
    # — the rhs copy of the element's sub-columns is redundant).
    used = set(merged.values())
    rhs_final = {rename.get(c, c) for c in rhs.df.columns} - set(rjoin_cols)
    orphans = [c for c in rhs_final if c not in used]
    if orphans:
        joined = joined.drop(*orphans)
    return Records(lhs.session, Header(merged), joined)


def union_records(lhs: Records, rhs: Records) -> Records:
    """UNION ALL with by-name alignment (RelationalOperator.scala:474-480).
    Headers must describe the same expression set."""
    lcols = set(lhs.df.columns)
    rcols = set(rhs.df.columns)
    if lcols != rcols:
        # Align rhs physical names via shared exprs.
        rename = {}
        for e, c in rhs.header.mapping.items():
            lc = lhs.header.get(e)
            if lc is not None and lc != c:
                rename[c] = lc
        rdf = rhs.df.select(*[F.col(c).alias(rename.get(c, c))
                              for c in rhs.df.columns])
    else:
        rdf = rhs.df
    return lhs.with_df(lhs.df.unionByName(rdf.select(*lhs.df.columns)))


# ---------------------------------------------------------------------------
# Graph union id-prefixing (reference: PrefixId / AddPrefix — SURVEY §1.6)
# ---------------------------------------------------------------------------

def prefixed_graph(g: PropertyGraph, index: int, total: int) -> PropertyGraph:
    if total <= 1:
        return g
    shift = F.lit(index << PREFIX_SHIFT).cast("long")

    def prefix(df, cols):
        out = df
        for c in cols:
            out = out.withColumn(c, (F.col(c).cast("long") + shift))
        return out

    nodes = {combo: prefix(df, [NODE_ID]) for combo, df in g.node_tables.items()}
    rels = {t: prefix(df, [REL_ID, REL_SOURCE, REL_TARGET])
            for t, df in g.rel_tables.items()}
    return PropertyGraph(nodes, rels, name=f"{g.name}_p{index}")
