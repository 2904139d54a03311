"""Procedure registry: ``CALL ns.proc(args) [YIELD ...]`` support.

Beyond-reference surface — the reference blacklists its entire
ProcedureCallAcceptance corpus (morpheus-tck failing_blacklist); here
procedures are first-class.  Two flavors:

- TABLE-backed (:func:`table_procedure`): the procedure is a relation
  mapping input-argument tuples to output rows — exactly the openCypher
  TCK's ``there exists a procedure`` stub shape, and the scalable path
  for in-query calls (a broadcast-able equi-join on the argument
  columns, no per-row Python).
- FUNCTION-backed (:func:`function_procedure`): a Python callable
  ``fn(spark, *args) -> DataFrame`` for constant-argument calls
  (standalone or cross-joined into the record stream).

Signatures use the TCK/Neo4j type notation::

    test.proc(name :: STRING?, id :: INTEGER?) :: (out :: FLOAT?)
    test.void.proc() :: VOID
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_SPARK_TYPES = {
    "INTEGER": "long", "FLOAT": "double", "NUMBER": "double",
    "STRING": "string", "BOOLEAN": "boolean", "ANY": None,
}


@dataclass(frozen=True)
class Procedure:
    name: str
    inputs: tuple            # ((name, TYPE), ...)
    outputs: tuple           # ((name, TYPE), ...); empty = VOID
    rows: tuple | None = None        # table-backed: (in... + out...) tuples
    fn: object | None = None         # function-backed
    graph: bool = False              # graph-backed: fn(session, graph, *a)
    defaults: tuple = ()             # ((name, value), ...) for the LAST
    #                                  len(defaults) inputs — callers may
    #                                  omit them (Neo4j-style optionals)

    def spark_schema(self) -> str | None:
        """Schema string for the (inputs + outputs) table; None when a
        column is ANY-typed (let createDataFrame infer)."""
        parts = []
        for nm, t in self.inputs + self.outputs:
            st = _SPARK_TYPES.get(t.upper())
            if st is None:
                return None
            parts.append(f"`{nm}` {st}")
        return ", ".join(parts)


_SIG_RE = re.compile(
    r"^\s*(?P<name>[A-Za-z_][\w.]*)\s*\((?P<ins>[^)]*)\)\s*"
    r"::\s*(?:\((?P<outs>[^)]*)\)|(?P<void>VOID))\s*$")
_FIELD_RE = re.compile(
    r"^\s*(?P<name>[A-Za-z_]\w*)\s*::\s*(?P<type>[A-Z]+)\??\s*$")


def parse_signature(sig: str) -> tuple[str, tuple, tuple]:
    """'ns.proc(a :: TYPE?, ...) :: (b :: TYPE?, ...)' ->
    (name, inputs, outputs).  ``:: VOID`` yields empty outputs."""
    m = _SIG_RE.match(sig.strip())
    if not m:
        raise ValueError(f"invalid procedure signature {sig!r}")

    def fields(text):
        out = []
        for part in (text or "").split(","):
            if not part.strip():
                continue
            fm = _FIELD_RE.match(part)
            if not fm:
                raise ValueError(f"invalid signature field {part!r}")
            out.append((fm.group("name"), fm.group("type")))
        return tuple(out)

    return m.group("name"), fields(m.group("ins")), \
        fields(m.group("outs")) if m.group("void") is None else ()


def table_procedure(sig: str, rows) -> Procedure:
    """Table-backed procedure from a TCK-style signature and a list of
    (input..., output...) value tuples."""
    name, ins, outs = parse_signature(sig)
    width = len(ins) + len(outs)
    types = [t.upper() for _, t in ins + outs]

    def coerce(v, t):
        # numeric-tower normalization: a NUMBER/FLOAT column holds doubles
        # even when the fixture row writes an integer literal
        if v is not None and t in ("FLOAT", "NUMBER") \
                and isinstance(v, int) and not isinstance(v, bool):
            return float(v)
        return v

    out_rows = []
    for r in rows:
        if len(r) != width:
            raise ValueError(
                f"procedure {name}: row {tuple(r)!r} has {len(r)} values, "
                f"signature declares {width}")
        out_rows.append(tuple(coerce(v, t) for v, t in zip(r, types)))
    return Procedure(name, ins, outs, rows=tuple(out_rows))


def function_procedure(sig: str, fn) -> Procedure:
    name, ins, outs = parse_signature(sig)
    return Procedure(name, ins, outs, fn=fn)


def graph_procedure(sig: str, fn, defaults: tuple = ()) -> Procedure:
    """GRAPH-backed procedure: ``fn(session, graph, *args) -> DataFrame``
    over the query's CURRENT graph (FROM GRAPH switches it like any other
    clause).  Same plan shape as function-backed — constant arguments,
    result cross-joined (standalone CALL: the result IS the record
    stream) — but the callable sees the graph, which is what a
    GDS-style algorithm surface needs.  ``defaults`` = ((name, value),
    ...) for trailing inputs the caller may omit; they must name the
    signature's last inputs in order."""
    name, ins, outs = parse_signature(sig)
    if defaults:
        tail = tuple(nm for nm, _ in ins[-len(defaults):])
        if tail != tuple(nm for nm, _ in defaults):
            raise ValueError(
                f"procedure {name}: defaults {defaults!r} must cover the "
                f"trailing inputs {tail!r} in order")
    return Procedure(name, ins, outs, fn=fn, graph=True,
                     defaults=tuple(defaults))


# --------------------------------------------------------------------------
# Built-in algo.* procedures: the functions/graph_algos.py +
# functions/components.py algorithms exposed to Cypher, Neo4j-GDS style
# (``CALL algo.pageRank(3, 0.85) YIELD node, rank``).  Beyond-reference:
# the reference's only algorithm story is a manual Cypher->RDD->GraphX
# round-trip in one example (GraphXPageRankExample.scala:55-75); here the
# algorithms are first-class DataFrame loops invocable from the query
# language itself, composable with WHERE/RETURN/aggregation post-YIELD.
# --------------------------------------------------------------------------

def graph_edges(graph, weight_prop: str | None = None):
    """(src, dst[, w]) union of every relationship table of ``graph``.

    With ``weight_prop``, only rel tables carrying that property
    contribute (missing everywhere = error), weights cast to double."""
    from pyspark.sql import functions as F
    from .graph import REL_SOURCE, REL_TARGET, prop_phys, _RESERVED_REL

    branches = []
    for rtype, df in sorted(graph.rel_tables.items()):
        cols = [F.col(REL_SOURCE).cast("long").alias("src"),
                F.col(REL_TARGET).cast("long").alias("dst")]
        if weight_prop is not None:
            phys = prop_phys(weight_prop, _RESERVED_REL)
            if phys not in df.columns:
                continue
            cols.append(F.col(phys).cast("double").alias("w"))
        branches.append(df.select(*cols))
    if not branches:
        raise ValueError(
            f"graph {graph.name!r} has no relationship table"
            + (f" with property {weight_prop!r}" if weight_prop else ""))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def builtin_graph_procedures() -> list:
    """The default ``algo.*`` registry (registered on every session)."""
    from pyspark.sql import functions as F

    def _sources(session, node):
        return session.spark.range(1).select(
            F.lit(int(node)).cast("long").alias("node"))

    def _pagerank(session, graph, iterations, damping, weight_property):
        from .functions.graph_algos import pagerank
        wp = str(weight_property or "")
        if wp:
            return pagerank(graph_edges(graph, weight_prop=wp),
                            iterations=int(iterations),
                            damping=float(damping), weight_col="w") \
                .select("node", "rank")
        return pagerank(graph_edges(graph), iterations=int(iterations),
                        damping=float(damping)) \
            .select("node", "rank")

    def _triangles(session, graph):
        from .functions.graph_algos import triangle_count
        return triangle_count(graph_edges(graph)) \
            .select(F.col("n_triangles").alias("triangles"))

    def _k_core(session, graph, k):
        from .functions.graph_algos import k_core
        return k_core(graph_edges(graph), k=int(k)) \
            .select("node", "degree")

    def _deg_hist(session, graph):
        from .functions.graph_algos import degree_histogram
        return degree_histogram(graph_edges(graph)) \
            .select("degree", "n_nodes")

    def _bfs(session, graph, source):
        from .functions.graph_algos import bfs_shortest_paths
        return bfs_shortest_paths(graph_edges(graph),
                                  _sources(session, source)) \
            .select("node", "dist")

    def _sssp(session, graph, source, weight_prop, max_iters):
        from .functions.graph_algos import weighted_shortest_paths
        return weighted_shortest_paths(
            graph_edges(graph, weight_prop=str(weight_prop)),
            _sources(session, source),
            max_iters=int(max_iters)).select("node", "cost")

    def _components(session, graph):
        from .functions.components import connected_components
        return connected_components(graph_edges(graph),
                                    a="src", b="dst") \
            .select("node", F.col("cc").alias("component"))

    def _label_prop(session, graph, iterations):
        from .functions.graph_algos import label_propagation
        return label_propagation(graph_edges(graph),
                                 iterations=int(iterations)) \
            .select("node", "community")

    def _hits(session, graph, iterations):
        from .functions.graph_algos import hits
        return hits(graph_edges(graph), iterations=int(iterations)) \
            .select("node", "hub", "authority")

    def _betweenness(session, graph, n_sources):
        from .functions.graph_algos import betweenness
        return betweenness(graph_edges(graph),
                           n_sources=int(n_sources)) \
            .select("node", "betweenness")

    def _scc(session, graph, max_rounds, fixpoint_iters):
        from .functions.graph_algos import strongly_connected_components
        return strongly_connected_components(
            graph_edges(graph), max_rounds=int(max_rounds),
            fixpoint_iters=int(fixpoint_iters)) \
            .select("node", "component")

    def _graph_stats(session, graph):
        from pyspark.sql import functions as F
        edges = graph_edges(graph)
        deg = (edges.select(F.col("src").alias("node"))
               .unionByName(edges.select(F.col("dst").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
        return (deg.agg(
            F.count(F.lit(1)).alias("nodes"),
            (F.sum("d") / 2).cast("long").alias("edges"),
            F.round(F.avg("d"), 6).alias("avg_degree"),
            F.max("d").alias("max_degree")))

    def _random_walks(session, graph, n_starts, length):
        from pyspark.sql import functions as F
        from .functions.graph_algos import random_walks
        edges = graph_edges(graph)
        starts = (edges.select(F.col("src").alias("node"))
                  .unionByName(edges.select(F.col("dst").alias("node")))
                  .dropDuplicates(["node"])
                  .orderBy(F.md5(F.col("node").cast("string")))
                  .limit(int(n_starts)))
        return random_walks(edges, starts, length=int(length)) \
            .select("walk", "step", "node")

    def _node2vec(session, graph, n_starts, length, p, q):
        from pyspark.sql import functions as F
        from .functions.graph_algos import node2vec_walks
        edges = graph_edges(graph)
        starts = (edges.select(F.col("src").alias("node"))
                  .unionByName(edges.select(F.col("dst").alias("node")))
                  .dropDuplicates(["node"])
                  .orderBy(F.md5(F.col("node").cast("string")))
                  .limit(int(n_starts)))
        return node2vec_walks(edges, starts, length=int(length),
                              p=str(p), q=str(q)) \
            .select("walk", "step", "node")

    def _mis(session, graph, rounds):
        from .functions.graph_algos import maximal_independent_set
        return maximal_independent_set(graph_edges(graph),
                                       rounds=int(rounds)) \
            .select("node", "in_mis")

    def _louvain(session, graph, rounds, weight_property):
        from .functions.graph_algos import louvain
        wp = str(weight_property or "")
        if wp:
            # graph properties are double-typed; the exact-gain path
            # needs integers, so verify integralness (one cheap probe)
            # instead of silently truncating
            ed = graph_edges(graph, weight_prop=wp)
            if not ed.where(F.col("w") != F.floor(F.col("w"))) \
                    .isEmpty():
                raise ValueError(
                    f"louvain: weightProperty {wp!r} has non-integral "
                    "values; quantize to a lattice first (exact int64 "
                    "gains are the determinism contract)")
            return louvain(ed.withColumn("w", F.col("w").cast("long")),
                           rounds=int(rounds), weight_col="w") \
                .select("node", "community")
        return louvain(graph_edges(graph), rounds=int(rounds)) \
            .select("node", "community")

    def _k_truss(session, graph, k, rounds):
        from .functions.graph_algos import k_truss
        return k_truss(graph_edges(graph), k=int(k),
                       rounds=int(rounds)) \
            .select("src", "dst", "support")

    def _local_clustering(session, graph):
        from .functions.graph_algos import local_clustering
        return local_clustering(graph_edges(graph)) \
            .select("node", "triangles", "degree", "coeff")

    def _fastrp(session, graph, dims, iterations):
        from .functions.graph_algos import fastrp_embeddings
        return (fastrp_embeddings(graph_edges(graph), dims=int(dims),
                                  iterations=int(iterations))
                .select("node", F.posexplode("emb").alias("dim", "value")))

    def _closeness(session, graph, n_sources):
        from .functions.graph_algos import closeness_centrality
        return closeness_centrality(graph_edges(graph),
                                    n_sources=int(n_sources)) \
            .select("node", "closeness")

    return [
        graph_procedure(
            "algo.pageRank(iterations :: INTEGER?, damping :: FLOAT?, "
            "weightProperty :: STRING?) "
            ":: (node :: INTEGER?, rank :: FLOAT?)", _pagerank,
            defaults=(("iterations", 10), ("damping", 0.85),
                      ("weightProperty", ""))),
        graph_procedure(
            "algo.triangleCount() :: (triangles :: INTEGER?)", _triangles),
        graph_procedure(
            "algo.kCore(k :: INTEGER?) "
            ":: (node :: INTEGER?, degree :: INTEGER?)", _k_core,
            defaults=(("k", 3),)),
        graph_procedure(
            "algo.degreeHistogram() "
            ":: (degree :: INTEGER?, n_nodes :: INTEGER?)", _deg_hist),
        graph_procedure(
            "algo.bfs(source :: INTEGER?) "
            ":: (node :: INTEGER?, dist :: INTEGER?)", _bfs),
        graph_procedure(
            "algo.sssp(source :: INTEGER?, weightProperty :: STRING?, "
            "maxIters :: INTEGER?) "
            ":: (node :: INTEGER?, cost :: FLOAT?)", _sssp,
            defaults=(("maxIters", 20),)),
        graph_procedure(
            "algo.connectedComponents() "
            ":: (node :: INTEGER?, component :: INTEGER?)", _components),
        graph_procedure(
            "algo.labelPropagation(iterations :: INTEGER?) "
            ":: (node :: INTEGER?, community :: INTEGER?)", _label_prop,
            defaults=(("iterations", 5),)),
        graph_procedure(
            "algo.hits(iterations :: INTEGER?) "
            ":: (node :: INTEGER?, hub :: FLOAT?, authority :: FLOAT?)",
            _hits, defaults=(("iterations", 5),)),
        graph_procedure(
            "algo.betweenness(nSources :: INTEGER?) "
            ":: (node :: INTEGER?, betweenness :: FLOAT?)", _betweenness,
            defaults=(("nSources", 16),)),
        graph_procedure(
            "algo.scc(maxRounds :: INTEGER?, fixpointIters :: INTEGER?) "
            ":: (node :: INTEGER?, component :: INTEGER?)", _scc,
            defaults=(("maxRounds", 8), ("fixpointIters", 256))),
        graph_procedure(
            "algo.closeness(nSources :: INTEGER?) "
            ":: (node :: INTEGER?, closeness :: FLOAT?)", _closeness,
            defaults=(("nSources", 16),)),
        graph_procedure(
            "algo.kTruss(k :: INTEGER?, rounds :: INTEGER?) "
            ":: (src :: INTEGER?, dst :: INTEGER?, "
            "support :: INTEGER?)", _k_truss,
            defaults=(("k", 4), ("rounds", 8))),
        graph_procedure(
            "algo.randomWalks(nStarts :: INTEGER?, length :: INTEGER?) "
            ":: (walk :: INTEGER?, step :: INTEGER?, "
            "node :: INTEGER?)", _random_walks,
            defaults=(("nStarts", 16), ("length", 5))),
        graph_procedure(
            "algo.node2vecWalks(nStarts :: INTEGER?, length :: INTEGER?, "
            "p :: NUMBER?, q :: NUMBER?) "
            ":: (walk :: INTEGER?, step :: INTEGER?, "
            "node :: INTEGER?)", _node2vec,
            defaults=(("nStarts", 16), ("length", 5), ("p", 1), ("q", 1))),
        graph_procedure(
            "algo.mis(rounds :: INTEGER?) "
            ":: (node :: INTEGER?, in_mis :: BOOLEAN?)", _mis,
            defaults=(("rounds", 16),)),
        graph_procedure(
            "algo.louvain(rounds :: INTEGER?, "
            "weightProperty :: STRING?) "
            ":: (node :: INTEGER?, community :: INTEGER?)", _louvain,
            defaults=(("rounds", 8), ("weightProperty", ""))),
        graph_procedure(
            "algo.localClustering() "
            ":: (node :: INTEGER?, triangles :: INTEGER?, "
            "degree :: INTEGER?, coeff :: FLOAT?)", _local_clustering),
        graph_procedure(
            "algo.fastRP(dims :: INTEGER?, iterations :: INTEGER?) "
            ":: (node :: INTEGER?, dim :: INTEGER?, "
            "value :: INTEGER?)", _fastrp,
            defaults=(("dims", 16), ("iterations", 3))),
        graph_procedure(
            "algo.graphStats() "
            ":: (nodes :: INTEGER?, edges :: INTEGER?, "
            "avg_degree :: FLOAT?, max_degree :: INTEGER?)",
            _graph_stats),
    ]
