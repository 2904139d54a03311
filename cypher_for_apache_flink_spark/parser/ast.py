"""Parser AST for the supported openCypher subset.

All nodes are frozen/hashable so pattern fragments can be embedded in the
expression IR (PatternPredicate).  The clause inventory matches the
reference's IR blocks (okapi-ir/.../api/block/Block.scala:34-43: SourceBlock,
MatchBlock, ProjectBlock, AggregationBlock, OrderAndSliceBlock, UnwindBlock,
ResultBlock).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class NodePattern:
    # (fields below; ``label_expr`` — when set — is a GQL label-expression
    # tree ('lbl', name) / ('not', t) / ('and'|'or', t1, t2) that planned
    # MATCHes translate into a HasLabel predicate; plain conjunctions stay
    # in ``labels`` for the label-pruned scan fast path)
    var: object          # str | None
    labels: tuple = ()
    props: tuple = ()    # ((key, Expr), ...)
    base: object = None  # str | None — CONSTRUCT ``v COPY OF base``
    label_expr: object = None
    where: object = None  # Expr | None — inline WHERE (Cypher 5)


@dataclass(frozen=True)
class RelPattern:
    var: object          # str | None
    types: tuple = ()
    direction: str = "out"   # 'out' | 'in' | 'both'
    props: tuple = ()
    var_length: bool = False
    lo: object = None        # int | None
    hi: object = None        # int | None
    base: object = None      # str | None — CONSTRUCT ``r COPY OF base``
    where: object = None     # Expr | None — inline WHERE (Cypher 5)


@dataclass(frozen=True)
class PatternPart:
    """Alternating (NodePattern, RelPattern, NodePattern, ...)."""
    elements: tuple
    path_var: object = None   # str | None (named paths — unsupported, reserved)
    shortest: object = None   # None | 'single' | 'all' — shortestPath()/
    #                           allShortestPaths() wrapper on the pattern

    @property
    def nodes(self):
        return self.elements[0::2]

    @property
    def rels(self):
        return self.elements[1::2]


@dataclass(frozen=True)
class MatchClause:
    patterns: tuple          # (PatternPart, ...)
    where: object = None     # Expr | None
    optional: bool = False


@dataclass(frozen=True)
class ProjectionItem:
    expr: object             # Expr
    alias: object = None     # str | None


@dataclass(frozen=True)
class SortItem:
    expr: object
    ascending: bool = True


@dataclass(frozen=True)
class WithClause:
    items: tuple
    star: bool = False
    distinct: bool = False
    order_by: tuple = ()
    skip: object = None
    limit: object = None
    where: object = None


@dataclass(frozen=True)
class ReturnClause:
    items: tuple
    star: bool = False
    distinct: bool = False
    order_by: tuple = ()
    skip: object = None
    limit: object = None


@dataclass(frozen=True)
class UnwindClause:
    expr: object
    alias: str = "x"


@dataclass(frozen=True)
class CallClause:
    """``CALL ns.proc(args) [YIELD a [AS x], ...]`` — procedure invocation
    (openCypher ProcedureCallAcceptance; beyond-reference surface — the
    reference blacklists its whole procedure corpus).  ``args`` is None
    for the implicit-argument form (bound from query parameters by name);
    ``yields`` is None when there is no YIELD (standalone or VOID call).
    """
    name: str
    args: tuple | None
    yields: tuple | None        # ((out_name, alias), ...)


@dataclass(frozen=True)
class FromGraphClause:
    """``FROM GRAPH name`` / ``FROM GRAPH view(args)`` — switch the active
    graph (Cypher 10; reference FromCatalogGraph,
    RelationalOperator.scala:410; parameterized views CatalogDDLTests)."""
    name: str
    args: tuple = ()


@dataclass(frozen=True)
class ConstructClause:
    """``CONSTRUCT [ON g, ...] [CLONE v, ...] [NEW pattern, ...]
    [SET v:L | v.k = e]`` (Cypher 10; reference
    ConstructGraphPlanner.scala:54-85, SET items :133-156, ON graphs
    IRBuilder.scala:288-298)."""
    clones: tuple = ()       # (var_name, ...)
    news: tuple = ()         # (PatternPart, ...)
    sets: tuple = ()         # ("label", var, lbl) | ("prop", var, key, Expr)
    on: tuple = ()           # (graph_name, ...) — union base graphs


@dataclass(frozen=True)
class ReturnGraphClause:
    """``RETURN GRAPH`` — the query result is a graph, not a table."""


@dataclass(frozen=True)
class CreateClause:
    """``CREATE pattern[, pattern]*`` — graph-mutating node/relationship
    creation (openCypher CreateAcceptance).  Beyond-reference surface: the
    reference engine is read-only and wont_fix-blacklists its whole
    mutation corpus (morpheus-tck blacklists); here mutation is an
    immutable graph TRANSFORMATION — the query result carries a new
    :class:`PropertyGraph` (the Spark-first design: element-table unions,
    never in-place updates)."""
    patterns: tuple          # (PatternPart, ...)


@dataclass(frozen=True)
class SetItem:
    """One SET/REMOVE item.

    kind: 'prop'        — target var, key, value Expr
          'label'       — target var, labels tuple
          'map_replace' — target var, map Expr  (``SET n = {..}``)
          'map_add'     — target var, map Expr  (``SET n += {..}``)
    For REMOVE only 'prop' (value None) and 'label' occur."""
    kind: str
    var: str
    key: object = None       # str | None
    value: object = None     # Expr | None
    labels: tuple = ()


@dataclass(frozen=True)
class SetClause:
    items: tuple             # (SetItem, ...)


@dataclass(frozen=True)
class RemoveClause:
    items: tuple             # (SetItem, ...)


@dataclass(frozen=True)
class DeleteClause:
    """``[DETACH] DELETE expr[, expr]*``."""
    exprs: tuple             # (Expr, ...) — node/rel variables
    detach: bool = False


@dataclass(frozen=True)
class MergeClause:
    """``MERGE pattern [ON CREATE SET items] [ON MATCH SET items]``."""
    pattern: object          # PatternPart
    on_create: tuple = ()    # (SetItem, ...)
    on_match: tuple = ()     # (SetItem, ...)


@dataclass(frozen=True)
class CallSubquery:
    """``CALL { <query> }`` — openCypher subquery clause.  The inner
    query may start with an importing ``WITH`` of bare outer variables
    and may itself be a UNION."""
    query: object            # Query


@dataclass(frozen=True)
class ForeachClause:
    """``FOREACH (var IN list | updating-clause...)``."""
    var: str
    list_expr: object        # Expr
    clauses: tuple           # updating clauses (incl. nested Foreach)


@dataclass(frozen=True)
class SingleQuery:
    clauses: tuple


@dataclass(frozen=True)
class Query:
    """parts[0] (UNION [ALL] parts[i])..."""
    parts: tuple
    union_alls: tuple = ()   # len == len(parts) - 1
