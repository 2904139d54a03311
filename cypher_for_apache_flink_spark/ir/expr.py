"""Typed Cypher expression IR.

Mirrors the reference's ``Expr`` tree (okapi-ir/src/main/scala/org/opencypher/
okapi/ir/api/expr/Expr.scala:86-1338) but as a small set of frozen Python
dataclasses.  Exprs are immutable and hashable so they can serve as keys in the
RecordHeader (reference: okapi-relational/.../impl/table/RecordHeader.scala:68).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Expr:
    """Base class for all expression nodes."""

    def children(self) -> tuple["Expr", ...]:
        return ()


# ---------------------------------------------------------------------------
# Variables and element accessors
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Var(Expr):
    """A plain (scalar) variable.  Reference: Expr.scala:100."""

    name: str


@dataclass(frozen=True)
class NodeVar(Var):
    """A variable bound to a node; its column stores the node id (Expr.scala:131)."""


@dataclass(frozen=True)
class RelVar(Var):
    """A variable bound to a relationship; its column stores the rel id (Expr.scala:160)."""


@dataclass(frozen=True)
class ListRelVar(Var):
    """A var-length relationship variable; its column stores the array of rel ids."""


@dataclass(frozen=True)
class ListNodeVar(Var):
    """A variable bound to a LIST of nodes (``collect(n)``, ``nodes(p)``
    carried through WITH); its column stores the array of node ids.  The
    renderer hydrates ids back into full entities (session.to_maps)."""


@dataclass(frozen=True)
class Param(Expr):
    """Query parameter (Expr.scala:96)."""

    name: str


@dataclass(frozen=True)
class Lit(Expr):
    """Scalar literal (Expr.scala:1246-1297). ``value`` must be hashable."""

    value: object


NULL = Lit(None)
TRUE = Lit(True)
FALSE = Lit(False)


@dataclass(frozen=True)
class ListLit(Expr):
    items: tuple

    def children(self):
        return self.items


@dataclass(frozen=True)
class MapLit(Expr):
    """Map literal / MapExpression (Expr.scala:511). items = ((key, Expr), ...)."""

    items: tuple

    def children(self):
        return tuple(v for _, v in self.items)


@dataclass(frozen=True)
class Property(Expr):
    """``owner.key`` — ElementProperty / MapProperty (Expr.scala:468,474)."""

    owner: Expr
    key: str

    def children(self):
        return (self.owner,)


@dataclass(frozen=True)
class HasLabel(Expr):
    """``n:Label`` stored boolean column (Expr.scala:321)."""

    node: Expr
    label: str

    def children(self):
        return (self.node,)


@dataclass(frozen=True)
class HasType(Expr):
    """``type(r) IN types`` test against the rel-type column (Expr.scala:339)."""

    rel: Expr
    types: tuple

    def children(self):
        return (self.rel,)


@dataclass(frozen=True)
class StartNode(Expr):
    """Source-node id column of a relationship (Expr.scala:202-style)."""

    rel: Expr

    def children(self):
        return (self.rel,)


@dataclass(frozen=True)
class EndNode(Expr):
    rel: Expr

    def children(self):
        return (self.rel,)


# ---------------------------------------------------------------------------
# Operators
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BinOp(Expr):
    """Binary operator.  op ∈ {'+','-','*','/','%','^','=','<>','<','<=','>',
    '>=','AND','OR','XOR','IN','STARTS WITH','ENDS WITH','CONTAINS','=~'}.
    Reference: Expr.scala:264-435,533-598."""

    op: str
    lhs: Expr
    rhs: Expr

    def children(self):
        return (self.lhs, self.rhs)


@dataclass(frozen=True)
class Not(Expr):
    child: Expr

    def children(self):
        return (self.child,)


@dataclass(frozen=True)
class Neg(Expr):
    child: Expr

    def children(self):
        return (self.child,)


@dataclass(frozen=True)
class IsNull(Expr):
    """IS NULL / IS NOT NULL (Expr.scala:357-367)."""

    child: Expr
    negated: bool = False

    def children(self):
        return (self.child,)


@dataclass(frozen=True)
class FuncCall(Expr):
    """Scalar or aggregate function call; name is lower-cased at parse time."""

    name: str
    args: tuple
    distinct: bool = False

    def children(self):
        return self.args


@dataclass(frozen=True)
class CountStar(Expr):
    """count(*) (Expr.scala:1071)."""


@dataclass(frozen=True)
class CaseExpr(Expr):
    """CASE [test] WHEN .. THEN .. ELSE .. END (Expr.scala:1310)."""

    test: object  # Expr | None
    alternatives: tuple  # ((when Expr, then Expr), ...)
    default: object  # Expr | None

    def children(self):
        out = []
        if self.test is not None:
            out.append(self.test)
        for w, t in self.alternatives:
            out.extend((w, t))
        if self.default is not None:
            out.append(self.default)
        return tuple(out)


@dataclass(frozen=True)
class Subscript(Expr):
    """``owner[index]`` (ContainerIndex, Expr.scala:1240)."""

    owner: Expr
    index: Expr

    def children(self):
        return (self.owner, self.index)


@dataclass(frozen=True)
class ListSlice(Expr):
    """``owner[lo..hi]`` (Expr.scala:1155-1176); lo/hi may be None."""

    owner: Expr
    lo: object
    hi: object

    def children(self):
        out = [self.owner]
        if self.lo is not None:
            out.append(self.lo)
        if self.hi is not None:
            out.append(self.hi)
        return tuple(out)


@dataclass(frozen=True)
class ListComprehension(Expr):
    """``[x IN list WHERE pred | proj]`` (Expr.scala:1178)."""

    var: str
    list_expr: Expr
    where: object  # Expr | None
    projection: object  # Expr | None

    def children(self):
        out = [self.list_expr]
        if self.where is not None:
            out.append(self.where)
        if self.projection is not None:
            out.append(self.projection)
        return tuple(out)


@dataclass(frozen=True)
class ListPredicate(Expr):
    """any/all/none/single(x IN list WHERE pred) (Expr.scala:1202-1237)."""

    kind: str  # 'any' | 'all' | 'none' | 'single'
    var: str
    list_expr: Expr
    where: Expr

    def children(self):
        return (self.list_expr, self.where)


@dataclass(frozen=True)
class ListReduce(Expr):
    """reduce(acc = init, x IN list | step) (Expr.scala:1190)."""

    acc: str
    init: Expr
    var: str
    list_expr: Expr
    step: Expr

    def children(self):
        return (self.init, self.list_expr, self.step)


@dataclass(frozen=True)
class MapProjection(Expr):
    """``n {.name, alias: expr, .*}`` (Expr.scala:518; mapper
    SparkSQLExprMapper.scala:406-424).  items = ((key, Expr), ...);
    ``all_props`` adds every property of ``var`` from the header."""

    var: Expr
    items: tuple
    all_props: bool = False

    def children(self):
        return (self.var, *(v for _, v in self.items))


@dataclass(frozen=True)
class PatternPredicate(Expr):
    """``WHERE (a)-[:T]->(b)`` pattern-as-predicate; planned as a semi/anti
    join (reference: extractSubqueryFromPatternExpression +
    RelationalPlanner.scala:224-246).  ``pattern`` is a frozen parser-AST
    PatternPart.  ``where`` carries the inner predicate of an
    ``EXISTS { MATCH ... WHERE ... }`` existential subquery."""

    pattern: object
    negated: bool = False
    where: object = None


@dataclass(frozen=True)
class PatternComprehension(Expr):
    """``[(a)-[:T]->(b) WHERE pred | proj]`` — a correlated pattern subquery
    collected into one list per outer row (openCypher pattern
    comprehension).  ``pattern`` is a frozen parser-AST PatternPart;
    ``where``/``projection`` are planned against the SUBPATTERN's scope, so
    ``children()`` stays empty and the planner materializes the column
    (mirrors how PatternPredicate flags are planned)."""

    pattern: object
    where: object = None       # Expr | None
    projection: object = None  # Expr


@dataclass(frozen=True)
class LocalVar(Expr):
    """Lambda-bound variable inside list comprehensions / reductions."""

    name: str


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

AGG_FUNCS = {
    "count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp",
    "percentilecont", "percentiledisc",
}


def is_aggregation(expr: Expr) -> bool:
    """True if the expression contains an aggregator anywhere."""
    if isinstance(expr, CountStar):
        return True
    if isinstance(expr, FuncCall) and expr.name in AGG_FUNCS:
        return True
    return any(is_aggregation(c) for c in expr.children())


def collect_vars(expr: Expr) -> set:
    """All Var nodes referenced by the expression (excluding lambda locals)."""
    out = set()

    def walk(e):
        if isinstance(e, LocalVar):
            return
        if isinstance(e, Var):
            out.add(e)
        for c in e.children():
            walk(c)

    walk(expr)
    return out


def split_conjunctions(expr: Expr) -> list:
    """CNF-ish split of top-level ANDs (reference: planFilter
    LogicalPlanner.scala:211-227)."""
    if isinstance(expr, BinOp) and expr.op == "AND":
        return split_conjunctions(expr.lhs) + split_conjunctions(expr.rhs)
    return [expr]
