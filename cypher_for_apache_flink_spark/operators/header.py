"""RecordHeader: maps IR expressions to physical DataFrame column names.

The load-bearing invention of the reference engine (okapi-relational/src/main/
scala/org/opencypher/okapi/relational/impl/table/RecordHeader.scala:68): graph
elements are exploded across physical columns, and the header records which
expression each column stores.  A node variable ``n`` owns one id column, one
string/boolean column per label, and one column per property; a relationship
``r`` owns id, source, target, type and property columns.  Aliases share the
physical column (RecordHeader.scala:357-379).
"""

from __future__ import annotations

import hashlib
import re

from ..ir.expr import (
    EndNode,
    Expr,
    HasLabel,
    Property,
    StartNode,
    Var,
)

_SANITIZE_RE = re.compile(r"[^0-9a-zA-Z_]")


def _san(s: str) -> str:
    clean = _SANITIZE_RE.sub("_", s)
    if clean != s:
        # Keep deterministic & conflict-free (reference:
        # RecordHeader.newConflictFreeColumnName, RecordHeader.scala:299).
        # Stable digest — Python's hash() is per-process randomized, which
        # would break cross-run plan/schema comparison.
        digest = int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 100000
        clean = f"{clean}_{digest:05d}"
    return clean


def column_name(expr: Expr) -> str:
    """Deterministic physical column name for an expression."""
    if isinstance(expr, Var):
        return f"v_{_san(expr.name)}"
    if isinstance(expr, Property):
        return f"{column_name(expr.owner)}__p_{_san(expr.key)}"
    if isinstance(expr, HasLabel):
        return f"{column_name(expr.node)}__l_{_san(expr.label)}"
    if isinstance(expr, StartNode):
        return f"{column_name(expr.rel)}__src"
    if isinstance(expr, EndNode):
        return f"{column_name(expr.rel)}__tgt"
    # Rel-type string column is keyed by a dedicated marker expr (TypeOf).
    raise ValueError(f"no deterministic column name for {expr!r}")


class TypeOf(Expr):
    """Marker expr for the relationship-type string column.

    Unlike the reference (boolean HasType columns, RecordHeader.scala:156-173)
    we store a single string ``type`` column per relationship variable — rel
    tables are keyed by type, so the column is a literal per scan and unions
    cheaply.
    """

    __slots__ = ("rel",)
    __match_args__ = ("rel",)

    def __init__(self, rel):
        self.rel = rel

    def __eq__(self, other):
        return isinstance(other, TypeOf) and self.rel == other.rel

    def __hash__(self):
        return hash(("TypeOf", self.rel))

    def __repr__(self):
        return f"TypeOf({self.rel!r})"

    def children(self):
        return (self.rel,)


def type_column_name(rel_var: Var) -> str:
    return f"{column_name(rel_var)}__type"


class Header:
    """Immutable-ish mapping Expr -> physical column name, insertion-ordered."""

    __slots__ = ("mapping",)

    def __init__(self, mapping: dict | None = None):
        self.mapping: dict[Expr, str] = dict(mapping or {})

    # -- lookup ------------------------------------------------------------
    def __contains__(self, expr: Expr) -> bool:
        return expr in self.mapping

    def col(self, expr: Expr) -> str:
        return self.mapping[expr]

    def get(self, expr: Expr):
        return self.mapping.get(expr)

    def columns(self) -> list[str]:
        """Distinct physical columns in insertion order."""
        seen: dict[str, None] = {}
        for c in self.mapping.values():
            seen.setdefault(c)
        return list(seen)

    def exprs(self) -> list[Expr]:
        return list(self.mapping)

    def vars(self) -> list[Var]:
        return [e for e in self.mapping if isinstance(e, Var)]

    def var(self, name: str):
        for e in self.mapping:
            if isinstance(e, Var) and e.name == name:
                return e
        return None

    def owned_by(self, var: Var) -> list[Expr]:
        """All exprs whose column belongs to ``var`` (id, labels, type,
        source/target, properties).  Reference: RecordHeader.ownedBy."""
        out = []
        for e in self.mapping:
            if e == var:
                out.append(e)
            elif isinstance(e, (Property, HasLabel, StartNode, EndNode, TypeOf)):
                owner = e.children()[0] if not isinstance(e, Property) else e.owner
                if isinstance(e, HasLabel):
                    owner = e.node
                if owner == var:
                    out.append(e)
        return out

    def labels_for(self, var: Var) -> list[str]:
        return sorted(e.label for e in self.mapping if isinstance(e, HasLabel) and e.node == var)

    def properties_for(self, var: Var) -> list[str]:
        return sorted(e.key for e in self.mapping
                      if isinstance(e, Property) and e.owner == var)

    # -- algebra -----------------------------------------------------------
    def added(self, expr: Expr, column: str | None = None) -> "Header":
        m = dict(self.mapping)
        m[expr] = column or column_name(expr)
        return Header(m)

    def with_alias(self, new: Expr, existing: Expr) -> "Header":
        """Alias shares the physical column, and ownership transfers for all
        element sub-columns (RecordHeader.withAlias, :357-379)."""
        m = dict(self.mapping)
        m[new] = self.mapping[existing]
        if isinstance(existing, Var) and isinstance(new, Var):
            for e in self.owned_by(existing):
                m[_reowned(e, existing, new)] = self.mapping[e]
        return Header(m)

    def selected(self, exprs) -> "Header":
        m = {}
        for e in exprs:
            m[e] = self.mapping[e]
        return Header(m)

    def renamed(self, rename: dict) -> "Header":
        """Apply a physical column rename map."""
        return Header({e: rename.get(c, c) for e, c in self.mapping.items()})

    def merged(self, other: "Header") -> "Header":
        """Disjoint union for joins (RecordHeader.join, :380); duplicate exprs
        must agree on the column."""
        m = dict(self.mapping)
        for e, c in other.mapping.items():
            if e in m and m[e] != c:
                raise ValueError(f"header conflict for {e!r}: {m[e]} vs {c}")
            m[e] = c
        return Header(m)

    def without_var(self, var: Var) -> "Header":
        owned = set(self.owned_by(var))
        # Also drop aliases pointing at the var's columns.
        cols = {self.mapping[e] for e in owned}
        return Header({e: c for e, c in self.mapping.items()
                       if e not in owned and c not in cols})

    def __repr__(self):
        return f"Header({self.mapping!r})"


def _reowned(e: Expr, old: Var, new: Var) -> Expr:
    if e == old:
        return new
    if isinstance(e, Property):
        return Property(new, e.key)
    if isinstance(e, HasLabel):
        return HasLabel(new, e.label)
    if isinstance(e, StartNode):
        return StartNode(new)
    if isinstance(e, EndNode):
        return EndNode(new)
    if isinstance(e, TypeOf):
        return TypeOf(new)
    return e
