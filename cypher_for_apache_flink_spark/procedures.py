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
