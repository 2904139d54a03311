"""The TCK expected-value grammar and result canonicalization.

TCK result tables print values in Cypher-literal syntax: ``'str'``, ``1``,
``1.5``, ``true``, ``null``, ``[1, 'x']``, ``{a: 1}``, nodes
``(:L1:L2 {p: 1})``, relationships ``[:TYPE {p: 1}]`` and paths
``<(:A)-[:R]->(:B)>``.  Both the parsed expectations and the engine's
``CypherResult.to_maps()`` rows canonicalize into the same tagged tuples,
compared structurally (ids are NOT part of equality, like the TCK's
value comparison).
"""
from __future__ import annotations

_WS = " \t\n"


class TckValueError(ValueError):
    pass


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in _WS:
            self.i += 1

    def peek(self):
        self.ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def eat(self, ch):
        self.ws()
        if self.i >= len(self.s) or self.s[self.i] != ch:
            raise TckValueError(
                f"expected {ch!r} at {self.i} in {self.s!r}")
        self.i += 1

    def opt(self, ch):
        self.ws()
        if self.i < len(self.s) and self.s[self.i] == ch:
            self.i += 1
            return True
        return False

    def ident(self):
        self.ws()
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] == "_"):
            j += 1
        if j == self.i:
            raise TckValueError(f"expected identifier at {self.i} "
                                f"in {self.s!r}")
        out = self.s[self.i:j]
        self.i = j
        return out

    def value(self):
        c = self.peek()
        if c == "'":
            return self._string()
        if c == "[":
            return self._list_or_rel()
        if c == "{":
            return ("map", tuple(sorted(self._map().items())))
        if c == "(":
            return self._node()
        if c == "<":
            return self._path()
        if c.isdigit() or c == "-" or c == "+" or c == ".":
            return self._number()
        word = self.ident()
        lw = word.lower()
        if lw == "null":
            return ("null",)
        if lw == "true":
            return ("bool", True)
        if lw == "false":
            return ("bool", False)
        raise TckValueError(f"unrecognized value {word!r} in {self.s!r}")

    def _string(self):
        self.eat("'")
        out = ""
        while self.i < len(self.s):
            ch = self.s[self.i]
            if ch == "\\" and self.i + 1 < len(self.s):
                out += self.s[self.i + 1]
                self.i += 2
                continue
            if ch == "'":
                self.i += 1
                return ("str", out)
            out += ch
            self.i += 1
        raise TckValueError(f"unterminated string in {self.s!r}")

    def _number(self):
        self.ws()
        j = self.i
        if self.s[j] in "+-":
            j += 1
        isf = False
        while j < len(self.s) and (self.s[j].isdigit()
                                   or self.s[j] in ".eE+-"):
            # stop at +/- that is not an exponent sign
            if self.s[j] in "+-" and self.s[j - 1] not in "eE":
                break
            if self.s[j] in ".eE":
                isf = True
            j += 1
        tok = self.s[self.i:j]
        self.i = j
        return ("float", norm_float(float(tok))) if isf \
            else ("int", int(tok))

    def _list_or_rel(self):
        self.eat("[")
        if self.peek() == ":":
            return self._rel_body()
        items = []
        if not self.opt("]"):
            while True:
                items.append(self.value())
                if self.opt("]"):
                    break
                self.eat(",")
        return ("list", tuple(items))

    def _map(self):
        self.eat("{")
        out = {}
        if self.opt("}"):
            return out
        while True:
            k = self.ident()
            self.eat(":")
            out[k] = self.value()
            if self.opt("}"):
                return out
            self.eat(",")

    def _labels(self):
        labels = []
        while self.peek() == ":":
            self.eat(":")
            labels.append(self.ident())
        return labels

    def _node(self):
        self.eat("(")
        labels = self._labels()
        props = self._map() if self.peek() == "{" else {}
        self.eat(")")
        return ("node", frozenset(labels), tuple(sorted(props.items())))

    def _rel_body(self):
        # after the opening [ — [:TYPE {props}]
        self.eat(":")
        typ = self.ident()
        props = self._map() if self.peek() == "{" else {}
        self.eat("]")
        return ("rel", typ, tuple(sorted(props.items())))

    def _path(self):
        self.eat("<")
        items = [self._node()]
        while self.peek() in "-<":
            back = self.opt("<")
            self.eat("-")
            rel = None
            if self.peek() == "[":
                self.eat("[")
                rel = self._rel_body()
            self.eat("-")
            fwd = self.opt(">")
            node = self._node()
            direction = "<" if back and not fwd else (">" if fwd else "-")
            items.append((direction, rel))
            items.append(node)
        self.eat(">")
        return ("path", tuple(items))


def parse_tck_value(cell: str):
    """Parse one TCK result-table cell into its canonical tagged form."""
    p = _P(cell)
    v = p.value()
    p.ws()
    if p.i != len(p.s):
        raise TckValueError(f"trailing content in cell {cell!r}")
    return v


def norm_float(v: float) -> float:
    """12-significant-digit normalization so engine floats and the decimal
    literals in expectation tables compare equal."""
    return float(f"{v:.12g}")


def canon_result_value(v, unordered_lists: bool = False):
    """Canonicalize one engine value (from ``CypherResult.to_maps()``) into
    the tagged-tuple form of :func:`parse_tck_value`."""
    import datetime

    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        return ("float", norm_float(v))
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, datetime.time):
        # Cypher time rendering: HH:MM:SS with the fraction only when
        # non-zero (trailing zeros trimmed); UTC offset renders as 'Z'
        s = f"{v.hour:02d}:{v.minute:02d}:{v.second:02d}"
        if v.microsecond:
            s += f".{v.microsecond:06d}".rstrip("0")
        if v.tzinfo is not None:
            off = v.utcoffset()
            total = int(off.total_seconds())
            if total == 0:
                s += "Z"
            else:
                sign, a = ("-", -total) if total < 0 else ("+", total)
                s += f"{sign}{a // 3600:02d}:{a // 60 % 60:02d}"
                if a % 60:
                    s += f":{a % 60:02d}"
        return ("str", s)
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        # zoned datetime: wall clock + 'Z'/±offset (+ [Zone/Name] when the
        # zone is named rather than a fixed offset)
        s = v.isoformat()
        if s.endswith("+00:00"):
            s = s[:-6] + "Z"
        try:
            from zoneinfo import ZoneInfo
            if isinstance(v.tzinfo, ZoneInfo):
                s += f"[{v.tzinfo.key}]"
        except ImportError:                 # pragma: no cover
            pass
        return ("str", s)
    if isinstance(v, (datetime.date, datetime.datetime)):
        # Cypher/TCK ISO rendering: 'T'-separated datetimes (str() uses ' ')
        return ("str", v.isoformat())
    if isinstance(v, datetime.timedelta):
        return ("str", str(v))
    if isinstance(v, dict):
        if set(v) == {"nodes", "rels"}:
            # hydrated path (CypherResult.to_maps): infer each step's
            # direction by matching the rel's endpoints against the node
            # sequence, mirroring the <(...)-[...]->(...)> grammar
            nodes = [canon_result_value(n, unordered_lists)
                     for n in v["nodes"]]
            items = [nodes[0]] if nodes else []
            for i, rel in enumerate(v["rels"]):
                rc = canon_result_value(rel, unordered_lists)
                here = v["nodes"][i]["id"] if v["nodes"][i] else None
                direction = ">" if rel and rel["source"] == here else "<"
                items.append((direction, rc))
                items.append(nodes[i + 1])
            return ("path", tuple(items))
        if set(v) in ({"id", "labels", "properties"},
                      {"id", "source", "target", "type", "properties"}) \
                and v["id"] is None:
            return ("null",)            # unmatched OPTIONAL entity
        if set(v) == {"id", "labels", "properties"}:
            return ("node", frozenset(v["labels"]),
                    tuple(sorted((k, canon_result_value(x, unordered_lists))
                                 for k, x in v["properties"].items())))
        if set(v) == {"id", "source", "target", "type", "properties"}:
            return ("rel", v["type"],
                    tuple(sorted((k, canon_result_value(x, unordered_lists))
                                 for k, x in v["properties"].items())))
        return ("map", tuple(sorted(
            (k, canon_result_value(x, unordered_lists))
            for k, x in v.items())))
    try:                                    # pyspark Row (struct values)
        from pyspark.sql import Row
        if isinstance(v, Row):
            return canon_result_value(v.asDict(), unordered_lists)
    except ImportError:                     # pragma: no cover
        pass
    if isinstance(v, (list, tuple)):
        items = tuple(canon_result_value(x, unordered_lists) for x in v)
        if unordered_lists:
            from collections import Counter
            return ("list*", tuple(sorted(Counter(items).items())))
        return ("list", items)
    raise TckValueError(f"cannot canonicalize result value {v!r}")


def canon_expected_value(v, unordered_lists: bool = False):
    """Re-tag a parsed expectation for unordered-list comparison."""
    if not unordered_lists or not isinstance(v, tuple):
        return v
    tag = v[0]
    if tag == "list":
        from collections import Counter
        items = tuple(canon_expected_value(x, True) for x in v[1])
        return ("list*", tuple(sorted(Counter(items).items())))
    if tag == "map":
        return ("map", tuple(sorted(
            (k, canon_expected_value(x, True)) for k, x in v[1])))
    if tag == "node":
        return ("node", v[1], tuple(sorted(
            (k, canon_expected_value(x, True)) for k, x in v[2])))
    if tag == "rel":
        return ("rel", v[1], tuple(sorted(
            (k, canon_expected_value(x, True)) for k, x in v[2])))
    return v
