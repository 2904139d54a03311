"""Recursive-descent openCypher parser.

Covers the Cypher-9 read surface exercised by the reference's acceptance
suites (SURVEY §5 layer 2): MATCH / OPTIONAL MATCH / WHERE / WITH / RETURN /
UNWIND / UNION [ALL] / ORDER BY / SKIP / LIMIT / DISTINCT, patterns with
var-length relationships, and the expression grammar of SURVEY §2.5.  The
reference uses the published neo4j ``org.opencypher.v9_0`` front-end
(okapi-ir/.../impl/parse/CypherParser.scala:56-79); from Python we hand-roll
a small backtracking parser instead (SURVEY §7.1.5).
"""

from __future__ import annotations

import dataclasses
import re

from ..ir import expr as E
from . import ast as A
from ..errors import CypherSyntaxError

__all__ = ["CypherSyntaxError", "parse"]


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<WS>\s+|//[^\n]*|/\*(?s:.*?)\*/)
  | (?P<FLOAT>\d+\.\d+([eE][+-]?\d+)?|\d+[eE][+-]?\d+|\.\d+([eE][+-]?\d+)?)
  | (?P<HEX>0[xX][0-9A-Fa-f]+)
  | (?P<OCT>0[oO][0-7]+)
  | (?P<INT>\d+)
  | (?P<STRING>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<IDENT>[A-Za-z_][A-Za-z0-9_]*|`[^`]*`)
  | (?P<PARAM>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<PUNCT><=|>=|<>|=~|\.\.|->|<-|[-+*/%^=<>(),\[\]{}.:|&!])
""", re.VERBOSE)

# Dotted function names parsed as one call (TemporalTests.scala's
# duration.between family).
_NAMESPACED_FUNCS = {"date.truncate", "datetime.truncate",
                     "localdatetime.truncate",
                     "time.truncate", "localtime.truncate",
                     "duration.between", "duration.indays", "duration.inmonths",
                     "duration.inseconds"}

_KEYWORDS = {
    "match", "optional", "where", "with", "return", "unwind", "as", "union",
    "all", "order", "by", "skip", "limit", "distinct", "and", "or", "xor",
    "not", "in", "starts", "ends", "contains", "is", "null", "true", "false",
    "case", "when", "then", "else", "end", "asc", "ascending", "desc",
    "descending", "any", "none", "single", "reduce", "exists", "from",
    "graph", "construct", "clone", "new", "set", "call", "yield",
    "create", "merge", "delete", "detach", "remove", "on", "foreach",
}


def _finite_float(text: str, pos: int) -> float:
    """Float literal -> value; overflow to infinity is a user error (TCK
    SemanticErrorAcceptance FloatingPointOverflow)."""
    v = float(text)
    if v in (float("inf"), float("-inf")):
        raise CypherSyntaxError(
            f"floating point number is too large at {pos}: {text}",
            code="FloatingPointOverflow")
    return v


class Tok:
    __slots__ = ("kind", "text", "pos", "raw")

    def __init__(self, kind, text, pos, raw=None):
        self.kind = kind       # 'INT','FLOAT','STRING','IDENT','KW','PARAM','PUNCT','EOF'
        self.text = text
        self.pos = pos
        # Original source spelling.  For KW tokens ``text`` is the lowered
        # keyword; when the token is consumed as an identifier (label, type,
        # property key, variable) the ORIGINAL spelling must be used —
        # otherwise `(:Order)` silently scans label 'order' and matches
        # nothing (round-1 silent-wrong-answer bug).
        self.raw = raw if raw is not None else text

    def __repr__(self):
        return f"Tok({self.kind},{self.text!r})"


def tokenize(src: str) -> list:
    toks = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise CypherSyntaxError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "WS":
            continue
        if kind in ("HEX", "OCT"):
            base = 16 if kind == "HEX" else 8
            # raw keeps the source spelling so literal extraction can splice
            # the exact span out of the query text
            toks.append(Tok("INT", str(int(text, base)), m.start(), raw=text))
            continue
        if kind == "IDENT":
            if text.startswith("`"):
                toks.append(Tok("IDENT", text[1:-1], m.start()))
                continue
            low = text.lower()
            if low in _KEYWORDS:
                toks.append(Tok("KW", low, m.start(), raw=text))
                continue
        toks.append(Tok(kind, text, m.start()))
    toks.append(Tok("EOF", "", len(src)))
    return toks


def _flatten_label_conj(tree):
    """Label names when ``tree`` is a pure conjunction of plain labels
    (the pre-GQL ``:A:B`` form), else None."""
    if tree[0] == "lbl":
        return [tree[1]]
    if tree[0] == "and":
        a = _flatten_label_conj(tree[1])
        b = _flatten_label_conj(tree[2])
        return a + b if a is not None and b is not None else None
    return None


_SIMPLE_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}
_HEX = set("0123456789abcdefABCDEF")


def _unescape(s: str) -> str:
    body = s[1:-1]
    if "\\" not in body:
        return body
    out, i = [], 0
    while i < len(body):
        ch = body[i]
        if ch != "\\" or i + 1 >= len(body):
            out.append(ch)
            i += 1
            continue
        c = body[i + 1]
        if c in ("u", "U"):
            # Cypher \uXXXX / \UXXXXXXXX escapes; anything short of the
            # full hex run is a SyntaxError (TCK InvalidUnicodeLiteral)
            width = 4 if c == "u" else 8
            hexs = body[i + 2:i + 2 + width]
            if len(hexs) != width or any(h not in _HEX for h in hexs):
                from ..errors import CypherSyntaxError
                raise CypherSyntaxError(
                    f"invalid unicode literal \\{c}{hexs}",
                    code="InvalidUnicodeLiteral")
            out.append(chr(int(hexs, 16)))
            i += 2 + width
            continue
        out.append(_SIMPLE_ESCAPES.get(c, c))
        i += 2
    return "".join(out)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

class Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = tokenize(src)
        self.pos = 0

    # -- token helpers --------------------------------------------------
    def peek(self, ahead=0) -> Tok:
        return self.toks[min(self.pos + ahead, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def at_kw(self, *kws) -> bool:
        t = self.peek()
        return t.kind == "KW" and t.text in kws

    def at_punct(self, *ps) -> bool:
        t = self.peek()
        return t.kind == "PUNCT" and t.text in ps

    def eat_kw(self, kw):
        if not self.at_kw(kw):
            self.err(f"expected {kw.upper()}")
        return self.next()

    def eat_punct(self, p):
        if not self.at_punct(p):
            self.err(f"expected {p!r}")
        return self.next()

    def opt_punct(self, p) -> bool:
        if self.at_punct(p):
            self.next()
            return True
        return False

    def opt_kw(self, kw) -> bool:
        if self.at_kw(kw):
            self.next()
            return True
        return False

    def err(self, msg):
        t = self.peek()
        frag = self.src[max(0, t.pos - 20):t.pos + 20]
        raise CypherSyntaxError(f"{msg} at position {t.pos} near {frag!r} "
                                f"(got {t.kind} {t.text!r})")

    # -- entry ----------------------------------------------------------
    def parse_query(self) -> A.Query:
        parts = [self.parse_single_query()]
        alls = []
        while self.at_kw("union"):
            self.next()
            alls.append(self.opt_kw("all"))
            parts.append(self.parse_single_query())
        if self.peek().kind != "EOF":
            self.err("unexpected trailing input")
        return A.Query(tuple(parts), tuple(alls))

    def parse_single_query(self) -> A.SingleQuery:
        clauses = []
        while True:
            if self.at_kw("optional"):
                self.next()
                self.eat_kw("match")
                clauses.append(self.parse_match(optional=True))
            elif self.at_kw("match"):
                self.next()
                clauses.append(self.parse_match(optional=False))
            elif self.at_kw("unwind"):
                self.next()
                e = self.parse_expr()
                self.eat_kw("as")
                clauses.append(A.UnwindClause(e, self.ident()))
            elif self.at_kw("with"):
                self.next()
                clauses.append(self.parse_projection(is_with=True))
            elif self.at_kw("from") and self.peek(1).kind == "KW" and \
                    self.peek(1).text == "graph":
                self.next()
                self.next()
                gname = self.ident()
                # qualified graph names: session.foo / ds.schema.graph
                # (QualifiedGraphNameAcceptance)
                while self.at_punct(".") and \
                        self.peek(1).kind in ("IDENT", "KW"):
                    self.next()
                    gname += "." + self.ident()
                gargs = []
                if self.at_punct("("):
                    self.next()
                    if not self.at_punct(")"):
                        while True:
                            gargs.append(self.ident())
                            if not self.opt_punct(","):
                                break
                    self.eat_punct(")")
                clauses.append(A.FromGraphClause(gname, tuple(gargs)))
            elif self.at_kw("call"):
                self.next()
                if self.at_punct("{"):
                    self.next()
                    parts = [self.parse_single_query()]
                    alls = []
                    while self.at_kw("union"):
                        self.next()
                        alls.append(self.opt_kw("all"))
                        parts.append(self.parse_single_query())
                    self.eat_punct("}")
                    clauses.append(A.CallSubquery(
                        A.Query(tuple(parts), tuple(alls))))
                else:
                    clauses.append(self.parse_call())
            elif self.at_kw("construct"):
                self.next()
                clauses.append(self.parse_construct())
            elif self.at_kw("create"):
                self.next()
                pats = [self.parse_pattern_part()]
                while self.opt_punct(","):
                    pats.append(self.parse_pattern_part())
                clauses.append(A.CreateClause(tuple(pats)))
            elif self.at_kw("merge"):
                self.next()
                clauses.append(self.parse_merge())
            elif self.at_kw("set"):
                self.next()
                clauses.append(A.SetClause(tuple(self.parse_set_items())))
            elif self.at_kw("remove"):
                self.next()
                items = [self.parse_remove_item()]
                while self.opt_punct(","):
                    items.append(self.parse_remove_item())
                clauses.append(A.RemoveClause(tuple(items)))
            elif self.at_kw("detach"):
                self.next()
                self.eat_kw("delete")
                clauses.append(self.parse_delete(detach=True))
            elif self.at_kw("delete"):
                self.next()
                clauses.append(self.parse_delete(detach=False))
            elif self.at_kw("foreach"):
                self.next()
                clauses.append(self.parse_foreach())
            elif self.at_kw("return"):
                self.next()
                if self.at_kw("graph"):
                    self.next()
                    clauses.append(A.ReturnGraphClause())
                    break
                clauses.append(self.parse_projection(is_with=False))
            else:
                break
        if not clauses:
            self.err("expected a clause")
        return A.SingleQuery(tuple(clauses))

    # -- mutation clauses ----------------------------------------------
    def parse_set_item(self) -> "A.SetItem":
        """``v.key = e`` | ``v:L1:L2`` | ``v = {map}`` | ``v += {map}``;
        the target may be parenthesized: ``SET (n).name = 'x'``."""
        if self.opt_punct("("):
            var = self.ident()
            self.eat_punct(")")
        else:
            var = self.ident()
        if self.at_punct(":"):
            labels = []
            while self.opt_punct(":"):
                labels.append(self.ident())
            return A.SetItem("label", var, labels=tuple(labels))
        if self.at_punct("."):
            self.next()
            key = self.ident()
            self.eat_punct("=")
            return A.SetItem("prop", var, key=key, value=self.parse_expr())
        if self.at_punct("+") and self.peek(1).kind == "PUNCT" and \
                self.peek(1).text == "=":
            self.next()
            self.next()
            return A.SetItem("map_add", var, value=self.parse_expr())
        self.eat_punct("=")
        return A.SetItem("map_replace", var, value=self.parse_expr())

    def parse_set_items(self):
        items = [self.parse_set_item()]
        while self.opt_punct(","):
            items.append(self.parse_set_item())
        return items

    def parse_remove_item(self) -> "A.SetItem":
        """``v.key`` | ``v:L1:L2``."""
        var = self.ident()
        if self.at_punct(":"):
            labels = []
            while self.opt_punct(":"):
                labels.append(self.ident())
            return A.SetItem("label", var, labels=tuple(labels))
        self.eat_punct(".")
        return A.SetItem("prop", var, key=self.ident())

    def parse_foreach(self) -> "A.ForeachClause":
        """``FOREACH ( x IN list | updating-clause... )`` — the body may
        hold only updating clauses (CREATE/MERGE/SET/REMOVE/DELETE and
        nested FOREACH), which the grammar enforces structurally."""
        self.eat_punct("(")
        var = self.ident()
        self.eat_kw("in")
        le = self.parse_expr()
        self.eat_punct("|")
        clauses = []
        while True:
            if self.at_kw("create"):
                self.next()
                pats = [self.parse_pattern_part()]
                while self.opt_punct(","):
                    pats.append(self.parse_pattern_part())
                clauses.append(A.CreateClause(tuple(pats)))
            elif self.at_kw("merge"):
                self.next()
                clauses.append(self.parse_merge())
            elif self.at_kw("set"):
                self.next()
                clauses.append(A.SetClause(tuple(self.parse_set_items())))
            elif self.at_kw("remove"):
                self.next()
                items = [self.parse_remove_item()]
                while self.opt_punct(","):
                    items.append(self.parse_remove_item())
                clauses.append(A.RemoveClause(tuple(items)))
            elif self.at_kw("detach"):
                self.next()
                self.eat_kw("delete")
                clauses.append(self.parse_delete(detach=True))
            elif self.at_kw("delete"):
                self.next()
                clauses.append(self.parse_delete(detach=False))
            elif self.at_kw("foreach"):
                self.next()
                clauses.append(self.parse_foreach())
            else:
                break
        if not clauses:
            self.err("FOREACH requires at least one updating clause")
        self.eat_punct(")")
        return A.ForeachClause(var, le, tuple(clauses))

    def parse_delete(self, detach: bool) -> "A.DeleteClause":
        exprs = [self.parse_expr()]
        while self.opt_punct(","):
            exprs.append(self.parse_expr())
        return A.DeleteClause(tuple(exprs), detach)

    def parse_merge(self) -> "A.MergeClause":
        # optional named path: MERGE p = (a)-[:R]->(b)
        path_name = None
        t = self.peek()
        if t.kind in ("IDENT", "KW") and self.peek(1).kind == "PUNCT" \
                and self.peek(1).text == "=":
            path_name = t.raw if t.kind == "KW" else t.text
            self.next()
            self.next()
        pattern = self.parse_pattern_part()
        if path_name is not None:
            pattern = dataclasses.replace(pattern, path_var=path_name)
        on_create: list = []
        on_match: list = []
        while self.at_kw("on"):
            self.next()
            if self.opt_kw("create"):
                target = on_create
            elif self.opt_kw("match"):
                target = on_match
            else:
                self.err("expected CREATE or MATCH after ON")
            self.eat_kw("set")
            target.extend(self.parse_set_items())
        return A.MergeClause(pattern, tuple(on_create), tuple(on_match))

    def parse_call(self) -> A.CallClause:
        """CALL ns.proc[(arg, ...)] [YIELD out [AS alias], ...]"""
        name = self.ident()
        while self.at_punct(".") and self.peek(1).kind in ("IDENT", "KW"):
            self.next()
            name += "." + self.ident()
        args = None
        if self.at_punct("("):
            self.next()
            args = []
            if not self.at_punct(")"):
                while True:
                    args.append(self.parse_expr())
                    if not self.opt_punct(","):
                        break
            self.eat_punct(")")
            args = tuple(args)
        yields = None
        if self.at_kw("yield"):
            self.next()
            yields = []
            while True:
                out = self.ident()
                alias = out
                if self.at_kw("as"):
                    self.next()
                    alias = self.ident()
                yields.append((out, alias))
                if not self.opt_punct(","):
                    break
            yields = tuple(yields)
        return A.CallClause(name, args, yields)

    def ident(self) -> str:
        t = self.peek()
        if t.kind == "IDENT":
            return self.next().text
        if t.kind == "KW":   # keywords usable as identifiers in most positions;
            return self.next().raw  # original spelling, not the lowered keyword
        self.err("expected identifier")

    # -- clauses --------------------------------------------------------
    def parse_match(self, optional: bool) -> A.MatchClause:
        patterns = [self._parse_match_part()]
        while self.opt_punct(","):
            patterns.append(self._parse_match_part())
        where = None
        if self.at_kw("where"):
            self.next()
            where = self.parse_expr()
        return A.MatchClause(tuple(patterns), where, optional)

    def parse_projection(self, is_with: bool):
        distinct = self.opt_kw("distinct")
        star = False
        items = []
        if self.at_punct("*"):
            self.next()
            star = True
            if self.opt_punct(","):
                items = self.parse_projection_items()
        else:
            items = self.parse_projection_items()
        order_by: tuple = ()
        skip = None
        limit = None
        if self.at_kw("order"):
            self.next()
            self.eat_kw("by")
            sorts = []
            while True:
                e = self.parse_expr()
                asc = True
                if self.at_kw("asc", "ascending"):
                    self.next()
                elif self.at_kw("desc", "descending"):
                    self.next()
                    asc = False
                sorts.append(A.SortItem(e, asc))
                if not self.opt_punct(","):
                    break
            order_by = tuple(sorts)
        if self.at_kw("skip"):
            self.next()
            skip = self.parse_expr()
        if self.at_kw("limit"):
            self.next()
            limit = self.parse_expr()
        where = None
        if is_with and self.at_kw("where"):
            self.next()
            where = self.parse_expr()
        if is_with:
            return A.WithClause(tuple(items), star, distinct, order_by, skip,
                                limit, where)
        return A.ReturnClause(tuple(items), star, distinct, order_by, skip, limit)

    def parse_construct(self) -> A.ConstructClause:
        clones = []
        news = []
        sets = []
        on = []
        # CONSTRUCT ON g1, g2 ... — the construct builds ON TOP of the
        # named graphs (their full content is unioned into the result,
        # reference IRBuilder.scala:288-298).
        if self.at_kw("on"):
            self.next()
            while True:
                gname = self.ident()
                while self.at_punct(".") and \
                        self.peek(1).kind in ("IDENT", "KW"):
                    self.next()
                    gname += "." + self.ident()
                on.append(gname)
                if not self.opt_punct(","):
                    break

        def parse_set_item():
            var = self.ident()
            if self.opt_punct(":"):
                sets.append(("label", var, self.ident()))
                return
            self.eat_punct(".")
            key = self.ident()
            self.eat_punct("=")
            sets.append(("prop", var, key, self.parse_expr()))

        while True:
            if self.at_kw("clone"):
                self.next()
                clones.append(self.ident())
                while self.opt_punct(","):
                    clones.append(self.ident())
            elif self.at_kw("new"):
                self.next()
                news.append(self.parse_pattern_part())
                while self.opt_punct(","):
                    news.append(self.parse_pattern_part())
            elif self.at_kw("set"):
                # CONSTRUCT ... SET v:Label / SET v.key = expr (the
                # reference's AddInto path, ConstructGraphPlanner.scala:133)
                self.next()
                parse_set_item()
                while self.opt_punct(","):
                    parse_set_item()
            else:
                break
        return A.ConstructClause(tuple(clones), tuple(news), tuple(sets),
                                 tuple(on))

    def parse_projection_items(self):
        items = [self.parse_projection_item()]
        while self.opt_punct(","):
            items.append(self.parse_projection_item())
        return items

    def parse_projection_item(self) -> A.ProjectionItem:
        e = self.parse_expr()
        alias = None
        if self.opt_kw("as"):
            alias = self.ident()
        return A.ProjectionItem(e, alias)

    # -- patterns -------------------------------------------------------
    def _parse_match_part(self) -> A.PatternPart:
        """Pattern part with an optional named-path binder ``p = (...)``
        and optional shortestPath()/allShortestPaths() wrapper."""
        t = self.peek()
        if t.kind in ("IDENT", "KW") and self.peek(1).kind == "PUNCT" and \
                self.peek(1).text == "=":
            name = t.raw if t.kind == "KW" else t.text
            self.next()
            self.next()
            part = self._parse_shortest_or_pattern()
            return dataclasses.replace(part, path_var=name)
        return self._parse_shortest_or_pattern()

    def _parse_shortest_or_pattern(self) -> A.PatternPart:
        t = self.peek()
        if t.kind == "IDENT" \
                and t.text.lower() in ("shortestpath", "allshortestpaths") \
                and self.peek(1).kind == "PUNCT" \
                and self.peek(1).text == "(":
            kind = "single" if t.text.lower() == "shortestpath" else "all"
            self.next()
            self.eat_punct("(")
            part = self.parse_pattern_part()
            self.eat_punct(")")
            return dataclasses.replace(part, shortest=kind)
        return self.parse_pattern_part()

    def parse_pattern_part(self) -> A.PatternPart:
        elements = [self.parse_node_pattern()]
        while self.at_punct("-", "<-"):
            rel = self.parse_rel_pattern()
            node = self.parse_node_pattern()
            elements.extend([rel, node])
        return A.PatternPart(tuple(elements))

    def _opt_copy_of(self):
        """``COPY OF base`` (CONSTRUCT base entities, reference
        IRBuilder.scala:637-677 baseFields).  copy/of are soft keywords:
        only the exact two-identifier sequence triggers."""
        t0, t1 = self.peek(), self.peek(1)
        if t0.kind == "IDENT" and t0.text.lower() == "copy" \
                and t1.kind == "IDENT" and t1.text.lower() == "of":
            self.next()
            self.next()
            return self.ident()
        return None

    def parse_node_pattern(self) -> A.NodePattern:
        self.eat_punct("(")
        var = None
        labels = []
        props: tuple = ()
        t = self.peek()
        if t.kind == "IDENT" and not (
                t.text.lower() == "copy"
                and self.peek(1).kind == "IDENT"
                and self.peek(1).text.lower() == "of"):
            var = self.next().text
        elif t.kind == "KW":   # keyword-spelled variable, e.g. (order:Order)
            var = self.next().raw
        base = self._opt_copy_of()
        label_expr = None
        if self.at_punct(":"):
            self.next()
            tree = self._parse_label_expr()
            flat = _flatten_label_conj(tree)
            if flat is not None:
                labels = flat               # plain conjunction: fast path
            else:
                label_expr = tree
        if self.at_punct("{"):
            props = self.parse_map_entries()
        where = None
        if self.at_kw("where"):
            self.next()
            where = self.parse_expr()
        self.eat_punct(")")
        return A.NodePattern(var, tuple(labels), props, base, label_expr,
                             where)

    def _parse_label_expr(self):
        """GQL label expression after the ':' — ``A``, ``A:B``/``A&B``,
        ``A|B``, ``!A``, parenthesized.  Returns the tree documented on
        NodePattern.label_expr."""
        def term():
            if self.opt_punct("!"):
                return ("not", term())
            if self.opt_punct("("):
                e = disj()
                self.eat_punct(")")
                return e
            return ("lbl", self.ident())

        def conj():
            e = term()
            while self.at_punct("&", ":"):
                self.next()
                e = ("and", e, term())
            return e

        def disj():
            e = conj()
            while self.opt_punct("|"):
                e = ("or", e, conj())
            return e

        return disj()

    def parse_rel_pattern(self) -> A.RelPattern:
        direction = "out"
        if self.at_punct("<-"):
            self.next()
            direction = "in"
        else:
            self.eat_punct("-")
        var = None
        types = []
        props: tuple = ()
        var_length = False
        lo = hi = None
        base = None
        if self.at_punct("["):
            self.next()
            if self.peek().kind == "IDENT" and not (
                    self.peek().text.lower() == "copy"
                    and self.peek(1).kind == "IDENT"
                    and self.peek(1).text.lower() == "of"):
                var = self.next().text
            elif self.peek().kind == "KW":
                var = self.next().raw
            base = self._opt_copy_of()
            while self.at_punct(":"):
                self.next()
                types.append(self.ident())
                while self.at_punct("|"):
                    self.next()
                    self.opt_punct(":")
                    types.append(self.ident())
            if self.at_punct("*"):
                self.next()
                var_length = True
                lo, hi = 1, None
                if self.peek().kind == "INT":
                    lo = int(self.next().text)
                    hi = lo
                if self.at_punct(".."):
                    self.next()
                    hi = None
                    if self.peek().kind == "INT":
                        hi = int(self.next().text)
            if self.at_punct("{"):
                props = self.parse_map_entries()
            where = None
            if self.at_kw("where"):
                self.next()
                where = self.parse_expr()
            self.eat_punct("]")
        else:
            where = None
        if self.at_punct("->"):
            self.next()
            if direction == "in":
                self.err("invalid relationship direction <- .. ->")
        else:
            self.eat_punct("-")
            if direction == "out":
                direction = "both"
        return A.RelPattern(var, tuple(types), direction, props, var_length,
                            lo, hi, base, where)

    def parse_map_entries(self) -> tuple:
        self.eat_punct("{")
        entries = []
        if not self.at_punct("}"):
            while True:
                k = self.ident()
                self.eat_punct(":")
                entries.append((k, self.parse_expr()))
                if not self.opt_punct(","):
                    break
        self.eat_punct("}")
        return tuple(entries)

    # -- expressions ----------------------------------------------------
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        e = self.parse_xor()
        while self.at_kw("or"):
            self.next()
            e = E.BinOp("OR", e, self.parse_xor())
        return e

    def parse_xor(self):
        e = self.parse_and()
        while self.at_kw("xor"):
            self.next()
            e = E.BinOp("XOR", e, self.parse_and())
        return e

    def parse_and(self):
        e = self.parse_not()
        while self.at_kw("and"):
            self.next()
            e = E.BinOp("AND", e, self.parse_not())
        return e

    def parse_not(self):
        if self.at_kw("not"):
            self.next()
            child = self.parse_not()
            if isinstance(child, E.PatternPredicate):
                return E.PatternPredicate(child.pattern, negated=not child.negated)
            return E.Not(child)
        return self.parse_comparison()

    def parse_comparison(self):
        e = self.parse_additive()
        out = None
        while True:
            if self.at_punct("=", "<>", "<", "<=", ">", ">=", "=~"):
                op = self.next().text
                rhs = self.parse_additive()
                term = E.BinOp(op, e, rhs)
                out = term if out is None else E.BinOp("AND", out, term)
                e = rhs
            elif self.at_kw("in"):
                self.next()
                term = E.BinOp("IN", e, self.parse_additive())
                out = term if out is None else E.BinOp("AND", out, term)
            elif self.at_kw("starts"):
                self.next()
                self.eat_kw("with")
                term = E.BinOp("STARTS WITH", e, self.parse_additive())
                out = term if out is None else E.BinOp("AND", out, term)
            elif self.at_kw("ends"):
                self.next()
                self.eat_kw("with")
                term = E.BinOp("ENDS WITH", e, self.parse_additive())
                out = term if out is None else E.BinOp("AND", out, term)
            elif self.at_kw("contains"):
                self.next()
                term = E.BinOp("CONTAINS", e, self.parse_additive())
                out = term if out is None else E.BinOp("AND", out, term)
            elif self.at_kw("is"):
                self.next()
                negated = self.opt_kw("not")
                self.eat_kw("null")
                term = E.IsNull(e, negated)
                out = term if out is None else E.BinOp("AND", out, term)
            else:
                break
        return out if out is not None else e

    def parse_additive(self):
        e = self.parse_multiplicative()
        while self.at_punct("+", "-"):
            op = self.next().text
            e = E.BinOp(op, e, self.parse_multiplicative())
        return e

    def parse_multiplicative(self):
        e = self.parse_unary()
        while self.at_punct("*", "/", "%"):
            op = self.next().text
            e = E.BinOp(op, e, self.parse_unary())
        return e

    def parse_unary(self):
        # Unary minus binds LOOSER than exponentiation (Neo4j operator
        # precedence): -2^2 = -(2^2) = -4.
        if self.at_punct("-"):
            self.next()
            return E.Neg(self.parse_unary())
        if self.at_punct("+"):
            self.next()
            return self.parse_unary()
        return self.parse_power()

    def parse_power(self):
        e = self.parse_postfix()
        if self.at_punct("^"):
            self.next()
            # right-associative; rhs through parse_unary so 2 ^ -1 parses
            return E.BinOp("^", e, self.parse_unary())
        return e

    def parse_postfix(self):
        e = self.parse_atom()
        while True:
            if self.at_punct("."):
                self.next()
                e = E.Property(e, self.ident())
            elif self.at_punct("["):
                self.next()
                lo = None
                if not self.at_punct(".."):
                    lo = self.parse_expr()
                if self.at_punct(".."):
                    self.next()
                    hi = None
                    if not self.at_punct("]"):
                        hi = self.parse_expr()
                    self.eat_punct("]")
                    e = E.ListSlice(e, lo, hi)
                else:
                    self.eat_punct("]")
                    e = E.Subscript(e, lo)
            elif self.at_punct("{") and isinstance(e, E.Var):
                # map projection: n {.name, alias: expr, .*}
                self.next()
                items = []
                all_props = False
                if not self.at_punct("}"):
                    while True:
                        if self.at_punct("."):
                            self.next()
                            if self.at_punct("*"):
                                self.next()
                                all_props = True
                            else:
                                key = self.ident()
                                items.append((key, E.Property(e, key)))
                        else:
                            key = self.ident()
                            self.eat_punct(":")
                            items.append((key, self.parse_expr()))
                        if not self.opt_punct(","):
                            break
                self.eat_punct("}")
                e = E.MapProjection(e, tuple(items), all_props)
            elif self.at_punct(":") and isinstance(e, E.Var):
                # n:Label[:Label2] predicate in expression position
                node = E.NodeVar(e.name)
                term = None
                while self.at_punct(":"):
                    self.next()
                    h = E.HasLabel(node, self.ident())
                    term = h if term is None else E.BinOp("AND", term, h)
                e = term
            else:
                return e

    # -- atoms ----------------------------------------------------------
    def parse_atom(self):
        t = self.peek()

        if t.kind == "INT":
            self.next()
            return E.Lit(int(t.text))
        if t.kind == "FLOAT":
            self.next()
            return E.Lit(_finite_float(t.text, t.pos))
        if t.kind == "STRING":
            self.next()
            return E.Lit(_unescape(t.text))
        if t.kind == "PARAM":
            self.next()
            return E.Param(t.text[1:])

        if t.kind == "KW":
            if t.text == "null":
                self.next()
                return E.Lit(None)
            if t.text == "true":
                self.next()
                return E.Lit(True)
            if t.text == "false":
                self.next()
                return E.Lit(False)
            if t.text == "case":
                return self.parse_case()
            if t.text in ("any", "all", "none", "single") and \
                    self.peek(1).kind == "PUNCT" and self.peek(1).text == "(":
                return self.parse_list_predicate()
            if t.text == "reduce":
                return self.parse_reduce()
            if t.text == "exists":
                return self.parse_exists()
            # keyword used as function name (e.g. count) or bare identifier
            if self.peek(1).kind == "PUNCT" and self.peek(1).text == "(":
                return self.parse_func_call()
            # bare keyword-spelled variable reference (e.g. a var named
            # `order`); safe because parse_atom only runs where an
            # expression is mandatory.
            self.next()
            return E.Var(t.raw)

        if t.kind == "IDENT":
            nxt = self.peek(1)
            # namespaced function call, e.g. duration.between(a, b)
            if nxt.kind == "PUNCT" and nxt.text == "." and \
                    self.peek(2).kind in ("IDENT", "KW") and \
                    self.peek(3).kind == "PUNCT" and self.peek(3).text == "(":
                name_tok = self.peek(2)
                qual = f"{t.text}.{name_tok.raw if name_tok.kind == 'KW' else name_tok.text}"
                if qual.lower() in _NAMESPACED_FUNCS:
                    self.next(); self.next(); self.next()
                    self.eat_punct("(")
                    args = []
                    if not self.at_punct(")"):
                        while True:
                            args.append(self.parse_expr())
                            if not self.opt_punct(","):
                                break
                    self.eat_punct(")")
                    return E.FuncCall(qual.lower(), tuple(args), False)
            if nxt.kind == "PUNCT" and nxt.text == "(":
                return self.parse_func_call()
            if t.text.lower() == "count" and nxt.kind == "PUNCT" \
                    and nxt.text == "{":
                # COUNT { [MATCH] pattern [WHERE expr] } counting subquery
                # (Cypher 5): rewrites to the size of a pattern
                # comprehension projecting 1 per match — the same plan as
                # size((..)-->(..))
                self.next()
                self.eat_punct("{")
                if self.at_kw("match"):
                    self.next()
                part = self.parse_pattern_part()
                where = None
                if self.at_kw("where"):
                    self.next()
                    where = self.parse_expr()
                self.eat_punct("}")
                return E.FuncCall("size", (E.PatternComprehension(
                    part, where, E.Lit(1)),), False)
            self.next()
            return E.Var(t.text)

        if self.at_punct("("):
            # pattern predicate vs parenthesised expression: backtrack.
            save = self.pos
            try:
                part = self.parse_pattern_part()
                if len(part.elements) > 1:
                    return E.PatternPredicate(part)
            except CypherSyntaxError:
                pass
            self.pos = save
            self.next()
            e = self.parse_expr()
            self.eat_punct(")")
            return e

        if self.at_punct("["):
            return self.parse_list_atom()

        if self.at_punct("{"):
            return E.MapLit(self.parse_map_entries())

        self.err("expected expression")

    def parse_func_call(self):
        name = self.ident().lower()
        self.eat_punct("(")
        if name == "count" and self.at_punct("*"):
            self.next()
            self.eat_punct(")")
            return E.CountStar()
        distinct = self.opt_kw("distinct")
        args = []
        if not self.at_punct(")"):
            while True:
                args.append(self.parse_expr())
                if not self.opt_punct(","):
                    break
        self.eat_punct(")")
        if name in ("size", "length") and len(args) == 1 \
                and isinstance(args[0], E.PatternPredicate) \
                and not args[0].negated:
            # size((n)-[:T]->()) counts pattern matches: rewrite to the
            # size of a pattern comprehension projecting 1 per match
            # (legacy openCypher pattern expression in size()).
            return E.FuncCall("size", (E.PatternComprehension(
                args[0].pattern, None, E.Lit(1)),), False)
        return E.FuncCall(name, tuple(args), distinct)

    def parse_case(self):
        self.eat_kw("case")
        test = None
        if not self.at_kw("when"):
            test = self.parse_expr()
        alts = []
        while self.at_kw("when"):
            self.next()
            w = self.parse_expr()
            self.eat_kw("then")
            alts.append((w, self.parse_expr()))
        default = None
        if self.at_kw("else"):
            self.next()
            default = self.parse_expr()
        self.eat_kw("end")
        return E.CaseExpr(test, tuple(alts), default)

    def parse_list_predicate(self):
        kind = self.next().text
        self.eat_punct("(")
        var = self.ident()
        self.eat_kw("in")
        lst = self._sub_localized(var, self.parse_expr)
        self.eat_kw("where")
        pred = self._sub_localized(var, self.parse_expr)
        self.eat_punct(")")
        return E.ListPredicate(kind, var, _localize(lst, var, strip=True),
                               _localize(pred, var))

    def parse_reduce(self):
        self.eat_kw("reduce")
        self.eat_punct("(")
        acc = self.ident()
        self.eat_punct("=")
        init = self.parse_expr()
        self.eat_punct(",")
        var = self.ident()
        self.eat_kw("in")
        lst = self.parse_expr()
        self.eat_punct("|")
        step = self.parse_expr()
        self.eat_punct(")")
        return E.ListReduce(acc, init, var, lst,
                            _localize(_localize(step, var), acc))

    def parse_exists(self):
        self.eat_kw("exists")
        if self.opt_punct("{"):
            # existential subquery: EXISTS { [MATCH] pattern [WHERE expr] }
            # (GQL / Cypher-10 form; same plan as the exists() pattern
            # predicate, with the inner WHERE carried along)
            if self.at_kw("match"):
                self.next()
            part = self.parse_pattern_part()
            if self.peek().kind == "PUNCT" and self.peek().text == ",":
                self.err("EXISTS { } supports a single pattern")
            where = None
            if self.at_kw("where"):
                self.next()
                where = self.parse_expr()
            self.eat_punct("}")
            return E.PatternPredicate(part, where=where)
        self.eat_punct("(")
        save = self.pos
        try:
            part = self.parse_pattern_part()
            if len(part.elements) > 1:
                self.eat_punct(")")
                return E.PatternPredicate(part)
        except CypherSyntaxError:
            pass
        self.pos = save
        e = self.parse_expr()
        self.eat_punct(")")
        return E.FuncCall("exists", (e,))

    def parse_list_atom(self):
        # [x IN list WHERE p | proj]  or plain list literal
        save = self.pos
        self.eat_punct("[")
        if self.peek().kind == "IDENT" and self.peek(1).kind == "KW" and \
                self.peek(1).text == "in":
            var = self.ident()
            self.eat_kw("in")
            lst = self.parse_expr()
            where = None
            proj = None
            if self.at_kw("where"):
                self.next()
                where = self.parse_expr()
            if self.at_punct("|"):
                self.next()
                proj = self.parse_expr()
            self.eat_punct("]")
            return E.ListComprehension(
                var, _localize(lst, var, strip=True),
                _localize(where, var) if where is not None else None,
                _localize(proj, var) if proj is not None else None)
        self.pos = save
        self.eat_punct("[")
        # [ (a)-[:T]->(b) WHERE pred | proj ]  — pattern comprehension,
        # optionally with a named-path binder ``[p = (a)-->(b) | p]``.
        # A parenthesized scalar like [(1), (2)] also starts with '(' but
        # fails the pattern parse (or lacks the mandatory '|'), so it falls
        # through to the list literal.
        t = self.peek()
        named_comp = (t.kind in ("IDENT", "KW")
                      and self.peek(1).kind == "PUNCT"
                      and self.peek(1).text == "="
                      and self.peek(2).kind == "PUNCT"
                      and self.peek(2).text == "(")
        if self.at_punct("(") or named_comp:
            try:
                path_name = None
                if named_comp:
                    path_name = t.raw if t.kind == "KW" else t.text
                    self.next()
                    self.next()
                part = self.parse_pattern_part()
                if path_name is not None:
                    part = dataclasses.replace(part, path_var=path_name)
                if len(part.elements) > 1:
                    where = None
                    if self.at_kw("where"):
                        self.next()
                        where = self.parse_expr()
                    if self.at_punct("|"):
                        self.next()
                        proj = self.parse_expr()
                        self.eat_punct("]")
                        return E.PatternComprehension(part, where, proj)
            except CypherSyntaxError:
                pass
            self.pos = save
            self.eat_punct("[")
        items = []
        if not self.at_punct("]"):
            while True:
                items.append(self.parse_expr())
                if not self.opt_punct(","):
                    break
        self.eat_punct("]")
        return E.ListLit(tuple(items))

    def _sub_localized(self, var, fn):
        return fn()


def _localize(e, var, strip=False):
    """Rewrite Var(var) -> LocalVar(var) inside lambda bodies."""
    if e is None:
        return None
    if isinstance(e, E.Var) and e.name == var and not strip:
        return E.LocalVar(var)
    if isinstance(e, E.Var) or isinstance(e, (E.Lit, E.Param, E.CountStar,
                                              E.LocalVar)):
        return e
    # generic rebuild via dataclass fields
    import dataclasses
    if dataclasses.is_dataclass(e):
        changes = {}
        for f in dataclasses.fields(e):
            v = getattr(e, f.name)
            if isinstance(v, E.Expr):
                changes[f.name] = _localize(v, var)
            elif isinstance(v, tuple):
                newv = tuple(
                    _localize(x, var) if isinstance(x, E.Expr)
                    else (tuple(_localize(y, var) if isinstance(y, E.Expr) else y
                                for y in x) if isinstance(x, tuple) else x)
                    for x in v)
                changes[f.name] = newv
        if changes:
            return dataclasses.replace(e, **changes)
    return e


def parse(query: str) -> A.Query:
    return Parser(query).parse_query()


# ---------------------------------------------------------------------------
# Literal -> parameter extraction + AST cache (the reference's AstRewriting
# literal extraction, okapi-ir/.../impl/parse/CypherParser.scala:72): a
# pipeline issuing thousands of structurally identical queries with varying
# literals parses ONE skeleton; per call only the values are rebound.
# ---------------------------------------------------------------------------

_LITERAL_KINDS = frozenset(("INT", "FLOAT", "STRING"))
_AST_CACHE: dict = {}
_AST_CACHE_MAX = 512
ast_cache_stats = {"hits": 0, "misses": 0}


def parameterize(src: str):
    """Extract literals: returns (skeleton text, {auto-param: value}).
    Var-length bounds and slice bounds (a token touching ``..`` or
    following ``*``) stay literal — they are pattern syntax, not
    expressions."""
    toks = tokenize(src)
    pieces = []
    values = {}
    last = 0
    for i, t in enumerate(toks):
        if t.kind not in _LITERAL_KINDS:
            continue
        prev = toks[i - 1] if i else None
        nxt = toks[i + 1]
        if prev is not None and prev.kind == "PUNCT" and \
                prev.text in ("*", ".."):
            continue
        if nxt.kind == "PUNCT" and nxt.text == "..":
            continue
        if t.kind == "INT":
            v = int(t.text)
        elif t.kind == "FLOAT":
            v = _finite_float(t.text, t.pos)
        else:
            v = _unescape(t.text)
        name = f"__lit{len(values)}"
        values[name] = v
        pieces.append(src[last:t.pos])
        pieces.append(f"${name}")
        last = t.pos + len(t.raw)
    pieces.append(src[last:])
    return "".join(pieces), values


def parse_parameterized(src: str):
    """Parse via the skeleton cache: literal-differing queries of the same
    shape share one parsed AST.  Returns (ast, auto_params, skeleton) —
    the skeleton doubles as the session plan-cache key (session.py)."""
    skeleton, values = parameterize(src)
    ast = _AST_CACHE.get(skeleton)
    if ast is None:
        ast_cache_stats["misses"] += 1
        if len(_AST_CACHE) >= _AST_CACHE_MAX:
            _AST_CACHE.clear()
        ast = parse(skeleton)
        _AST_CACHE[skeleton] = ast
    else:
        ast_cache_stats["hits"] += 1
    return ast, values, skeleton
