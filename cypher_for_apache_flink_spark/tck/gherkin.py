"""Minimal Gherkin parser for openCypher TCK ``.feature`` files.

Covers the constructs the TCK actually uses — ``Feature`` / ``Background``
/ ``Scenario`` / ``Scenario Outline`` + ``Examples`` / tags / step
docstrings (``\"\"\"`` blocks) / data tables (``| a | b |``) — not the full
Gherkin language.  Reference analogue: the reference consumes the TCK
through the opencypher ``tck-api`` artifact (TckSparkCypherTest.scala:39);
this is the from-scratch equivalent for a Python harness.
"""
from __future__ import annotations

import os
import re
from dataclasses import dataclass, field


@dataclass
class Step:
    keyword: str                      # Given / When / Then / And / But
    text: str
    docstring: str | None = None
    table: list[list[str]] | None = None


@dataclass
class Scenario:
    feature: str
    name: str
    steps: list[Step] = field(default_factory=list)
    tags: tuple = ()

    def __str__(self) -> str:         # matches the blacklist line format
        return f'Feature "{self.feature}": Scenario "{self.name}"'


@dataclass
class Feature:
    name: str
    background: list[Step] = field(default_factory=list)
    scenarios: list[Scenario] = field(default_factory=list)


_STEP_RE = re.compile(r"^(Given|When|Then|And|But)\s+(.*)$")


def _split_table_row(line: str) -> list[str]:
    # cells are |-delimited; \| escapes a literal pipe inside a cell
    body = line.strip()
    assert body.startswith("|")
    cells, cur, i = [], "", 1
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body) and body[i + 1] == "|":
            cur += "|"
            i += 2
            continue
        if ch == "|":
            cells.append(cur.strip())
            cur = ""
        else:
            cur += ch
        i += 1
    return cells


def parse_feature(text: str, filename: str = "<string>") -> Feature:
    lines = text.splitlines()
    n = len(lines)
    i = 0
    feature: Feature | None = None
    pending_tags: list[str] = []

    def skip_blank(j):
        while j < n and (not lines[j].strip()
                         or lines[j].strip().startswith("#")):
            j += 1
        return j

    def parse_steps(j):
        """Parse consecutive step lines (+ attached docstrings/tables)."""
        steps = []
        while True:
            j = skip_blank(j)
            if j >= n:
                break
            m = _STEP_RE.match(lines[j].strip())
            if not m:
                break
            step = Step(m.group(1), m.group(2).strip())
            j += 1
            j = skip_blank(j)
            if j < n and lines[j].strip() in ('"""', "'''"):
                quote = lines[j].strip()
                indent = len(lines[j]) - len(lines[j].lstrip())
                j += 1
                doc = []
                while j < n and lines[j].strip() != quote:
                    doc.append(lines[j][indent:] if
                               lines[j][:indent].strip() == "" else lines[j])
                    j += 1
                if j >= n:
                    raise ValueError(f"{filename}: unterminated docstring")
                j += 1
                step.docstring = "\n".join(doc)
            else:
                rows = []
                while j < n and lines[j].strip().startswith("|"):
                    rows.append(_split_table_row(lines[j]))
                    j += 1
                if rows:
                    step.table = rows
            steps.append(step)
        return steps, j

    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.startswith("@"):
            pending_tags.extend(t for t in line.split() if t.startswith("@"))
            i += 1
            continue
        if line.startswith("Feature:"):
            feature = Feature(line[len("Feature:"):].strip())
            pending_tags = []
            i += 1
            # skip the free-form feature description until a keyword line
            while i < n:
                s = lines[i].strip()
                if (s.startswith(("Background:", "Scenario:",
                                  "Scenario Outline:", "@"))):
                    break
                i += 1
            continue
        if feature is None:
            raise ValueError(f"{filename}: content before Feature: line")
        if line.startswith("Background:"):
            i += 1
            feature.background, i = parse_steps(i)
            continue
        if line.startswith("Scenario Outline:"):
            name = line[len("Scenario Outline:"):].strip()
            tags = tuple(pending_tags)
            pending_tags = []
            i += 1
            steps, i = parse_steps(i)
            i = skip_blank(i)
            if i >= n or not lines[i].strip().startswith("Examples:"):
                raise ValueError(
                    f"{filename}: Scenario Outline {name!r} has no Examples")
            i += 1
            i = skip_blank(i)
            rows = []
            while i < n and lines[i].strip().startswith("|"):
                rows.append(_split_table_row(lines[i]))
                i += 1
            header, examples = rows[0], rows[1:]
            for k, ex in enumerate(examples):
                subs = dict(zip(header, ex))

                def sub(s: str) -> str:
                    for key, val in subs.items():
                        s = s.replace(f"<{key}>", val)
                    return s

                inst = [Step(s.keyword, sub(s.text),
                             sub(s.docstring) if s.docstring else None,
                             [[sub(c) for c in r] for r in s.table]
                             if s.table else None)
                        for s in steps]
                # the TCK convention: outline examples are scenarios named
                # "<name> #<k>" (1-based) — blacklists reference them so
                feature.scenarios.append(Scenario(
                    feature.name, f"{name} #{k + 1}", inst, tags))
            continue
        if line.startswith("Scenario:"):
            name = line[len("Scenario:"):].strip()
            tags = tuple(pending_tags)
            pending_tags = []
            i += 1
            steps, i = parse_steps(i)
            feature.scenarios.append(
                Scenario(feature.name, name, steps, tags))
            continue
        raise ValueError(f"{filename}:{i + 1}: unexpected line {line!r}")
    if feature is None:
        raise ValueError(f"{filename}: no Feature found")
    return feature


def load_features(directory: str) -> list[Feature]:
    out = []
    for fn in sorted(os.listdir(directory)):
        if fn.endswith(".feature"):
            path = os.path.join(directory, fn)
            with open(path, encoding="utf-8") as f:
                out.append(parse_feature(f.read(), path))
    return out
