"""Diff two bench runs on load-invariant physical metrics (VERDICT r6 #7).

Wall time on this sandbox drifts ±50-90%, so cross-round regression
checks use the per-query physical totals bench.py records via its
AppStatusStore stage diff: shuffle bytes, spill, input bytes, executor
CPU ms, task/stage counts.  Shuffle bytes and task/stage counts are
deterministic given plan + data; CPU ms is near-deterministic.  A >20%
shuffle-bytes growth on an unchanged query flags as a regression.

Usage:
    python tools/bench_diff.py BENCH_LOCAL_r06.json BENCH_LOCAL.json

Accepts either a full bench payload or the driver's wrapper
({"tail": "..."} with a possibly-truncated JSON line) — metrics are
recovered per-query from the tail when the line is cut.
"""

from __future__ import annotations

import json
import re
import sys

FLAG_PCT = 20.0
KEYS = ["shuffle_write_bytes", "shuffle_read_bytes", "spill_bytes",
        "input_bytes", "executor_cpu_ms", "n_tasks", "n_stages"]


def load_metrics(path: str) -> dict[str, dict]:
    raw = json.load(open(path))
    if "metrics" in raw and isinstance(raw["metrics"], dict) \
            and raw["metrics"]:
        return raw["metrics"]
    tail = raw.get("tail", "")
    # recover per-query metric objects from a truncated JSON tail:
    # "name": {"shuffle_write_bytes": ..., ...}
    out = {}
    for m in re.finditer(r'"(\w+)": ({"shuffle_write_bytes":[^}]*})', tail):
        try:
            out[m.group(1)] = json.loads(m.group(2))
        except json.JSONDecodeError:
            pass
    return out


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old = load_metrics(sys.argv[1])
    new = load_metrics(sys.argv[2])
    shared = sorted(set(old) & set(new))
    print(f"| query | metric | {sys.argv[1]} | {sys.argv[2]} | delta |")
    print("|---|---|---:|---:|---:|")
    flags = []
    for q in shared:
        for k in KEYS:
            a, b = old[q].get(k), new[q].get(k)
            if a is None or b is None or (a == 0 and b == 0):
                continue
            pct = 100.0 * (b - a) / a if a else float("inf")
            mark = ""
            if k == "shuffle_write_bytes" and pct > FLAG_PCT:
                mark = " **FLAG**"
                flags.append((q, k, a, b, pct))
            if k in ("shuffle_write_bytes", "executor_cpu_ms") \
                    or abs(pct) > FLAG_PCT:
                print(f"| {q} | {k} | {a} | {b} | {pct:+.1f}%{mark} |")
    print()
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"dropped queries: {only_old}")
    if only_new:
        print(f"new queries: {only_new}")
    if flags:
        print(f"\n{len(flags)} shuffle-bytes regressions over "
              f"{FLAG_PCT:.0f}%:")
        for q, k, a, b, pct in flags:
            print(f"  {q}: {a} -> {b} ({pct:+.1f}%)")
        sys.exit(1)
    print(f"no shuffle-bytes regression over {FLAG_PCT:.0f}% across "
          f"{len(shared)} shared queries")


if __name__ == "__main__":
    main()
