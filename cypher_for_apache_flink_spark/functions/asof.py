"""As-of (nearest-timestamp) joins -- the temporal-alignment primitive
Spark's DataFrame API lacks natively (pandas has merge_asof; Flink/kdb
have AS OF / aj).  The training-data use case: attribute an outcome
event to the latest preceding context event of the same entity
(purchase -> most recent prior view, label -> most recent prior model
snapshot, trade -> latest quote).

Design (100-TB shape): the classic UNION + WINDOW formulation, not a
range join and not a per-key loop --

1. dedupe the right side to ONE row per (key, ts) with a deterministic
   tiebreak (greatest packed payload struct), so "the" as-of match is
   well-defined;
2. tag left rows side=1 and right rows side=0 and union them on
   (key, ts, side, payload);
3. one window per key ordered by (ts, side):
   ``last(payload, ignorenulls=true)`` over the unbounded-preceding
   frame carries the latest right payload forward onto every left row
   -- right sorts BEFORE left at equal ts, so an exactly-simultaneous
   right row matches (<= semantics);
4. filter back to left rows and null out matches older than
   ``tolerance``.

Cost: ONE shuffle of |left| + |right-deduped| rows hash-partitioned on
the key, then a linear in-partition pass -- the same exchange a plain
equi-join would pay, with no candidate blow-up (a range join on
``l.ts BETWEEN r.ts AND r.ts + tol`` materializes every in-window pair
first; the window keeps exactly one).  Skew follows the key's own
distribution; salting the union input helps the same way it helps any
keyed window.

``direction="forward"`` mirrors the ordering (earliest right at
ts' >= left ts).  ``direction="nearest"`` (round 11) computes both
carries under ONE sort -- two frames over the same ordering -- and
picks the closer in-tolerance side per row, distance ties backward
(pandas merge_asof parity).
"""
from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TOL_UNITS_US = {
    "microsecond": 1, "microseconds": 1,
    "millisecond": 1_000, "milliseconds": 1_000,
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
    "week": 7 * 86_400_000_000, "weeks": 7 * 86_400_000_000,
}


def _tolerance_us(tolerance: str) -> int:
    """Parse '<n> <unit>' into exact microseconds, raising a typed
    ValueError up front (round 11, ADVICE r10): the raw string used to
    be interpolated into ``F.expr(f"INTERVAL {tolerance}")``, so a typo
    surfaced as an opaque Catalyst parse error at action time -- and
    the interpolation itself was an injection surface.  The interval
    the plan uses is built from this integer, never from user text."""
    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]+)\s*", str(tolerance))
    if not m or m.group(2).lower() not in _TOL_UNITS_US:
        raise ValueError(
            "asof_join: tolerance must be '<n> <microseconds|milliseconds"
            f"|seconds|minutes|hours|days|weeks>', got {tolerance!r}")
    return int(m.group(1)) * _TOL_UNITS_US[m.group(2).lower()]


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              tolerance: str | None = None,
              direction: str = "backward",
              right_prefix: str = "asof_") -> DataFrame:
    """For every ``left`` row, attach the single ``right`` row of the
    same ``on`` key whose timestamp is the latest <= the left timestamp
    (``direction="backward"``; ``"forward"`` = earliest >=).  Right
    columns come back ``right_prefix``-renamed (the match timestamp as
    ``<prefix><right_ts>``); unmatched left rows keep NULLs (left-outer
    semantics).  ``tolerance`` (an INTERVAL string, e.g. ``"10
    minutes"``) voids matches farther than that from the left
    timestamp.

    Deterministic: right rows sharing (key, ts) collapse to the
    greatest payload struct, so results never depend on partitioning.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction must be backward|forward|nearest, "
            f"got {direction!r}")
    tol_us = _tolerance_us(tolerance) if tolerance is not None else None
    payload_cols = [c for c in right.columns if c != on]
    if right_ts not in right.columns:
        raise ValueError(f"asof_join: right side has no column "
                         f"{right_ts!r}")
    # one row per (key, ts): deterministic greatest-struct tiebreak
    r = (right.groupBy(F.col(on).alias("__k"),
                       F.col(right_ts).alias("__ts"))
         .agg(F.max(F.struct(*[F.col(c) for c in payload_cols]))
              .alias("__p")))
    l = left.select(F.col(on).alias("__k"),
                    F.col(left_ts).alias("__ts"),
                    F.struct(*[F.col(c) for c in left.columns])
                    .alias("__l"))
    tagged = (r.select("__k", "__ts", F.lit(0).alias("__side"),
                       F.lit(None).cast(l.schema["__l"].dataType)
                       .alias("__l"), "__p")
              .unionByName(l.select(
                  "__k", "__ts", F.lit(1).alias("__side"), "__l",
                  F.lit(None).cast(r.schema["__p"].dataType)
                  .alias("__p"))))
    if direction == "nearest":
        # ONE sort, TWO frames (round 11): the backward frame keeps <=
        # semantics (right sorts before left at equal ts), the forward
        # frame under the SAME ordering is strictly-greater -- safe,
        # because an equal-ts match is distance 0 and the backward
        # carry already holds it.  Tolerance voids each side BEFORE
        # the pick (the nearest IN-tolerance candidate wins, like
        # pandas merge_asof); distance ties break backward.
        w_b = (Window.partitionBy("__k")
               .orderBy(F.col("__ts").asc(), F.col("__side").asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        w_f = (Window.partitionBy("__k")
               .orderBy(F.col("__ts").asc(), F.col("__side").asc())
               .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        rts = F.when(F.col("__side") == 0, F.col("__ts"))
        carried = tagged.select(
            "__k", "__ts", "__side", "__l",
            F.last("__p", ignorenulls=True).over(w_b).alias("__bm"),
            F.last(rts, ignorenulls=True).over(w_b).alias("__bts"),
            F.first("__p", ignorenulls=True).over(w_f).alias("__fm"),
            F.first(rts, ignorenulls=True).over(w_f).alias("__fts"))
        out = carried.where(F.col("__side") == 1)
        bm, bts = F.col("__bm"), F.col("__bts")
        fm, fts = F.col("__fm"), F.col("__fts")
        if tol_us is not None:
            tol = F.expr(f"INTERVAL {tol_us} MICROSECOND")
            b_ok = bts >= F.col("__ts") - tol
            f_ok = fts <= F.col("__ts") + tol
            bm, bts = F.when(b_ok, bm), F.when(b_ok, bts)
            fm, fts = F.when(f_ok, fm), F.when(f_ok, fts)
        us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
        lts = us(F.col("__ts"))
        pick_b = fts.isNull() | (bts.isNotNull()
                                 & ((lts - us(bts)) <= (us(fts) - lts)))
        out = out.select(
            "__k", "__ts", "__l",
            F.when(pick_b, bm).otherwise(fm).alias("__m"),
            F.when(pick_b, bts).otherwise(fts).alias("__mts"))
        cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
        cols += [F.col(f"__m.{c}").alias(f"{right_prefix}{c}")
                 for c in payload_cols if c != right_ts]
        cols.append(F.col("__mts").alias(f"{right_prefix}{right_ts}"))
        return out.select(*cols)
    ts_ord = F.col("__ts").asc() if direction == "backward" \
        else F.col("__ts").desc()
    w = (Window.partitionBy("__k").orderBy(ts_ord, F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = tagged.select(
        "__k", "__ts", "__side", "__l",
        F.last("__p", ignorenulls=True).over(w).alias("__m"),
        F.last(F.when(F.col("__side") == 0, F.col("__ts")),
               ignorenulls=True).over(w).alias("__mts"))
    out = carried.where(F.col("__side") == 1)
    if tol_us is not None:
        tol = F.expr(f"INTERVAL {tol_us} MICROSECOND")
        if direction == "backward":
            in_tol = F.col("__mts") >= F.col("__ts") - tol
        else:
            in_tol = F.col("__mts") <= F.col("__ts") + tol
        out = out.select(
            "__k", "__ts", "__l",
            F.when(in_tol, F.col("__m")).alias("__m"),
            F.when(in_tol, F.col("__mts")).alias("__mts"))
    cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"__m.{c}").alias(f"{right_prefix}{c}")
             for c in payload_cols if c != right_ts]
    cols.append(F.col("__mts").alias(f"{right_prefix}{right_ts}"))
    return out.select(*cols)
