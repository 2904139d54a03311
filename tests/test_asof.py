"""As-of join (functions/asof.py): nearest-timestamp alignment with
tolerance, both directions, deterministic right-side dedup."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_flink_spark.functions.asof import asof_join


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(30)), (3, 20, _ts(5)),
         (4, 30, _ts(50))],
        "event_id long, user long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 10, _ts(8)), (101, 10, _ts(10)), (102, 10, _ts(25)),
         (103, 20, _ts(7)), (104, 30, _ts(0))],
        "rid long, user long, ts timestamp")
    return left, right


def test_backward_basic_and_equal_ts(spark):
    left, right = _frames(spark)
    got = {r.event_id: (r.asof_rid, r.asof_ts)
           for r in asof_join(left, right, on="user").collect()}
    # event 1 at 12:10 matches rid 101 AT 12:10 (<= semantics), not 100
    assert got[1] == (101, _ts(10))
    assert got[2] == (102, _ts(25))
    # event 3 at 12:05 precedes every user-20 right row: no match
    assert got[3] == (None, None)
    assert got[4] == (104, _ts(0))


def test_backward_tolerance_voids_stale_matches(spark):
    left, right = _frames(spark)
    got = {r.event_id: r.asof_rid
           for r in asof_join(left, right, on="user",
                              tolerance="10 minutes").collect()}
    # event 4 at 12:50 is 50 min after rid 104: voided; events 1/2 in range
    assert got == {1: 101, 2: 102, 3: None, 4: None}


def test_forward_direction(spark):
    left, right = _frames(spark)
    got = {r.event_id: r.asof_rid
           for r in asof_join(left, right, on="user",
                              direction="forward").collect()}
    # earliest right at ts >= left ts
    assert got == {1: 101, 2: None, 3: 103, 4: None}


def test_right_dedup_is_deterministic(spark):
    left = spark.createDataFrame([(1, 5, _ts(20))],
                                 "event_id long, user long, ts timestamp")
    # two right rows at the SAME (user, ts): greatest payload struct wins
    right = spark.createDataFrame(
        [(7, 5, _ts(10)), (9, 5, _ts(10))],
        "rid long, user long, ts timestamp")
    for _ in range(3):
        got = asof_join(left, right.repartition(4), on="user").collect()
        assert got[0].asof_rid == 9


def test_all_left_rows_survive(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, on="user").count() == left.count()
    assert asof_join(left, right.limit(0), on="user").count() == 4


def test_invalid_direction_raises(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, on="user", direction="sideways")


def test_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    # deterministic pseudo-random event streams over 7 keys
    lrows = [(i, i % 7, _ts((i * 13 + 5) % 60, (i * 29) % 60))
             for i in range(120)]
    rrows = [(1000 + i, i % 7, _ts((i * 11 + 2) % 60, (i * 17) % 60))
             for i in range(90)]
    left = spark.createDataFrame(
        lrows, "event_id long, user long, ts timestamp")
    right = spark.createDataFrame(
        rrows, "rid long, user long, ts timestamp")
    got = sorted(
        (r.event_id, r.asof_rid,
         None if r.asof_ts is None else r.asof_ts.isoformat())
        for r in asof_join(left, right, on="user",
                           tolerance="10 minutes").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE l(event_id BIGINT, u BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", lrows)
    con.execute("CREATE TABLE r(rid BIGINT, u BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", rrows)
    want = sorted(
        (eid, rid, None if mts is None else mts.isoformat())
        for eid, rid, mts in con.execute("""
        WITH v AS (SELECT u, ts, max(rid) AS rid FROM r GROUP BY u, ts)
        SELECT l.event_id, arg_max(v.rid, v.ts), max(v.ts)
        FROM l LEFT JOIN v ON v.u = l.u AND v.ts <= l.ts
             AND v.ts >= l.ts - INTERVAL 10 MINUTE
        GROUP BY l.event_id""").fetchall())
    assert got == want


def test_asof_plan_single_keyed_window_exchange(spark):
    """Plan gate (round 10): the as-of core is ONE hash exchange on the
    key feeding ONE window — a range join would materialize every
    in-tolerance candidate pair instead."""
    left, right = _frames(spark)
    plan = (asof_join(left, right, on="user", tolerance="5 minutes")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") == 1
    # exchanges: one hashpartitioning(__k) for the window + one for the
    # right-side (key, ts) dedup aggregate; nothing else
    import re
    hashes = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert len(hashes) == 2, hashes


def test_forward_with_tolerance(spark):
    left, right = _frames(spark)
    got = {r.event_id: r.asof_rid
           for r in asof_join(left, right, on="user", direction="forward",
                              tolerance="3 minutes").collect()}
    # event 1 at 12:10 -> rid 101 at 12:10 (0 min); event 3 at 12:05 ->
    # rid 103 at 12:07 (2 min); event 4's nearest future row is beyond
    # any user-30 right row entirely
    assert got == {1: 101, 2: None, 3: 103, 4: None}


def test_tolerance_validated_up_front(spark):
    """Round 11 (ADVICE r10): malformed tolerance raises a typed
    ValueError at plan-construction time, not an opaque Catalyst parse
    error at action time -- and the interval the plan uses is built
    from the parsed integer, never from interpolated user text."""
    left, right = _frames(spark)
    for bad in ("3 fortnights", "minutes", "10; DROP TABLE x", ""):
        with pytest.raises(ValueError, match="tolerance"):
            asof_join(left, right, on="user", tolerance=bad)


def test_tolerance_unit_surface(spark):
    """The parsed-unit table covers sub-second and week units; '90
    seconds' and '1500 milliseconds'-style tolerances behave exactly as
    their microsecond equivalents."""
    from cypher_for_apache_flink_spark.functions.asof import _tolerance_us
    assert _tolerance_us("1500 milliseconds") == 1_500_000
    assert _tolerance_us("90 seconds") == 90_000_000
    assert _tolerance_us("2 weeks") == 14 * 86_400_000_000
    left, right = _frames(spark)
    a = {r.event_id: r.asof_rid for r in asof_join(
        left, right, on="user", tolerance="300 seconds").collect()}
    b = {r.event_id: r.asof_rid for r in asof_join(
        left, right, on="user", tolerance="5 minutes").collect()}
    assert a == b


def test_nearest_direction(spark):
    left, right = _frames(spark)
    got = {r.event_id: (r.asof_rid, r.asof_ts)
           for r in asof_join(left, right, on="user",
                              direction="nearest").collect()}
    # event 1 at 12:10: rid 101 AT 12:10 is distance 0 — beats 100/102
    assert got[1] == (101, _ts(10))
    # event 2 at 12:30: backward 102@12:25 (5 min) vs nothing forward
    assert got[2] == (102, _ts(25))
    # event 3 at 12:05: nothing backward, forward 103@12:07 matches
    assert got[3] == (103, _ts(7))
    # event 4 at 12:50: only backward 104@12:00
    assert got[4] == (104, _ts(0))


def test_nearest_tie_breaks_backward(spark):
    left = spark.createDataFrame([(1, 10, _ts(10))],
                                 "event_id long, user long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 10, _ts(8)), (101, 10, _ts(12))],
        "rid long, user long, ts timestamp")
    got = asof_join(left, right, on="user",
                    direction="nearest").collect()[0]
    assert (got.asof_rid, got.asof_ts) == (100, _ts(8))


def test_nearest_tolerance_voids_both_sides(spark):
    # backward 6 min away, forward 8 min away: a 5-minute tolerance
    # voids both (tolerance is symmetric, so the nearer side being out
    # implies the farther is too); an 8-minute tolerance readmits both
    # and the nearer backward candidate wins
    left = spark.createDataFrame([(1, 10, _ts(30))],
                                 "event_id long, user long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 10, _ts(24)), (101, 10, _ts(38))],
        "rid long, user long, ts timestamp")
    got = asof_join(left, right, on="user", direction="nearest",
                    tolerance="5 minutes").collect()[0]
    assert got.asof_rid is None and got.asof_ts is None
    got = asof_join(left, right, on="user", direction="nearest",
                    tolerance="8 minutes").collect()[0]
    assert (got.asof_rid, got.asof_ts) == (100, _ts(24))


def test_nearest_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    rows_l = [(i, i % 7, _ts((i * 13) % 60, i % 60)) for i in range(60)]
    rows_r = [(100 + i, i % 7, _ts((i * 11 + 3) % 60, (i * 17) % 60))
              for i in range(80)]
    left = spark.createDataFrame(rows_l,
                                 "event_id long, user long, ts timestamp")
    right = spark.createDataFrame(rows_r,
                                  "rid long, user long, ts timestamp")
    got = sorted((r.event_id, r.asof_rid) for r in asof_join(
        left, right, on="user", direction="nearest",
        tolerance="10 minutes").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE l(event_id BIGINT, u BIGINT, ts TIMESTAMP)")
    con.execute("CREATE TABLE r(rid BIGINT, u BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", rows_l)
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", rows_r)
    # dedup right per (u, ts) by max rid (greatest-struct tiebreak),
    # then argmin over (abs gap, backward-first, right ts) candidates
    want = sorted(map(tuple, con.execute("""
WITH rd AS (SELECT u, ts, max(rid) AS rid FROM r GROUP BY u, ts)
SELECT l.event_id,
       (min(CASE WHEN rd.rid IS NULL THEN NULL
            ELSE {'g': abs(epoch_us(rd.ts) - epoch_us(l.ts)),
                  'fwd': CASE WHEN rd.ts > l.ts THEN 1 ELSE 0 END,
                  'rid': rd.rid} END)).rid
FROM l LEFT JOIN rd ON rd.u = l.u
  AND rd.ts BETWEEN l.ts - INTERVAL 10 MINUTE
               AND l.ts + INTERVAL 10 MINUTE
GROUP BY l.event_id""").fetchall()))
    assert got == want


def test_nearest_plan_single_sort_single_window(spark):
    """Plan gate (round 11): nearest computes BOTH carries under one
    ordering — Spark merges the two frames into ONE Window node over
    one keyed exchange; no second sort, no range join."""
    left, right = _frames(spark)
    plan = (asof_join(left, right, on="user", direction="nearest",
                      tolerance="5 minutes")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") == 1
    import re
    hashes = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert len(hashes) == 2, hashes
