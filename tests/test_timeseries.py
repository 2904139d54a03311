"""Time-series resample/fill-forward and rolling time-range aggregates
(functions/timeseries.py)."""

import datetime as dt

import pytest

from cypher_for_apache_flink_spark.functions.timeseries import (
    interval_us, resample_fill_forward, rolling_time_agg)


def _ts(minute):
    return dt.datetime(2024, 1, 1, 12, minute)


US_MIN = 60_000_000
BASE = int(dt.datetime(2024, 1, 1, 12, 0)
           .replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000


def test_interval_us_parsing():
    assert interval_us("15 minutes") == 900_000_000
    assert interval_us("2 hours") == 7_200_000_000
    assert interval_us("1 second") == 1_000_000
    with pytest.raises(ValueError, match="interval"):
        interval_us("3 fortnights")


def test_resample_fills_gaps_forward(spark):
    # user 1: observations in minutes 0-14 and 45-59 buckets; the two
    # 15-minute buckets between are silent and must fill forward
    rows = [(1, _ts(2), 10.0), (1, _ts(7), 20.0), (1, _ts(48), 40.0)]
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    got = sorted(map(tuple, resample_fill_forward(
        df, "user", "ts", "v", interval="15 minutes").collect()))
    b0 = BASE
    assert got == [
        (1, b0, 15.0, False),                 # avg(10, 20)
        (1, b0 + 15 * US_MIN, 15.0, True),    # gap: carried forward
        (1, b0 + 30 * US_MIN, 15.0, True),
        (1, b0 + 45 * US_MIN, 40.0, False),
    ]


def test_resample_is_per_key_and_has_no_nulls(spark):
    rows = [(k, _ts((k * 7 + i * 11) % 60), float(k * 10 + i))
            for k in range(4) for i in range(6)]
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    out = resample_fill_forward(df, "user", "ts", "v",
                                interval="5 minutes", agg="max").collect()
    assert all(r.value is not None for r in out)
    # each key's first bucket is an observation, never a gap
    firsts = {}
    for r in out:
        if r.key not in firsts or r.bucket_us < firsts[r.key][0]:
            firsts[r.key] = (r.bucket_us, r.is_gap)
    assert all(not gap for _, gap in firsts.values())


def test_resample_invalid_agg(spark):
    df = spark.createDataFrame([(1, _ts(0), 1.0)],
                               "user long, ts timestamp, v double")
    with pytest.raises(ValueError, match="agg"):
        resample_fill_forward(df, "user", "ts", "v", agg="median")


def test_rolling_time_agg_hand_case(spark):
    # minutes 0, 30, 70: the 1-hour trailing sum at 70 excludes minute 0
    rows = [(1, _ts(0), 1.0), (1, _ts(30), 2.0),
            (1, dt.datetime(2024, 1, 1, 13, 10), 4.0)]
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    got = {r.ts_us: r.rolling for r in rolling_time_agg(
        df, "user", "ts", "v", window="1 hour", agg="sum").collect()}
    assert got[BASE] == 1.0
    assert got[BASE + 30 * US_MIN] == 3.0
    assert got[BASE + 70 * US_MIN] == 6.0   # 2.0 + 4.0, minute 0 aged out


def test_rolling_window_is_inclusive_both_ends(spark):
    rows = [(1, _ts(0), 1.0), (1, dt.datetime(2024, 1, 1, 13, 0), 10.0)]
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    got = {r.ts_us: r.rolling for r in rolling_time_agg(
        df, "user", "ts", "v", window="1 hour", agg="sum").collect()}
    # exactly 1 hour apart: the old row is still inside [-1h, 0]
    assert got[BASE + 60 * US_MIN] == 11.0


def test_resample_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [(i % 5, _ts((i * 13 + i * i) % 60), float((i * 7) % 23))
            for i in range(80)]
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    got = sorted((r.key, r.bucket_us, round(r.value, 6), r.is_gap)
                 for r in resample_fill_forward(
                     df, "user", "ts", "v", interval="10 minutes")
                 .collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE e(u BIGINT, ts TIMESTAMP, v DOUBLE)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute("""
WITH b AS (SELECT u AS key, (epoch_us(ts) // 600000000) * 600000000
                  AS bucket_us, avg(v) AS v
           FROM e GROUP BY 1, 2),
ext AS (SELECT key, min(bucket_us) AS lo, max(bucket_us) AS hi
        FROM b GROUP BY key),
dense AS (SELECT key, unnest(generate_series(lo, hi, 600000000))
                 AS bucket_us FROM ext)
SELECT d.key, d.bucket_us,
       round(last_value(b.v IGNORE NULLS) OVER (
         PARTITION BY d.key ORDER BY d.bucket_us
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value,
       b.v IS NULL AS is_gap
FROM dense d LEFT JOIN b USING (key, bucket_us)""").fetchall()))
    assert got == want


def test_rolling_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [(i % 4, _ts((i * 17 + 3) % 60), float((i * 5) % 13))
            for i in range(60)]
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    got = sorted((r.key, r.ts_us, r.value, round(r.rolling, 6))
                 for r in rolling_time_agg(
                     df, "user", "ts", "v", window="20 minutes",
                     agg="sum").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE e(u BIGINT, ts TIMESTAMP, v DOUBLE)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute("""
SELECT u AS key, epoch_us(ts) AS ts_us, v AS value,
       round(sum(v) OVER (PARTITION BY u ORDER BY epoch_us(ts)
         RANGE BETWEEN 1200000000 PRECEDING AND CURRENT ROW), 6)
         AS rolling
FROM e""").fetchall()))
    assert got == want


def test_resample_bucket_bound_enforced(spark):
    """Round 11 (VERDICT r10 #4): a span/interval ratio over
    max_buckets_per_key fails the action with a message naming the key
    and the bound, instead of materializing the sequence array."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    rows = [(1, dt.datetime(2024, 1, 1), 1.0),
            (1, dt.datetime(2024, 3, 1), 2.0)]   # 60 days span
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    out = resample_fill_forward(df, "user", "ts", "v",
                                interval="1 minute",
                                max_buckets_per_key=10_000)
    with pytest.raises(SparkRuntimeException,
                       match="max_buckets_per_key=10000"):
        out.collect()
    # under the bound (or with the guard disabled) the same call works
    n = 60 * 24 * 60 + 1
    assert resample_fill_forward(
        df, "user", "ts", "v", interval="1 minute",
        max_buckets_per_key=n).count() == n
    assert resample_fill_forward(
        df, "user", "ts", "v", interval="1 minute",
        max_buckets_per_key=None).count() == n


def test_interpolate_hand_case(spark):
    from cypher_for_apache_flink_spark.functions.timeseries import (
        resample_interpolate)
    # observations at buckets 0 and 45: the two silent 15-minute buckets
    # between take 1/3 and 2/3 of the ramp from 15.0 to 45.0
    rows = [(1, _ts(2), 10.0), (1, _ts(7), 20.0), (1, _ts(48), 45.0)]
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    got = sorted(map(tuple, resample_interpolate(
        df, "user", "ts", "v", interval="15 minutes").collect()))
    b0 = BASE
    assert got == [
        (1, b0, 15.0, False),                 # avg(10, 20)
        (1, b0 + 15 * US_MIN, 25.0, True),    # 15 + (45-15)/3
        (1, b0 + 30 * US_MIN, 35.0, True),    # 15 + 2*(45-15)/3
        (1, b0 + 45 * US_MIN, 45.0, False),
    ]


def test_interpolate_total_and_per_key(spark):
    from cypher_for_apache_flink_spark.functions.timeseries import (
        resample_interpolate)
    rows = [(k, _ts((k * 7 + i * 13) % 60), float(k * 10 + i))
            for k in range(4) for i in range(5)]
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    out = resample_interpolate(df, "user", "ts", "v",
                               interval="5 minutes").collect()
    # total inside each key's observed span: no NULLs, edges observed
    assert all(r.value is not None for r in out)
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    for rs in by_key.values():
        rs.sort(key=lambda r: r.bucket_us)
        assert not rs[0].is_gap and not rs[-1].is_gap


def test_interpolate_matches_duckdb_oracle(spark):
    duckdb = pytest.importorskip("duckdb")
    from cypher_for_apache_flink_spark.functions.timeseries import (
        resample_interpolate)
    rows = [(i % 5, _ts((i * 13 + i * i) % 60), float((i * 7) % 23))
            for i in range(80)]
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    got = sorted((r.key, r.bucket_us, round(r.value, 6), r.is_gap)
                 for r in resample_interpolate(
                     df, "user", "ts", "v", interval="10 minutes")
                 .collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE e(u BIGINT, ts TIMESTAMP, v DOUBLE)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute("""
WITH b AS (SELECT u AS key, (epoch_us(ts) // 600000000) * 600000000
                  AS bucket_us, avg(v) AS v
           FROM e GROUP BY 1, 2),
ext AS (SELECT key, min(bucket_us) AS lo, max(bucket_us) AS hi
        FROM b GROUP BY key),
dense AS (SELECT key, unnest(generate_series(lo, hi, 600000000))
                 AS bucket_us FROM ext),
j AS (SELECT d.key, d.bucket_us, b.v,
        last_value(CASE WHEN b.v IS NULL THEN NULL
                   ELSE {'b': d.bucket_us, 'v': b.v} END
                   IGNORE NULLS) OVER (
          PARTITION BY d.key ORDER BY d.bucket_us
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        first_value(CASE WHEN b.v IS NULL THEN NULL
                    ELSE {'b': d.bucket_us, 'v': b.v} END
                    IGNORE NULLS) OVER (
          PARTITION BY d.key ORDER BY d.bucket_us
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
      FROM dense d LEFT JOIN b USING (key, bucket_us))
SELECT key, bucket_us,
       round(CASE WHEN v IS NOT NULL THEN v
             ELSE pv.v + (nv.v - pv.v) * (bucket_us - pv.b)
                  / (nv.b - pv.b) END, 6) AS value,
       v IS NULL AS is_gap
FROM j""").fetchall()))
    assert got == want


def test_interpolate_bucket_bound_enforced(spark):
    from cypher_for_apache_flink_spark.functions.timeseries import (
        resample_interpolate)
    rows = [(1, dt.datetime(2024, 1, 1), 1.0),
            (1, dt.datetime(2024, 3, 1), 2.0)]
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    with pytest.raises(Exception, match="resample_interpolate: key 1"):
        resample_interpolate(df, "user", "ts", "v", interval="1 second",
                             max_buckets_per_key=1000).collect()
