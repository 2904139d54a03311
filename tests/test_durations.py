"""Duration type acceptance (reference TemporalTests analogue).

Durations are struct<months, days, microseconds> columns with plain column
arithmetic — SURVEY §7.1.7's replacement for CalendarIntervalType + UDAFs.
"""

import datetime

import pytest

from cypher_for_apache_flink_spark import PropertyGraph
from cypher_for_apache_flink_spark.operators.columns import parse_iso_duration


@pytest.fixture(scope="module")
def tgraph(spark):
    nodes = {
        frozenset({"E"}): spark.createDataFrame(
            [(1, datetime.date(2024, 1, 31), datetime.datetime(2024, 1, 31, 12, 30, 0), 1),
             (2, datetime.date(2024, 2, 10), datetime.datetime(2024, 2, 10, 8, 0, 0), 3),
             (3, datetime.date(2023, 12, 1), datetime.datetime(2023, 12, 1, 23, 45, 0), 2)],
            "id long, d date, ts timestamp, n long"),
    }
    return PropertyGraph(nodes, {}, name="tgraph")


def one(result):
    rows = result.collect()
    assert len(rows) == 1
    return rows[0]


def test_parse_iso():
    assert parse_iso_duration("P1Y2M3D") == (14, 3, 0)
    assert parse_iso_duration("P2W") == (0, 14, 0)
    assert parse_iso_duration("PT1H30M15.5S") == (0, 0, 5415500000)
    assert parse_iso_duration("-P1M") == (-1, 0, 0)
    with pytest.raises(ValueError):
        parse_iso_duration("1 day")


def test_duration_literal_and_accessors(tgraph):
    r = one(tgraph.cypher(
        "MATCH (e:E) WHERE e.n = 1 RETURN duration('P1Y2M3DT4H5M6S') AS d"))
    assert (r["d"]["months"], r["d"]["days"]) == (14, 3)
    assert r["d"]["microseconds"] == (4 * 3600 + 5 * 60 + 6) * 1_000_000

    r = one(tgraph.cypher(
        "MATCH (e:E) WHERE e.n = 1 "
        "RETURN duration('P1Y2M3DT4H5M6S').years AS y, "
        "duration('P1Y2M3DT4H5M6S').months AS mo, "
        "duration('P1Y2M3DT4H5M6S').monthsOfYear AS moy, "
        "duration('P1Y2M3DT4H5M6S').hours AS h, "
        "duration('P1Y2M3DT4H5M6S').secondsOfMinute AS sm"))
    assert tuple(r) == (1, 14, 2, 4, 6)


def test_duration_map_constructor(tgraph):
    r = one(tgraph.cypher(
        "MATCH (e:E) WHERE e.n = 1 "
        "RETURN duration({years: 1, days: 2, hours: 3}) AS d"))
    assert (r["d"]["months"], r["d"]["days"], r["d"]["microseconds"]) == \
        (12, 2, 3 * 3600 * 1_000_000)


def test_date_plus_duration_month_clamp(tgraph):
    # 2024-01-31 + P1M clamps to 2024-02-29 (leap year), ISO calendar math
    res = tgraph.cypher(
        "MATCH (e:E) WHERE e.n = 1 RETURN e.d + duration('P1M') AS d2")
    assert one(res)["d2"] == datetime.date(2024, 2, 29)


def test_timestamp_plus_duration_preserves_time(tgraph):
    res = tgraph.cypher(
        "MATCH (e:E) WHERE e.n = 1 "
        "RETURN e.ts + duration('P1MT2H') AS t2")
    assert one(res)["t2"] == datetime.datetime(2024, 2, 29, 14, 30, 0)


def test_date_minus_duration(tgraph):
    # node n=3 holds d = 2024-02-10: minus one month -> 2024-01-10,
    # minus ten days -> 2023-12-31
    res = tgraph.cypher(
        "MATCH (e:E) WHERE e.n = 3 RETURN e.d - duration('P1M10D') AS d2")
    assert one(res)["d2"] == datetime.date(2023, 12, 31)


def test_duration_arithmetic(tgraph):
    r = one(tgraph.cypher(
        "MATCH (e:E) WHERE e.n = 1 "
        "RETURN duration('P1M') + duration('P2M3D') AS s, "
        "duration('P10D') - duration('P3D') AS d, "
        "duration('P1DT1H') * 2 AS m"))
    assert (r["s"]["months"], r["s"]["days"]) == (3, 3)
    assert r["d"]["days"] == 7
    assert (r["m"]["days"], r["m"]["microseconds"]) == (2, 2 * 3600 * 1_000_000)


def test_duration_aggregates(tgraph):
    # per-node duration scaled by n: sum/avg/min/max component-wise
    r = one(tgraph.cypher(
        "MATCH (e:E) WITH duration('P1D') * e.n AS d "
        "RETURN sum(d) AS s, avg(d) AS a, min(d) AS mn, max(d) AS mx"))
    assert r["s"]["days"] == 6
    assert r["a"]["days"] == 2
    assert r["mn"]["days"] == 1
    assert r["mx"]["days"] == 3


def test_date_map_constructor(tgraph):
    import datetime
    r = one(tgraph.cypher(
        "RETURN date({year: 2020, month: 1, day: 15}) AS d, "
        "date({year: 2020}) AS dflt"))
    assert r["d"] == datetime.date(2020, 1, 15)
    assert r["dflt"] == datetime.date(2020, 1, 1)


def test_datetime_map_constructor(tgraph):
    import datetime
    r = one(tgraph.cypher(
        "RETURN datetime({year: 2020, month: 2, day: 3, hour: 4, "
        "minute: 5, second: 6, millisecond: 7}) AS dt"))
    assert r["dt"] == datetime.datetime(2020, 2, 3, 4, 5, 6, 7000)


def test_duration_between_family(tgraph):
    r = one(tgraph.cypher(
        "RETURN duration.between(date('2020-01-31'), date('2020-03-01')) AS b, "
        "duration.inDays(date('2020-01-01'), date('2020-03-01')) AS d, "
        "duration.inMonths(date('2020-01-31'), date('2020-03-30')) AS m, "
        "duration.inSeconds(datetime('2020-01-01T00:00:00'), "
        "datetime('2020-01-01T01:30:00')) AS s"))
    assert (r["b"]["months"], r["b"]["days"]) == (1, 1)
    assert r["d"]["days"] == 60
    assert r["m"]["months"] == 1
    assert r["s"]["microseconds"] == 5400 * 1_000_000


def test_extended_temporal_accessors(spark, tgraph):
    from cypher_for_apache_flink_spark.session import CypherSession
    s = CypherSession.for_graph(tgraph)
    r = s.cypher(
        "RETURN date('2024-03-15').weekYear AS wy, "
        "date('2024-12-30').weekYear AS wy2, "
        "date('2024-03-15').dayOfQuarter AS dq, "
        "date('2024-03-15').dayOfWeek AS dw, "           # ISO: Friday = 5
        "localdatetime('2024-01-01T01:02:03.000456').microsecond AS us"
    ).collect()[0]
    assert (r.wy, r.wy2, r.dq, r.dw, r.us) == (2024, 2025, 75, 5, 456)


def test_extended_duration_accessors(spark, tgraph):
    from cypher_for_apache_flink_spark.session import CypherSession
    s = CypherSession.for_graph(tgraph)
    r = s.cypher(
        "RETURN duration({months: 27}).quartersOfYear AS qy, "
        "duration({months: 27}).monthsOfQuarter AS mq, "
        "duration({minutes: 125}).minutesOfHour AS mh, "
        "duration({seconds: 61, milliseconds: 250}).millisecondsOfSecond "
        "AS ms").collect()[0]
    assert (r.qy, r.mq, r.mh, r.ms) == (1, 0, 5, 250)


def test_duration_constructor_no_int_overflow(spark, tgraph):
    # minutes >= 36 used to overflow int32 microsecond factors
    from cypher_for_apache_flink_spark.session import CypherSession
    s = CypherSession.for_graph(tgraph)
    r = s.cypher("RETURN duration({minutes: 125}).minutes AS m").collect()[0]
    assert r.m == 125
