"""TIME / LOCALTIME type acceptance.

Beyond-reference surface: the reference blacklists its entire temporal TCK
corpus (morpheus-tck/src/test/resources/temporal_blacklist) and has no
time-of-day type at all.  Here a time of day is a microsecond-of-day long
in a field-name-tagged struct (TIME adds a fixed UTC-offset field), so
every operation is plain column arithmetic — no UDFs
(operators/columns.py TIME_TYPE / LOCALTIME_TYPE).
"""

import datetime

import pytest

from cypher_for_apache_flink_spark import PropertyGraph
from cypher_for_apache_flink_spark.operators.temporal import (
    parse_time_string,
    parse_tz_offset,
)


@pytest.fixture(scope="module")
def g(spark):
    PropertyGraph._tests_spark = spark          # keep fixture signature
    return PropertyGraph({}, {}, name="empty")


def one(g, q):
    rows = g.cypher(q).to_maps()
    assert len(rows) == 1
    return rows[0]


def test_parse_time_string():
    assert parse_time_string("12:31:14") == (45074_000000, None)
    assert parse_time_string("12:31:14.645876") == (45074_645876, None)
    assert parse_time_string("1231") == (45060_000000, None)
    assert parse_time_string("12:31:14Z") == (45074_000000, 0)
    assert parse_time_string("12:31:14+01:30") == (45074_000000, 5400_000000)
    assert parse_time_string("12:31:14-05:00") == (45074_000000,
                                                   -18000_000000)
    with pytest.raises(ValueError):
        parse_time_string("25:00")
    with pytest.raises(ValueError):
        parse_time_string("12:61")


def test_parse_tz_offset():
    assert parse_tz_offset("Z") == 0
    assert parse_tz_offset("+01:00") == 3600_000000
    assert parse_tz_offset("-0930") == -(9 * 3600 + 30 * 60) * 1_000_000
    with pytest.raises(ValueError):
        parse_tz_offset("UTC+1")


def test_construct_from_map(g):
    r = one(g, "RETURN time({hour: 12, minute: 31, second: 14}) AS t, "
               "localtime({hour: 12}) AS lt")
    assert r["t"] == datetime.time(12, 31, 14,
                                   tzinfo=datetime.timezone.utc)
    assert r["lt"] == datetime.time(12, 0)


def test_construct_with_offset(g):
    r = one(g, "RETURN time({hour: 12, timezone: '+01:00'}) AS t")
    off = datetime.timezone(datetime.timedelta(hours=1))
    assert r["t"] == datetime.time(12, 0, tzinfo=off)


def test_string_forms(g):
    r = one(g, "RETURN toString(time('12:31:14.5')) AS a, "
               "toString(localtime('12:31')) AS b, "
               "toString(time('09:15:30-05:00')) AS c")
    assert r["a"] == "12:31:14.5Z"
    assert r["b"] == "12:31:00"
    assert r["c"] == "09:15:30-05:00"


def test_localtime_rejects_offset_string(g):
    with pytest.raises(Exception, match="timezone"):
        g.cypher("RETURN localtime('12:31:14Z') AS t").to_maps()


def test_unknown_component_rejected(g):
    with pytest.raises(Exception, match="component"):
        g.cypher("RETURN time({hour: 1, year: 2020}) AS t").to_maps()


def test_select_form(g):
    r = one(g, "WITH localtime('12:31:14.645') AS tt "
               "RETURN localtime({time: tt, minute: 5}) AS a, "
               "localtime({time: tt, second: 2}) AS b")
    # unmentioned components come from the base; explicit second resets
    # the fraction
    assert r["a"] == datetime.time(12, 5, 14, 645000)
    assert r["b"] == datetime.time(12, 31, 2)


def test_conversions(g):
    r = one(g, "RETURN time({time: localtime({hour: 12})}) AS a, "
               "localtime(time('12:30:00+01:00')) AS b, "
               "localtime({time: localdatetime('1984-10-11T12:31:14')}) AS c")
    assert r["a"] == datetime.time(12, 0, tzinfo=datetime.timezone.utc)
    assert r["b"] == datetime.time(12, 30)      # offset dropped, clock kept
    assert r["c"] == datetime.time(12, 31, 14)


def test_datetime_from_date_and_time(g):
    r = one(g, "WITH date('1984-10-11') AS dd, "
               "localtime('12:31:14.645') AS tt "
               "RETURN localdatetime({date: dd, time: tt}) AS a, "
               "localdatetime({date: dd, time: tt, second: 42}) AS b")
    assert r["a"] == datetime.datetime(1984, 10, 11, 12, 31, 14, 645000)
    assert r["b"] == datetime.datetime(1984, 10, 11, 12, 31, 42)


def test_truncate(g):
    r = one(g, "RETURN localtime.truncate('minute', "
               "localtime('12:31:14.645')) AS a, "
               "time.truncate('day', time('12:31:14+01:00')) AS b, "
               "time.truncate('hour', localdatetime('1984-10-11T12:31:14')) "
               "AS c")
    assert r["a"] == datetime.time(12, 31)
    off = datetime.timezone(datetime.timedelta(hours=1))
    assert r["b"] == datetime.time(0, 0, tzinfo=off)   # offset survives
    assert r["c"] == datetime.time(12, 0, tzinfo=datetime.timezone.utc)


def test_truncate_overrides(g):
    r = one(g, "RETURN toString(time.truncate('second', "
               "time('12:31:14.645789Z'), {millisecond: 2})) AS t")
    assert r["t"] == "12:31:14.002Z"


def test_arithmetic_wraps(g):
    r = one(g, "RETURN time('23:59:59Z') + duration({seconds: 2}) AS a, "
               "localtime('00:30') - duration('PT1H') AS b, "
               "localtime('12:31:14') + duration('P1DT1H') AS c")
    assert r["a"] == datetime.time(0, 0, 1, tzinfo=datetime.timezone.utc)
    assert r["b"] == datetime.time(23, 30)
    # calendar components are no-ops on a clock value
    assert r["c"] == datetime.time(13, 31, 14)


def test_comparison_by_instant(g):
    r = one(g, "RETURN time('12:00+01:00') < time('11:30Z') AS a, "
               "localtime('12:00') < localtime('12:01') AS b, "
               "time('12:00Z') = localtime('12:00') AS c")
    assert r["a"] is True                       # 11:00Z < 11:30Z
    assert r["b"] is True
    assert r["c"] is False                      # different type classes


def test_accessors(g):
    r = one(g, "WITH time('12:31:14.645876+01:30') AS t RETURN "
               "t.hour AS h, t.minute AS mi, t.second AS s, "
               "t.millisecond AS ms, t.microsecond AS us, "
               "t.offset AS o, t.offsetMinutes AS om, t.offsetSeconds AS os")
    assert (r["h"], r["mi"], r["s"]) == (12, 31, 14)
    assert (r["ms"], r["us"]) == (645, 645876)
    assert r["o"] == "+01:30"
    assert r["om"] == 90
    assert r["os"] == 5400


def test_null_propagation(g):
    r = one(g, "RETURN time(null) IS NULL AS a, localtime(null) IS NULL "
               "AS b, localtime(null) + duration('PT1H') IS NULL AS c, "
               "toString(time(null)) IS NULL AS d")
    assert all(r[k] is True for k in "abcd")


def test_duration_between_times(g):
    r = one(g, "RETURN toString(duration.between(localtime('12:00'), "
               "localtime('13:30:15'))) AS a, "
               "toString(duration.between(time('12:00+01:00'), "
               "time('12:00Z'))) AS b")
    assert r["a"] == "PT1H30M15S"
    assert r["b"] == "PT1H"                    # instants differ by 1h


def test_current_time_runs(g):
    r = one(g, "RETURN time() AS t, localtime() AS lt")
    assert isinstance(r["t"], datetime.time)
    assert isinstance(r["lt"], datetime.time)
