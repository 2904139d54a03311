"""Temporal construction helpers: Cypher date/datetime formats and
calendar systems (week / quarter / ordinal dates).

Reference analogue: the reference maps temporal construction onto Java
``java.time`` via UDFs (morpheus-spark-cypher TemporalUdfs /
TemporalConversions); here literal strings parse AT PLAN TIME in Python
(queries carry literals — literal->parameter extraction hands us the
constant) and map-component forms compile to pure Column arithmetic, so
nothing leaves whole-stage codegen.

Cypher date formats (openCypher temporal TCK / Neo4j cypher manual
"Temporal values", public docs):
    calendar  YYYY-MM-DD | YYYYMMDD | YYYY-MM | YYYY
    week      YYYY-Www-D | YYYYWwwD | YYYY-Www | YYYYWww
    quarter   YYYY-Qq-DD | YYYYQqDD | YYYY-Qq | YYYYQq
    ordinal   YYYY-DDD   | YYYYDDD
Datetime strings are <date>T<time> with optional fractional seconds.
"""

from __future__ import annotations

import datetime
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_DATE_RES = [
    # calendar
    (re.compile(r"^(\d{4})-(\d{2})-(\d{2})$"), "cal"),
    (re.compile(r"^(\d{4})(\d{2})(\d{2})$"), "cal"),
    (re.compile(r"^(\d{4})-(\d{2})$"), "cal2"),
    # week
    (re.compile(r"^(\d{4})-W(\d{2})-(\d)$"), "week"),
    (re.compile(r"^(\d{4})W(\d{2})(\d)$"), "week"),
    (re.compile(r"^(\d{4})-W(\d{2})$"), "week2"),
    (re.compile(r"^(\d{4})W(\d{2})$"), "week2"),
    # quarter
    (re.compile(r"^(\d{4})-Q([1-4])-(\d{2})$"), "quarter"),
    (re.compile(r"^(\d{4})Q([1-4])(\d{2})$"), "quarter"),
    (re.compile(r"^(\d{4})-Q([1-4])$"), "quarter2"),
    (re.compile(r"^(\d{4})Q([1-4])$"), "quarter2"),
    # ordinal
    (re.compile(r"^(\d{4})-(\d{3})$"), "ordinal"),
    (re.compile(r"^(\d{4})(\d{3})$"), "ordinal"),
    (re.compile(r"^(\d{4})$"), "year"),
]


def py_week_date(year: int, week: int, dow: int) -> datetime.date:
    """ISO week date -> calendar date (Jan 4 is always in week 1)."""
    jan4 = datetime.date(year, 1, 4)
    week1_monday = jan4 - datetime.timedelta(days=jan4.isoweekday() - 1)
    return week1_monday + datetime.timedelta(days=(week - 1) * 7 + dow - 1)


def parse_date_string(s: str) -> datetime.date:
    """Cypher date literal -> datetime.date; raises ValueError otherwise."""
    t = s.strip()
    for rx, kind in _DATE_RES:
        m = rx.match(t)
        if not m:
            continue
        g = [int(x) for x in m.groups()]
        if kind == "cal":
            return datetime.date(g[0], g[1], g[2])
        if kind == "cal2":
            return datetime.date(g[0], g[1], 1)
        if kind == "week":
            return py_week_date(g[0], g[1], g[2])
        if kind == "week2":
            return py_week_date(g[0], g[1], 1)
        if kind == "quarter":
            return (datetime.date(g[0], (g[1] - 1) * 3 + 1, 1)
                    + datetime.timedelta(days=g[2] - 1))
        if kind == "quarter2":
            return datetime.date(g[0], (g[1] - 1) * 3 + 1, 1)
        if kind == "ordinal":
            return (datetime.date(g[0], 1, 1)
                    + datetime.timedelta(days=g[1] - 1))
        if kind == "year":
            return datetime.date(g[0], 1, 1)
    raise ValueError(f"invalid date string {s!r}")


_TIME_RE = re.compile(
    r"^(\d{2})(?::?(\d{2}))?(?::?(\d{2}))?(?:[.,](\d{1,9}))?$")
_OFFSET_RE = re.compile(r"^([+-])(\d{2})(?::?(\d{2}))?(?::?(\d{2}))?$")


def parse_time_parts(s: str):
    """'HH[:MM[:SS[.ffffff]]]' (or compact) -> (h, m, s, microseconds)."""
    m = _TIME_RE.match(s.strip())
    if not m:
        raise ValueError(f"invalid time string {s!r}")
    h, mi, sec, frac = m.groups()
    us = int((frac or "0").ljust(6, "0")[:6])
    if int(h) > 23 or int(mi or 0) > 59 or int(sec or 0) > 59:
        raise ValueError(f"invalid time string {s!r}")
    return int(h), int(mi or 0), int(sec or 0), us


def parse_tz_offset(s: str) -> int:
    """UTC-offset string ('Z' | ±HH[:MM[:SS]], compact allowed) ->
    offset microseconds."""
    t = s.strip()
    if t in ("Z", "z"):
        return 0
    m = _OFFSET_RE.match(t)
    if not m:
        raise ValueError(f"invalid timezone offset {s!r}")
    sign = -1 if m.group(1) == "-" else 1
    secs = (int(m.group(2)) * 3600 + int(m.group(3) or 0) * 60
            + int(m.group(4) or 0))
    return sign * secs * 1_000_000


def parse_time_string(s: str):
    """Cypher time/localtime literal -> (microsecond-of-day, offset_us).

    ``offset_us`` is None when the string carries no zone designator
    (``localtime`` form); 'Z' and ±HH:MM[: SS] offsets are supported —
    named zones are not (no TZ database semantics in the engine).
    """
    t = s.strip()
    off = None
    if t.endswith(("Z", "z")):
        off, t = 0, t[:-1]
    else:
        for i, ch in enumerate(t):
            if ch in "+-":
                off, t = parse_tz_offset(t[i:]), t[:i]
                break
    h, mi, sec, us = parse_time_parts(t)
    return ((h * 3600 + mi * 60 + sec) * 1_000_000 + us), off


def parse_zoned_datetime_string(s: str):
    """Cypher zoned datetime literal -> (wall datetime, offset_us, zone).

    Forms: ``<ldt>Z``, ``<ldt>±HH:MM``, ``<ldt>±HH:MM[Zone/Name]``,
    ``<ldt>[Zone/Name]``.  Returns None when the string carries no zone
    designator (plain localdatetime).  Named zones resolve through the
    system tz database (stdlib zoneinfo); the offset is computed from the
    WALL clock in that zone (Cypher semantics).
    """
    t = s.strip()
    zone = None
    if t.endswith("]"):
        i = t.rindex("[")
        zone, t = t[i + 1:-1], t[:i]
    off = None
    if t.endswith(("Z", "z")):
        off, t = 0, t[:-1]
    else:
        ti = t.find("T")
        for i in range(max(ti, 0) + 1, len(t)):
            if t[i] in "+-":
                off, t = parse_tz_offset(t[i:]), t[:i]
                break
    if zone is None and off is None:
        return None
    wall = parse_localdatetime_string(t)
    if zone is not None:
        from zoneinfo import ZoneInfo
        zoff = ZoneInfo(zone).utcoffset(wall.replace(tzinfo=ZoneInfo(zone)))
        zoff_us = round(zoff.total_seconds() * 1_000_000)
        if off is not None and off != zoff_us:
            raise ValueError(
                f"offset {off} contradicts zone {zone!r} in {s!r}")
        return wall, zoff_us, zone
    return wall, off, None


def parse_localdatetime_string(s: str) -> datetime.datetime:
    """Cypher localdatetime literal (any date form + optional time part)."""
    t = s.strip()
    if "T" in t:
        ds, ts = t.split("T", 1)
        d = parse_date_string(ds)
        h, mi, sec, us = parse_time_parts(ts)
        return datetime.datetime(d.year, d.month, d.day, h, mi, sec, us)
    d = parse_date_string(t)
    return datetime.datetime(d.year, d.month, d.day)


# --- map-component Column builders -----------------------------------------

def week_date_col(year: Column, week: Column, dow: Column) -> Column:
    """ISO week date as Column arithmetic (mirrors :func:`py_week_date`)."""
    jan4 = F.make_date(year, F.lit(1), F.lit(4))
    week1_monday = F.date_sub(jan4, F.weekday(jan4))
    return F.date_add(week1_monday,
                      ((week - 1) * 7 + dow - 1).cast("int"))


def quarter_date_col(year: Column, quarter: Column, doq: Column) -> Column:
    q_start = F.make_date(year, ((quarter - 1) * 3 + 1).cast("int"), F.lit(1))
    return F.date_add(q_start, (doq - 1).cast("int"))


def ordinal_date_col(year: Column, ordinal: Column) -> Column:
    return F.date_add(F.make_date(year, F.lit(1), F.lit(1)),
                      (ordinal - 1).cast("int"))


def date_from_map(m: dict[str, Column]) -> Column:
    """Cypher date component map -> DateType Column.

    Calendar ({year, month, day}), week ({year, week, dayOfWeek}),
    quarter ({year, quarter, dayOfQuarter}) and ordinal
    ({year, ordinalDay}) systems; omitted trailing components default to
    their first value, as the TCK specifies.
    """
    keys = set(m)
    if "week" in keys:
        return week_date_col(m["year"], m["week"],
                             m.get("dayofweek", F.lit(1)))
    if "quarter" in keys:
        return quarter_date_col(m["year"], m["quarter"],
                                m.get("dayofquarter", F.lit(1)))
    if "ordinalday" in keys:
        return ordinal_date_col(m["year"], m["ordinalday"])
    return F.make_date(m.get("year", F.lit(1)), m.get("month", F.lit(1)),
                       m.get("day", F.lit(1)))


def iso_datetime_string(ts: Column) -> Column:
    """Cypher ``toString()`` rendering of a timestamp: ISO-8601 with 'T'
    separator, fractional seconds only when non-zero (Spark's string cast
    already trims trailing fraction zeros)."""
    return F.replace(ts.cast("string"), F.lit(" "), F.lit("T"))
