"""Tagged-union ("Any") column encoding for mixed-type values.

Beyond-reference surface: the reference engine REJECTS mixed-type columns
at plan time — its type mapper has no CTAnyMaterial case
(morpheus SparkConversions.scala:54-75) and its TCK failing_blacklist
carries the Any-type scenarios.  Here a value whose static Spark type
cannot be unified with its siblings encodes as ONE fixed struct:

    struct<__any_tag  tinyint,   -- orderability rank (see below)
           __any_num  double,    -- numeric ordering/equality key
           __any_int  long,      -- set when the number was integral
           __any_str  string,
           __any_bool boolean,
           __any_json string>    -- lists/maps, JSON-serialized

Design points, all chosen so the ENCODING ITSELF does the work and no
per-row Python ever runs:

 - ``__any_tag`` follows Cypher's aggregation ordering (numbers < strings
   < booleans < lists < maps), so ``F.min``/``F.max`` over the raw struct
   column ARE ``min()``/``max()`` over mixed values — Spark struct
   comparison is field-ordered, tag first.
 - Cypher nulls encode as a NULL struct (not a null tag), so Spark's
   null-skipping aggregates and 3VL comparisons behave unchanged.
 - ORDER BY / DISTINCT / UNION work through native struct comparison,
   equality and hashing; no custom comparators.
 - Values decode back to plain Python driver-side at result rendering
   (``session._pytime``) — the executors only ever see the struct.

Known relaxation (documented, scenario-free): an integer and the equal
float (1 vs 1.0) carry different ``__any_int`` and therefore do not
struct-compare equal inside an Any column, though Cypher equivalence
would unify them.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, functions as F, types as T

from ..errors import PlanError

TAG_NUMBER = 0
TAG_STRING = 1
TAG_BOOL = 2
TAG_LIST = 3
TAG_MAP = 4

_FIELDS = ("__any_tag", "__any_num", "__any_int",
           "__any_str", "__any_bool", "__any_json")

ANY_TYPE = T.StructType([
    T.StructField("__any_tag", T.ByteType()),
    T.StructField("__any_num", T.DoubleType()),
    T.StructField("__any_int", T.LongType()),
    T.StructField("__any_str", T.StringType()),
    T.StructField("__any_bool", T.BooleanType()),
    T.StructField("__any_json", T.StringType()),
])

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOATING = (T.FloatType, T.DoubleType, T.DecimalType)


def is_any_type(dt) -> bool:
    return isinstance(dt, T.StructType) and tuple(dt.fieldNames()) == _FIELDS


def _null_struct() -> Column:
    return F.lit(None).cast(ANY_TYPE)


def _tagged(tag: int, num=None, i=None, s=None, b=None, j=None) -> Column:
    nil = F.lit(None)
    return F.struct(
        F.lit(tag).cast("tinyint").alias("__any_tag"),
        (num if num is not None else nil.cast("double")).alias("__any_num"),
        (i if i is not None else nil.cast("long")).alias("__any_int"),
        (s if s is not None else nil.cast("string")).alias("__any_str"),
        (b if b is not None else nil.cast("boolean")).alias("__any_bool"),
        (j if j is not None else nil.cast("string")).alias("__any_json"),
    )


def encode_any(col: Column, dt) -> Column:
    """Encode a statically-typed Column as the tagged-union struct.
    Raises a typed plan error for types whose mixing is unsupported
    (temporal values — their orderability vs other classes is undefined)."""
    if dt is None or isinstance(dt, T.NullType):
        return _null_struct()
    if is_any_type(dt):
        return col
    if isinstance(dt, _INTEGRAL):
        enc = _tagged(TAG_NUMBER, num=col.cast("double"),
                      i=col.cast("long"))
    elif isinstance(dt, _FLOATING):
        enc = _tagged(TAG_NUMBER, num=col.cast("double"))
    elif isinstance(dt, T.StringType):
        enc = _tagged(TAG_STRING, s=col)
    elif isinstance(dt, T.BooleanType):
        enc = _tagged(TAG_BOOL, b=col)
    elif isinstance(dt, T.ArrayType):
        enc = _tagged(TAG_LIST, j=F.to_json(F.struct(col.alias("v"))))
    elif isinstance(dt, (T.StructType, T.MapType)):
        enc = _tagged(TAG_MAP, j=F.to_json(F.struct(col.alias("v"))))
    else:
        raise PlanError(
            f"values of type {dt.simpleString()} cannot be mixed with "
            "other types in one column", code="InvalidArgumentType")
    return F.when(col.isNull(), _null_struct()).otherwise(enc)


def any_to_string(col: Column) -> Column:
    """``toString()`` over an Any value: numbers/booleans render like the
    native toString (integral without a fraction), strings pass through,
    containers render as their JSON form."""
    tag = col.getField("__any_tag")
    i = col.getField("__any_int")
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(tag == TAG_NUMBER,
               F.when(i.isNotNull(), i.cast("string"))
               .otherwise(col.getField("__any_num").cast("string")))
        .when(tag == TAG_STRING, col.getField("__any_str"))
        .when(tag == TAG_BOOL,
              F.when(col.getField("__any_bool"), F.lit("true"))
              .otherwise(F.lit("false")))
        # strip the {"v": ...} storage wrapper so a list renders as
        # [1,2], not the internal '{"v":[1,2]}' (ADVICE r8)
        .otherwise(F.get_json_object(col.getField("__any_json"), "$.v")))


def any_to_number(col: Column, target: str) -> Column:
    """``toInteger()``/``toFloat()`` over an Any value: numbers convert,
    numeric strings parse, anything else is null (the per-row-forgiving
    reading of the TCK's Any-type conversion scenarios)."""
    tag = col.getField("__any_tag")
    num = F.when(tag == TAG_NUMBER, col.getField("__any_num")) \
        .when(tag == TAG_STRING,
              col.getField("__any_str").try_cast("double"))
    return num.cast("long") if target == "integer" else num


def decode_any_py(v):
    """Driver-side decode of one collected Any struct (a Row or None)."""
    if v is None:
        return None
    tag = v[0]
    if tag == TAG_NUMBER:
        return v[2] if v[2] is not None else v[1]
    if tag == TAG_STRING:
        return v[3]
    if tag == TAG_BOOL:
        return v[4]
    if v[5] is None:
        return None
    return json.loads(v[5])["v"]


def unify_any_columns(cols: list, dts: list) -> list:
    """Re-encode sibling Columns (list-literal items / UNION branches)
    whose Spark types conflict.

    All-struct siblings with the SAME field names unify per field —
    conflicting fields become Any, agreeing fields stay native — so
    ``[{v: 1}, {v: 'a'}]`` keeps ``m.v`` addressable.  Anything else
    encodes each sibling wholesale."""
    structs = [dt if isinstance(dt, T.StructType) else None for dt in dts]
    names = {tuple(st.fieldNames()) for st in structs if st is not None}
    if all(st is not None for st in structs) and len(names) == 1:
        fields = next(iter(names))
        bad = set()
        for f in fields:
            ftypes = [st[f].dataType for st in structs]
            if not _field_compatible(ftypes):
                bad.add(f)
        if bad:
            out = []
            for c, st in zip(cols, structs):
                out.append(F.struct(*[
                    (encode_any(c.getField(f), st[f].dataType)
                     if f in bad else c.getField(f)).alias(f)
                    for f in fields]))
            return out
        return cols
    return [encode_any(c, dt) for c, dt in zip(cols, dts)]


def _field_compatible(dts) -> bool:
    """True when Spark can union/array these types natively (same class,
    numeric widening allowed)."""
    kinds = set()
    for dt in dts:
        if dt is None or isinstance(dt, T.NullType):
            continue
        if isinstance(dt, _INTEGRAL + _FLOATING):
            kinds.add("num")
        elif isinstance(dt, T.StringType):
            kinds.add("str")
        elif isinstance(dt, T.BooleanType):
            kinds.add("bool")
        else:
            kinds.add(dt.simpleString())
    return len(kinds) <= 1
