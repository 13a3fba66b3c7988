"""Type narrowing (reference P7: `compress_df`, src/stata/compress.rs:82-355).

Full rule parity with the reference's compress pass:

- float/double (and int-typed) columns with all-integer values downcast
  to the smallest Stata-sentinel-safe integer type
  (src/stata/compress.rs:5-19: byte<=100, int<=32740, long<=2147483620);
  0..1 integral columns become Boolean; values beyond the int32-safe
  range stay/become double — the reference has NO int64 tier (Stata
  longs are 32-bit), and a double keeps such values as they came in
  (the old int64 fallback could silently saturate via a non-ANSI cast).
- all-null columns become Boolean (cast_all_null_to_boolean,
  src/stata/compress.rs:122-127).
- Datetime columns where every value is midnight become Date
  (check_date_time, src/stata/compress.rs:103-109).
- String columns where every non-empty value parses as a number become
  Float64 (check_string, try_parse_string_to_f64,
  src/stata/compress.rs:204-225) and then narrow like any numeric.

Everything is a single Spark aggregate over all candidate columns (one
pass, map-side combined) followed by a `select(cast)` — two jobs, no
driver materialization of data.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Stata-safe bounds (reference src/stata/compress.rs:5-19): the top of each
# integer range is reserved for missing-value sentinels.
_BOUNDS = (("int8", -127, 100), ("int16", -32767, 32740), ("int32", -2147483647, 2147483620))

_NUMERIC_DTYPES = ("double", "float", "bigint", "int", "smallint", "tinyint", "boolean")
_TS_DTYPES = ("timestamp", "timestamp_ntz")
_I53 = float(1 << 53)


def _kind(dtype: str) -> str | None:
    if dtype in _NUMERIC_DTYPES or dtype.startswith("decimal"):
        return "numeric"
    if dtype in _TS_DTYPES:
        return "timestamp"
    if dtype == "string":
        return "string"
    return None


def _parsed(c: str):
    """String -> double with the reference's trim/empty semantics
    (try_parse_string_to_f64: trimmed, empty -> null)."""
    t = F.trim(F.col(c))
    return F.when(F.length(t) == 0, F.lit(None).cast("double")).otherwise(t.try_cast("double"))


def _rule_kinds(compress_numeric, datetime_to_date, string_to_numeric):
    """Reference CompressOptionsLite rule toggles (README.md:118-124):
    each flag enables one rule family; a column whose family is off is
    left untouched."""
    kinds = set()
    if compress_numeric:
        kinds.add("numeric")
    if datetime_to_date:
        kinds.add("timestamp")
    if string_to_numeric:
        kinds.add("string")
    return kinds


def narrowing_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    infer_boolean: bool = True,
    compress_numeric: bool = True,
    datetime_to_date: bool = True,
    string_to_numeric: bool = True,
) -> DataFrame:
    """One-pass stats + the narrowed-type decision per column.

    Output: (col_name, vmin, vmax, all_int, narrowed_type). All columns
    are computed in a single aggregate (no N scans) and then unpivoted
    driver-side — the agg result is one row, so this stays fully
    distributed regardless of table size.

    ``infer_boolean=False`` mirrors the reference's infer_arrow_schema
    flag (SCHEMA_INFERENCE.md): 0/1-integral columns stay in the
    smallest integer tier instead of Boolean (the reference uses UInt8
    there; this repo's integer tiers are the documented Stata-sentinel
    deviation shared with :func:`narrow`). The three rule toggles map
    the reference's CompressOptionsLite fields 1:1 (compress_numeric /
    datetime_to_date / string_to_numeric — README.md:118-124); this
    repo defaults them ON, matching its narrow() behavior since r1.
    """
    kinds = _rule_kinds(compress_numeric, datetime_to_date, string_to_numeric)
    dtypes = dict(df.dtypes)
    if cols is None:
        cols = [c for c in df.columns if _kind(dtypes[c]) in kinds]
    else:
        cols = [c for c in cols if _kind(dtypes[c]) in kinds]
    if not cols:
        return df.sparkSession.createDataFrame(
            [], "col_name string, vmin double, vmax double, all_int boolean, narrowed_type string"
        )
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        k = _kind(dtypes[c])
        if k == "numeric":
            d = F.col(c).cast("double")
            aggs += [
                F.min(d).alias(f"{c}__min"),
                F.max(d).alias(f"{c}__max"),
                (F.sum(F.when(d != F.floor(d), 1).otherwise(0)) == 0).alias(f"{c}__int"),
                F.count(d).alias(f"{c}__nn"),
                F.lit(True).alias(f"{c}__ok"),
            ]
        elif k == "string":
            d = _parsed(c)
            bad = F.sum(
                F.when(F.col(c).isNotNull() & (F.length(F.trim(F.col(c))) > 0) & d.isNull(), 1)
                .otherwise(0)
            )
            aggs += [
                F.min(d).alias(f"{c}__min"),
                F.max(d).alias(f"{c}__max"),
                (F.sum(F.when(d != F.floor(d), 1).otherwise(0)) == 0).alias(f"{c}__int"),
                F.count(d).alias(f"{c}__nn"),
                (bad == 0).alias(f"{c}__ok"),  # every non-empty value parsed
            ]
        else:  # timestamp: the only stat that matters is all-midnight
            ts = F.col(c)
            aggs += [
                F.lit(None).cast("double").alias(f"{c}__min"),
                F.lit(None).cast("double").alias(f"{c}__max"),
                (F.sum(F.when(F.date_trunc("day", ts) != ts, 1).otherwise(0)) == 0).alias(
                    f"{c}__int"
                ),
                F.count(ts).alias(f"{c}__nn"),
                F.lit(True).alias(f"{c}__ok"),
            ]
    stats = df.agg(*aggs)

    parts = []
    for c in cols:
        parts.append(
            stats.select(
                F.lit(c).alias("col_name"),
                F.lit(_kind(dtypes[c])).alias("__kind"),
                F.col(f"{c}__min").alias("vmin"),
                F.col(f"{c}__max").alias("vmax"),
                F.col(f"{c}__int").alias("all_int"),
                F.col(f"{c}__nn").alias("__nn"),
                F.col(f"{c}__ok").alias("__ok"),
                F.col("__n_rows").alias("__n"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)

    numeric = F.when(
        (F.col("__n") > 0) & (F.col("__nn") == 0), F.lit("boolean")  # all-null
    ).when(~F.col("all_int"), F.lit("double"))
    if infer_boolean:
        numeric = numeric.when(
            (F.col("vmin") >= 0) & (F.col("vmax") <= 1), F.lit("boolean")  # 0/1
        )
    for name, lo, hi in _BOUNDS:
        numeric = numeric.when((F.col("vmin") >= lo) & (F.col("vmax") <= hi), F.lit(name))
    numeric = numeric.otherwise(F.lit("double"))  # no int64 tier in the reference

    narrowed = (
        F.when(F.col("__kind") == "timestamp", F.when(F.col("all_int"), "date").otherwise("timestamp"))
        .when((F.col("__kind") == "string") & ~F.col("__ok"), F.lit("string"))
        .otherwise(numeric)
    )
    return out.withColumn("narrowed_type", narrowed).select(
        "col_name", "vmin", "vmax", "all_int", "narrowed_type"
    )


_SPARK_TYPES = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "boolean": "boolean",
    "date": "date",
    "double": "double",
}


def _decide_arrow(n_rows, n_nonnull, vmin, vmax, all_int, infer_boolean):
    """The narrowing_stats decision chain over scalar stats, returning a
    pyarrow DataType — shared by the per-batch Arrow path so both passes
    apply identical rules."""
    import pyarrow as pa

    if n_nonnull == 0:
        # all-null (n_rows > 0) or EMPTY batch: min/max are null either
        # way, so Boolean for all-null per the compress rules, and
        # float64 identity for a zero-row batch (nothing to narrow on)
        return pa.bool_() if n_rows > 0 else pa.float64()
    if not all_int:
        return pa.float64()
    if infer_boolean and vmin >= 0 and vmax <= 1:
        return pa.bool_()
    for name, lo, hi in _BOUNDS:
        if vmin >= lo and vmax <= hi:
            return {"int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32()}[name]
    return pa.float64()


def narrow_batch(batch, infer_boolean: bool = True):
    """Arrow-side narrowing of ONE RecordBatch — the per-batch compress
    hook of the driver-local stream (reference readstat_batch_iter,
    src/readstat_stream.rs:129-137: ``compress_df_if_enabled`` runs on
    EACH batch independently). Same caveat as the reference: two batches
    of one file may narrow to different types; for a stable schema,
    infer once (api.infer_schema) and pass it as the iterator's
    ``schema`` instead."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arrays, fields = [], []
    for field in batch.schema:
        col = batch.column(field.name)
        t, new = field.type, None
        if (
            pa.types.is_floating(t)
            or pa.types.is_integer(t)
            or pa.types.is_decimal(t)
        ):
            d = pc.cast(col, pa.float64())
            nn = len(col) - col.null_count
            all_int = (
                bool(pc.all(pc.equal(pc.floor(d), d)).as_py()) if nn else True
            )
            mm = pc.min_max(d)
            target = _decide_arrow(
                len(col), nn, mm["min"].as_py(), mm["max"].as_py(), all_int, infer_boolean
            )
            if pa.types.is_boolean(target):
                new = pa.nulls(len(col), pa.bool_()) if nn == 0 else pc.equal(d, 1.0)
            elif target != t:
                new = pc.cast(d, target)
        elif pa.types.is_timestamp(t):
            nn = len(col) - col.null_count
            if nn and bool(
                pc.all(pc.equal(pc.floor_temporal(col, unit="day"), col)).as_py()
            ):
                new = pc.cast(col, pa.date32())
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            # try_parse_string_to_f64 semantics: trimmed, empty -> null;
            # narrow only when EVERY non-empty value parses
            import pandas as pd

            s = col.to_pandas().astype("object")
            trimmed = s.str.strip() if hasattr(s, "str") else s
            nonempty = trimmed.notna() & (trimmed != "")
            parsed = pd.to_numeric(trimmed.where(nonempty), errors="coerce")
            if not (nonempty & parsed.isna()).any():
                d = pa.array(parsed, type=pa.float64())
                nn = len(col) - d.null_count
                all_int = (
                    bool(pc.all(pc.equal(pc.floor(d), d)).as_py()) if nn else True
                )
                mm = pc.min_max(d)
                target = _decide_arrow(
                    len(col), nn, mm["min"].as_py(), mm["max"].as_py(), all_int, infer_boolean
                )
                if pa.types.is_boolean(target):
                    new = pa.nulls(len(col), pa.bool_()) if nn == 0 else pc.equal(d, 1.0)
                else:
                    new = pc.cast(d, target)
        if new is None:
            arrays.append(col)
            fields.append(field)
        else:
            arrays.append(new)
            fields.append(pa.field(field.name, new.type, field.nullable))
    return pa.record_batch(arrays, schema=pa.schema(fields))


def cast_batch(batch, schema):
    """Cast ONE RecordBatch to a target Arrow schema as it is read —
    the reference's ArrowBatchStream::with_schema semantics
    (SCHEMA_INFERENCE.md:90-108: batches cast individually, in
    parallel, never after concatenation).

    String sources casting to a numeric/boolean target go through the
    SAME trim / empty-to-null parse rules the pass-1 inference used
    (try_parse_string_to_f64) — a raw Arrow cast would reject exactly
    the values (' 3 ', '') whose parse the inference already approved."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _numeric_view(col):
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            import pandas as pd

            s = col.to_pandas().astype("object")
            trimmed = s.str.strip() if hasattr(s, "str") else s
            nonempty = trimmed.notna() & (trimmed != "")
            return pa.array(
                pd.to_numeric(trimmed.where(nonempty), errors="coerce"),
                type=pa.float64(),
            )
        return pc.cast(col, pa.float64())

    arrays = []
    for f in schema:
        col = batch.column(f.name)
        if pa.types.is_boolean(f.type) and not pa.types.is_boolean(col.type):
            d = _numeric_view(col)
            arrays.append(
                pa.nulls(len(col), pa.bool_())
                if d.null_count == len(col)
                else pc.equal(d, 1.0)
            )
        elif (
            pa.types.is_integer(f.type) or pa.types.is_floating(f.type)
        ) and (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            arrays.append(pc.cast(_numeric_view(col), f.type))
        else:
            arrays.append(pc.cast(col, f.type))
    return pa.record_batch(arrays, schema=schema)


def narrow(
    df: DataFrame,
    cols: list[str] | None = None,
    compress_numeric: bool = True,
    datetime_to_date: bool = True,
    string_to_numeric: bool = True,
) -> DataFrame:
    """Apply the narrowing decision: downcast eligible columns.

    Mirrors the reference's compress option (src/lib.rs:142-161) as an
    agg + select(cast) — two Spark jobs, no driver materialization.
    The rule toggles map CompressOptionsLite (see narrowing_stats)."""
    kinds = _rule_kinds(compress_numeric, datetime_to_date, string_to_numeric)
    dtypes = dict(df.dtypes)
    if cols is None:
        cols = [c for c in df.columns if _kind(dtypes[c]) in kinds]
    else:
        cols = [c for c in cols if _kind(dtypes[c]) in kinds]
    if not cols:
        return df
    decisions = {
        r["col_name"]: r
        for r in narrowing_stats(
            df, cols, compress_numeric=compress_numeric,
            datetime_to_date=datetime_to_date, string_to_numeric=string_to_numeric,
        ).collect()
    }
    out = []
    for c in df.columns:
        r = decisions.get(c)
        if r is None:
            out.append(F.col(c))
            continue
        t, k = r["narrowed_type"], _kind(dtypes[c])
        if k == "string" and t != "string":
            out.append(_parsed(c).cast(_SPARK_TYPES[t]).alias(c))
        elif k == "timestamp":
            out.append(F.col(c).cast("date").alias(c) if t == "date" else F.col(c))
        elif t in _SPARK_TYPES and _SPARK_TYPES[t] != dtypes[c]:
            if t == "double" and dtypes[c] == "bigint" and r["vmax"] is not None:
                # reference casts out-of-int32 ints to Float64; warn when
                # that visibly loses precision (|v| > 2^53)
                if r["vmax"] > _I53 or (r["vmin"] is not None and r["vmin"] < -_I53):
                    warnings.warn(
                        f"narrow(): column {c!r} exceeds 2^53; the double cast "
                        "mandated by the reference's compress rules loses precision",
                        stacklevel=2,
                    )
            out.append(F.col(c).cast(_SPARK_TYPES[t]).alias(c))
        else:
            out.append(F.col(c))
    return df.select(*out)
