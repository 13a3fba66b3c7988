"""Public API: the reference's entry points re-expressed for Spark.

- readstat_scan(spark, path, ...)    — lazy scan (reference S1,
  src/lib.rs:397-413): a DataFrame over the custom DataSource.
- readstat_metadata(spark, path)     — metadata probe (reference S8,
  src/lib.rs:416-438): one row per variable with name/type/format/labels.
- write_dta(df, path, ...)           — Stata writer (reference W1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .datasource import ReadstatDataSource
from .formats.stata import parser as stata_parser
from .formats.stata import writer as stata_writer

_registered: set[int] = set()


def _ensure_registered(spark: SparkSession) -> None:
    if id(spark) not in _registered:
        spark.dataSource.register(ReadstatDataSource)
        _registered.add(id(spark))


def readstat_scan(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    offset: int = 0,
    limit: int | None = None,
    value_labels_as_strings: bool = True,
    missing_string_as_null: bool = True,
    row_index: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    _ensure_registered(spark)
    r = spark.read.format("readstat")
    if columns:
        r = r.option("columns", ",".join(columns))
    if offset:
        r = r.option("offset", str(offset))
    if limit is not None:
        r = r.option("limit", str(limit))
    if partitions:
        r = r.option("partitions", str(partitions))
    r = r.option("value_labels_as_strings", str(value_labels_as_strings).lower())
    r = r.option("missing_string_as_null", str(missing_string_as_null).lower())
    r = r.option("row_index", str(row_index).lower())
    return r.load(path)


def readstat_metadata(spark: SparkSession, path: str) -> DataFrame:
    """Per-variable metadata as a DataFrame (driver-side header parse)."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "dta":
        meta = stata_parser.read_metadata(path)
        rows = [
            (
                path,
                meta.version,
                meta.nobs,
                meta.nvar,
                v.name,
                v.kind,
                v.width,
                v.fmt,
                v.var_label,
                v.label_name,
                len(meta.value_labels.get(v.label_name, {})),
            )
            for v in meta.variables
        ]
        return spark.createDataFrame(
            rows,
            "path string, version int, nobs long, nvar int, name string, kind string, "
            "width int, format string, var_label string, label_name string, n_value_labels int",
        )
    if ext in ("sav", "zsav"):
        from .formats.spss import parser as spss_parser

        return spss_parser.metadata_frame(spark, path)
    if ext == "sas7bdat":
        from .formats.sas import parser as sas_parser

        return sas_parser.metadata_frame(spark, path)
    raise ValueError(f"unsupported extension for {path}")


def write_dta(df: DataFrame, path: str, **kwargs) -> None:
    """Write a Spark DataFrame as Stata .dta v118 (driver-side assembly;
    use toArrow's batched transfer — fine for dimension-scale outputs,
    use the parquet pipeline for petabyte-scale persistence)."""
    stata_writer.write_dta(df.toArrow(), path, **kwargs)
