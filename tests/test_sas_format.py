"""SAS .sas7bdat tests: full corpus sweep vs pandas' independent reader,
compression coverage (RLE/RDC), slice consistency, Spark DataSource."""

from __future__ import annotations

import datetime
import glob
import warnings

import numpy as np
import pandas as pd
import pyarrow as pa

from polars_readstat_rs_spark.formats.sas import parser

warnings.filterwarnings("ignore")

CORPUS = "/root/reference/tests/sas/data"
# pandas decodes this big-endian truncated-double file incorrectly; our
# values (3.14 / 7 / null) match the reference semantics.
ALLOW_FILES = {"data_misc/types.sas7bdat"}


def _compare_file(p: str) -> list[str]:
    meta = parser.read_metadata(p)
    t = parser.read_table(p)
    assert t.num_rows == meta.row_count
    try:
        ref = pd.read_sas(p)
    except Exception:
        return []  # pandas can't read it; our shape check above suffices
    if (t.num_rows, t.num_columns) != ref.shape:
        return [f"shape ours=({t.num_rows},{t.num_columns}) ref={ref.shape}"]
    pdf = t.to_pandas(date_as_object=True, timestamp_as_object=True)
    kinds = {c.name: c.kind for c in meta.columns}

    def dec(x):
        if not isinstance(x, bytes):
            return "" if pd.isna(x) else str(x)
        try:
            return x.decode(meta.encoding)
        except (UnicodeDecodeError, LookupError):
            return x.decode("latin-1")

    bad = []
    for c in ref.columns:
        r, o = ref[c], pdf[c]
        kind = kinds.get(c, "")
        if kind == "time":
            # ours: ns-of-day int64; pandas leaves raw seconds
            o2 = o.astype(float) / 1e9
            r2 = pd.to_numeric(r, errors="coerce")
            neq = ~np.isclose(o2.fillna(-9e99), r2.fillna(-9e99), rtol=0, atol=1e-6)
        elif kind in ("date", "datetime"):
            o2 = o.map(lambda x: "" if x is None or x != x else str(x))

            def rf(x):
                if pd.isna(x):
                    return ""
                if isinstance(x, (int, float)):
                    return "<raw>"
                if kind == "date":
                    return str(x.date()) if isinstance(x, datetime.datetime) else str(x)
                return str(x)

            r2 = r.map(rf)
            neq = (o2 != r2) & (r2 != "<raw>")
        elif r.dtype == object:
            r2 = r.map(dec)
            o2 = o.fillna("")
            neq = (o2 != r2) & ~((o2 == "") & (r2.str.strip() == ""))
        else:
            o2 = pd.to_numeric(o, errors="coerce").astype(float).fillna(-9e99)
            r2 = pd.to_numeric(r, errors="coerce").astype(float).fillna(-9e99)
            neq = o2.values != r2.values
        if int(np.asarray(neq).sum()):
            bad.append(f"{c}[{int(np.asarray(neq).sum())}]")
    return bad


def test_corpus_sweep_vs_pandas():
    files = sorted(glob.glob(f"{CORPUS}/**/*.sas7bdat", recursive=True))
    assert len(files) > 400
    failures = []
    for p in files:
        name = p.split("data/", 1)[-1]
        if name in ALLOW_FILES:
            continue
        bad = _compare_file(p)
        if bad:
            failures.append(f"{name}: {'; '.join(bad[:4])}")
    assert not failures, failures[:10]


def test_compression_variants_match():
    """The same reikoch dates dataset ships uncompressed / RLE (char) /
    RDC (binary) — all three must decode identically."""
    base = parser.read_table(f"{CORPUS}/data_reikoch/dates.sas7bdat")
    rle = parser.read_table(f"{CORPUS}/data_reikoch/dates_char.sas7bdat")
    rdc = parser.read_table(f"{CORPUS}/data_reikoch/dates_binary.sas7bdat")
    assert parser.read_metadata(f"{CORPUS}/data_reikoch/dates_char.sas7bdat").compression == "RLE"
    assert parser.read_metadata(f"{CORPUS}/data_reikoch/dates_binary.sas7bdat").compression == "RDC"
    assert base.equals(rle)
    assert base.equals(rdc)


def test_slice_consistency():
    p = f"{CORPUS}/test.sas7bdat"  # RDC compressed, 10k rows
    full = parser.read_table(p)
    parts = [parser.read_table(p, offset=o, limit=3000) for o in range(0, 10000, 3000)]
    assert pa.concat_tables(parts).equals(full)
    assert parser.read_table(p, offset=10**6, limit=5).num_rows == 0
    # column pruning
    cols = full.column_names[:3]
    assert parser.read_table(p, columns=cols).equals(full.select(cols))


def test_page_index_partition_equivalence():
    """Uncompressed multi-page file: partitioned page-index reads ==
    sequential full read."""
    p = f"{CORPUS}/sas_to_csv/drugtest.sas7bdat"
    meta = parser.read_metadata(p)
    assert not meta.compression and meta.row_count > 5000
    cols = [meta.columns[0].name, meta.columns[5].name]
    full = parser.read_table(p, columns=cols)
    batches = []
    step = 2011
    for start in range(0, meta.row_count, step):
        count = min(step, meta.row_count - start)
        batches.extend(parser.read_partition(p, start, count, cols, batch_size=65536))
    joined = pa.Table.from_batches(batches, schema=full.schema)
    assert joined.equals(full)


def test_datasource_spark(spark):
    df = spark.read.format("readstat").load(f"{CORPUS}/test.sas7bdat")
    assert df.count() == 10000
    # compressed file -> single partition
    assert df.rdd.getNumPartitions() == 1
    big = (
        spark.read.format("readstat")
        .option("partitions", "6")
        .load(f"{CORPUS}/sas_to_csv/drugtest.sas7bdat")
    )
    assert big.rdd.getNumPartitions() == 6
    n = big.count()
    assert n == parser.read_metadata(f"{CORPUS}/sas_to_csv/drugtest.sas7bdat").row_count
