"""SPSS .sav/.zsav tests: corpus decode (pinned values from the known
haven/pyreadstat sample files), sav==zsav equality, writer roundtrip,
Spark DataSource integration."""

from __future__ import annotations

import datetime
import glob

import numpy as np
import pyarrow as pa

from polars_readstat_rs_spark.formats.spss import parser, writer

CORPUS = "/root/reference/tests/spss/data"


def test_corpus_parses():
    files = sorted(glob.glob(f"{CORPUS}/*.sav")) + sorted(glob.glob(f"{CORPUS}/*.zsav"))
    assert len(files) >= 17
    for p in files:
        meta = parser.read_metadata(p)
        t = parser.read_table(p)
        assert t.num_rows == meta.row_count
        assert t.num_columns == len(meta.variables)


def test_sample_sav_values():
    """sample.sav is the canonical haven sample — values are well known."""
    t = parser.read_table(f"{CORPUS}/sample.sav")
    assert t.column("mychar").to_pylist() == ["a", "b", "c", "d", "e"]
    assert t.column("mynum").to_pylist() == [1.1, 1.2, -1000.3, -1.4, 1000.3]
    assert t.column("mydate").to_pylist()[0] == datetime.date(2018, 5, 6)
    assert t.column("mydate").to_pylist()[4] is None
    assert t.column("dtime").to_pylist()[0] == datetime.datetime(2018, 5, 6, 10, 10, 10)
    assert t.column("mylabl").to_pylist() == ["Male", "Female", "Male", "Female", "Male"]
    assert t.column("myord").to_pylist() == ["low", "medium", "high", "low", "low"]
    # time-of-day as ns (10:10:10)
    assert t.column("mytime").to_pylist()[0] == 36610 * 10**9


def test_zsav_equals_sav():
    a = parser.read_table(f"{CORPUS}/sample.sav")
    b = parser.read_table(f"{CORPUS}/sample.zsav")
    assert a.equals(b)


def test_rle_slice_consistency():
    """offset/limit windows over a compressed file == full read."""
    full = parser.read_table(f"{CORPUS}/sample_large.sav")
    parts = [parser.read_table(f"{CORPUS}/sample_large.sav", offset=o, limit=100) for o in range(0, 485, 100)]
    assert pa.concat_tables(parts).equals(full)


def test_very_long_string_coalescing():
    meta = parser.read_metadata(f"{CORPUS}/test_width.sav")
    v = next(x for x in meta.variables if x.name == "StartDate")
    assert v.string_len == 1024
    assert v.width * 8 >= v.string_len
    t = parser.read_table(f"{CORPUS}/test_width.sav")
    assert t.column("ResponseId").to_pylist()[0] == "R_0001xAxQxIo2PVH"


def test_user_missing():
    t = parser.read_table(f"{CORPUS}/missing_test.sav")
    assert t.column("var1").to_pylist()[0] is None
    # user_missing_as_null off keeps the value
    t2 = parser.read_table(
        f"{CORPUS}/missing_test.sav", opts=parser.ReadOptions(user_missing_as_null=False)
    )
    assert t2.column("var1").to_pylist()[0] is not None


def test_writer_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    n = 1000
    t = pa.table(
        {
            "num": pa.array(rng.normal(size=n)),
            "s": pa.array([f"w{i % 9}" if i % 7 else None for i in range(n)]),
            "d": pa.array(rng.integers(-5000, 20000, n), type=pa.int32()).cast(pa.date32()),
            "labeled": pa.array(rng.integers(1, 4, n).astype(float)),
            "a_rather_long_variable_name": pa.array(rng.normal(size=n)),
        }
    )
    p = str(tmp_path / "rt.sav")
    labels = {"labeled": {1.0: "one", 2.0: "two", 3.0: "three"}}
    writer.write_sav(t, p, value_labels=labels)
    rt = parser.read_table(p)
    assert rt.column_names == list(t.column_names)
    assert rt.column("num").to_pylist() == t.column("num").to_pylist()
    assert rt.column("d").to_pylist() == t.column("d").to_pylist()
    assert rt.column("labeled").to_pylist() == [
        labels["labeled"][x] for x in t.column("labeled").to_pylist()
    ]


def test_datasource_spark(spark, tmp_path):
    rng = np.random.default_rng(2)
    n = 5000
    t = pa.table({"x": pa.array(rng.normal(size=n)), "g": pa.array([f"g{i % 3}" for i in range(n)])})
    p = str(tmp_path / "sp.sav")
    writer.write_sav(t, p)
    df = spark.read.format("readstat").load(p)
    assert df.count() == n
    assert dict(df.dtypes) == {"x": "double", "g": "string"}
    pr = spark.read.format("readstat").option("columns", "g").option("limit", "100").load(p)
    assert pr.columns == ["g"] and pr.count() == 100
    # compressed corpus file through Spark (single partition path)
    z = spark.read.format("readstat").load(f"{CORPUS}/sample.zsav")
    assert z.count() == 5


def test_user_missing_write_roundtrip(tmp_path):
    t = pa.table({"x": pa.array([1.0, -9.0, 2.0, -8.0, 3.0])})
    p = str(tmp_path / "um.sav")
    writer.write_sav(t, p, user_missing={"x": [-9.0, -8.0]})
    assert parser.read_table(p).column("x").to_pylist() == [1.0, None, 2.0, None, 3.0]
    keep = parser.read_table(p, opts=parser.ReadOptions(user_missing_as_null=False))
    assert keep.column("x").to_pylist() == [1.0, -9.0, 2.0, -8.0, 3.0]
    ind = parser.read_table(p, opts=parser.ReadOptions(informative_nulls=True))
    assert ind.column("x__missing").to_pylist() == [None, "-9", None, "-8", None]


def test_big_endian_roundtrip(tmp_path):
    t = pa.table({"x": pa.array([1.5, 2.5, None, 4.0]), "s": pa.array(["ab", "cd", "ef", None])})
    p = str(tmp_path / "be.sav")
    writer.write_sav(t, p, endian=">")
    assert parser.read_metadata(p).endian == ">"
    rt = parser.read_table(p)
    assert rt.column("x").to_pylist() == [1.5, 2.5, None, 4.0]
    assert rt.column("s").to_pylist() == ["ab", "cd", "ef", None]


def test_informative_null_modes_spss(tmp_path):
    """struct / merged modes + value-label-preferring indicators
    (src/spss/data.rs:944-992: label beats the stringified value)."""
    t = pa.table({"x": pa.array([1.0, -9.0, 2.0, -8.0])})
    p = str(tmp_path / "modes.sav")
    writer.write_sav(
        t, p, user_missing={"x": [-9.0, -8.0]}, value_labels={"x": {-9.0: "REFUSED"}}
    )
    st = parser.read_table(
        p, opts=parser.ReadOptions(informative_nulls="struct", value_labels_as_strings=False)
    )
    assert st.column("x").to_pylist() == [
        {"x": 1.0, "null_indicator": None},
        {"x": None, "null_indicator": "REFUSED"},  # label preferred
        {"x": 2.0, "null_indicator": None},
        {"x": None, "null_indicator": "-8"},
    ]
    mg = parser.read_table(
        p, opts=parser.ReadOptions(informative_nulls="merged", value_labels_as_strings=False)
    )
    assert mg.column("x").to_pylist() == ["1", "REFUSED", "2", "-8"]
