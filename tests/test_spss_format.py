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


def _make_zsav(src_sav: str, dst_zsav: str, block_bytes: int) -> None:
    """Repackage an uncompressed .sav as a multi-block zsav whose zlib
    blocks deliberately split RLE command groups mid-literal."""
    import struct
    import zlib

    meta = parser.read_metadata(src_sav)
    assert meta.compression == 0
    with open(src_sav, "rb") as f:
        header = bytearray(f.read(meta.data_offset))
        data = f.read()
    header[0:4] = b"$FL3"
    header[72:76] = struct.pack("<i", 2)
    # all-literal RLE: groups of 8 x code-253 followed by the 8 units
    units = [data[i : i + 8] for i in range(0, len(data) - len(data) % 8, 8)]
    rle = bytearray()
    for g in range(0, len(units), 8):
        chunk = units[g : g + 8]
        ctrl = bytes([253] * len(chunk))
        if len(chunk) < 8:
            ctrl += bytes([252]) + bytes(8 - len(chunk) - 1)
        rle += ctrl + b"".join(chunk)
    if len(units) % 8 == 0:
        rle += bytes([252]) + bytes(7)
    blocks = [bytes(rle[i : i + block_bytes]) for i in range(0, len(rle), block_bytes)]
    zheader_ofs = len(header)
    comp = [zlib.compress(b) for b in blocks]
    with open(dst_zsav, "wb") as f:
        f.write(header)
        body_start = zheader_ofs + 24
        ztrailer_ofs = body_start + sum(len(c) for c in comp)
        f.write(struct.pack("<3Q", zheader_ofs, ztrailer_ofs, 24 + 24 * len(blocks)))
        for c in comp:
            f.write(c)
        f.write(struct.pack("<qqii", int(meta.bias), 0, block_bytes, len(blocks)))
        uofs, cofs = zheader_ofs, body_start
        for b, c in zip(blocks, comp):
            f.write(struct.pack("<qqii", uofs, cofs, len(b), len(c)))
            uofs += len(b)
            cofs += len(c)


def test_zsav_block_parallel_partitions(spark, tmp_path):
    """Multi-partition zsav read == single-partition read == the
    uncompressed source. Blocks are 333 bytes so command groups straddle
    block boundaries, exercising the checkpoint recovery scan (beyond
    the reference, which decodes zsav sequentially —
    src/spss/data.rs:1687-1761)."""
    rng = np.random.default_rng(4)
    n = 700
    t = pa.table(
        {
            "x": pa.array(rng.normal(size=n)),
            "i": pa.array(rng.integers(0, 200, n).astype(float)),
            "s": pa.array([f"name{i % 50}" if i % 11 else None for i in range(n)]),
        }
    )
    src = str(tmp_path / "src.sav")
    writer.write_sav(t, src)
    z = str(tmp_path / "multi.zsav")
    _make_zsav(src, z, block_bytes=333)

    meta = parser.read_metadata(z)
    assert meta.compression == 2
    cps = parser.zsav_checkpoints(z, meta)
    assert len(cps) > 10  # genuinely multi-block
    whole = parser.read_table(z)
    assert whole.equals(parser.read_table(src))

    plan = parser.rle_partition_plan(z, meta, 0, meta.row_count, 5, 1 << 40)
    assert plan is not None and len(plan) == 5
    parts = []
    for (s, c, anchor, skip, ub) in plan:
        parts += list(
            parser.read_rle_partition(z, s, c, None, parser.ReadOptions(), 100, anchor, skip, ub)
        )
    assert pa.Table.from_batches(parts, schema=whole.schema).equals(whole)

    # through Spark, forced multi-partition
    df = spark.read.format("readstat").option("partitions", "4").load(z)
    assert df.rdd.getNumPartitions() == 4
    got = df.toPandas().sort_values("x").reset_index(drop=True)
    want = whole.to_pandas().sort_values("x").reset_index(drop=True)
    assert got.equals(want)


def test_sav_rle_checkpoint_partitions(tmp_path):
    """Raw .sav RLE files split via stride checkpoints: every compressed
    corpus file reads identically through 3 partitions."""
    for p in sorted(glob.glob(f"{CORPUS}/**/*.sav", recursive=True)):
        try:
            meta = parser.read_metadata(p)
        except Exception:
            continue
        if meta.compression != 1 or meta.row_count < 4:
            continue
        whole = parser.read_table(p)
        plan = parser.rle_partition_plan(p, meta, 0, meta.row_count, 3, 1 << 40)
        if plan is None:
            continue
        parts = []
        for (s, c, anchor, skip, ub) in plan:
            parts += list(
                parser.read_rle_partition(p, s, c, None, parser.ReadOptions(), 500, anchor, skip, ub)
            )
        assert pa.Table.from_batches(parts, schema=whole.schema).equals(whole), p


def test_distributed_sav_write(spark, tmp_path):
    """df.write.format("readstat").save(x.sav): executors spill local-
    width sections, commit re-strides to the global layout; the file
    reads back splittable with labels and user-missing intact."""
    import json

    from pyspark.sql import functions as F

    df = (
        spark.range(0, 5000, 1, 8)  # 8 partitions -> 8 spill blobs
        .select(
            F.col("id").cast("double").alias("x"),
            F.concat(F.lit("name_"), (F.col("id") % 97).cast("string")).alias("s"),
            (F.col("id") % 3 + 1).cast("double").alias("grade"),
        )
    )
    p = str(tmp_path / "dist.sav")
    (
        df.write.format("readstat")
        .mode("overwrite")
        .option("value_labels", json.dumps({"grade": {"1": "low", "2": "mid", "3": "high"}}))
        .option("variable_labels", json.dumps({"x": "the x"}))
        .option("user_missing", json.dumps({"x": [-9.0]}))
        .save(p)
    )
    t = parser.read_table(p)
    assert t.num_rows == 5000 and t.column_names == ["x", "s", "grade"]
    xs = t.column("x").to_pylist()
    assert sorted(xs) == [float(i) for i in range(5000)]
    by_x = dict(zip(xs, t.column("s").to_pylist()))
    assert by_x[123.0] == "name_" + str(123 % 97)
    grades = dict(zip(xs, t.column("grade").to_pylist()))
    assert grades[4.0] == "mid"  # 4 % 3 + 1 = 2 -> labeled
    meta = parser.read_metadata(p)
    assert meta.compression == 0  # splittable re-read
    (xv,) = [v for v in meta.variables if v.name == "x"]
    assert xv.label == "the x" and xv.missing_doubles == [-9.0]
    # splittable: forced multi-partition read equals single
    got = spark.read.format("readstat").option("partitions", "4").load(p)
    assert got.rdd.getNumPartitions() == 4 and got.count() == 5000


def test_compressed_sav_write_roundtrip(tmp_path):
    """compress=True writes bytecode RLE (beyond the reference writer):
    values roundtrip exactly, the file shrinks, and the compressed file
    still reads multi-partition via checkpoint recovery."""
    rng = np.random.default_rng(11)
    n = 2000
    t = pa.table(
        {
            "small": pa.array(rng.integers(-50, 150, n).astype(float)),  # value codes
            "big": pa.array(rng.normal(scale=1e6, size=n)),  # literals
            "mixed": pa.array(
                [None if i % 9 == 0 else float(i % 300) for i in range(n)]
            ),  # sysmiss + codes + literals
            "s": pa.array(["  " if i % 5 == 0 else f"t{i % 40}" for i in range(n)]),
        }
    )
    pc = str(tmp_path / "c.sav")
    pu = str(tmp_path / "u.sav")
    writer.write_sav(t, pc, compress=True)
    writer.write_sav(t, pu)
    import os

    assert os.path.getsize(pc) < os.path.getsize(pu) * 0.75  # actually compressed
    mc = parser.read_metadata(pc)
    assert mc.compression == 1
    tc = parser.read_table(pc)
    tu = parser.read_table(pu)
    assert tc.equals(tu)
    assert tc.column("small").to_pylist() == t.column("small").to_pylist()
    assert tc.column("big").to_pylist() == t.column("big").to_pylist()
    got_mixed = tc.column("mixed").to_pylist()
    assert got_mixed == t.column("mixed").to_pylist()

    # checkpoint-parallel read of our own compressed output
    plan = parser.rle_partition_plan(pc, mc, 0, mc.row_count, 4, 1 << 40)
    assert plan is not None
    parts = []
    for (s, c, anchor, skip, ub) in plan:
        parts += list(
            parser.read_rle_partition(pc, s, c, None, parser.ReadOptions(), 500, anchor, skip, ub)
        )
    assert pa.Table.from_batches(parts, schema=tc.schema).equals(tc)


def test_distributed_compressed_sav_write(spark, tmp_path):
    """option('compress','true') on the distributed writer: sections
    RLE-encode independently (zero-padded to group boundaries, one EOF),
    and the result reads back identical to the uncompressed write."""
    from pyspark.sql import functions as F

    df = spark.range(0, 3000, 1, 6).select(
        (F.col("id") % 200).cast("double").alias("v"),  # mostly value codes
        F.concat(F.lit("w"), (F.col("id") % 31).cast("string")).alias("s"),
    )
    pc = str(tmp_path / "c.sav")
    pu = str(tmp_path / "u.sav")
    df.write.format("readstat").mode("overwrite").option("compress", "true").save(pc)
    df.write.format("readstat").mode("overwrite").save(pu)
    import os

    assert os.path.getsize(pc) < os.path.getsize(pu)
    assert parser.read_metadata(pc).compression == 1
    tc, tu = parser.read_table(pc), parser.read_table(pu)
    assert tc.equals(tu) and tc.num_rows == 3000


def test_executor_final_sav_sections(spark, tmp_path):
    """When the global layout is known executor-side (all-numeric schema,
    or string widths declared via option('string_widths')), sections are
    emitted final — RLE-compressed on the executor under compress — and
    commit() only concatenates blobs. Verify the section metadata says
    so and the files read back exactly."""
    from pyspark.sql import functions as F

    from polars_readstat_rs_spark.formats.spss.writer import spill_sav_partition

    # unit level: all-numeric sections are final; compress marks rle
    import pyarrow as pa

    batch = pa.record_batch({"a": pa.array([1.0, 2.0]), "b": pa.array([3.0, None])})
    secs = spill_sav_partition([batch], str(tmp_path / "blob1.bin"), compress=True)
    assert secs[0]["final"] and secs[0]["rle"]
    secs_u = spill_sav_partition([batch], str(tmp_path / "blob2.bin"))
    assert secs_u[0]["final"] and "rle" not in secs_u[0]
    # undeclared strings stay local-layout
    sbatch = pa.record_batch({"a": pa.array([1.0]), "s": pa.array(["xy"])})
    secs_s = spill_sav_partition([sbatch], str(tmp_path / "blob3.bin"), compress=True)
    assert not secs_s[0]["final"]
    # declared strings become final (and pad to the declared width)
    secs_d = spill_sav_partition(
        [sbatch], str(tmp_path / "blob4.bin"), declared={"s": 10}, compress=True
    )
    assert secs_d[0]["final"] and secs_d[0]["rle"]
    assert secs_d[0]["cols"][1]["string_len"] == 10

    # end to end: declared-width compressed distributed write round-trips
    df = spark.range(0, 4000, 1, 5).select(
        (F.col("id") % 97).cast("double").alias("v"),
        F.concat(F.lit("name_"), F.col("id")).alias("s"),
    )
    p = str(tmp_path / "final.sav")
    (
        df.write.format("readstat")
        .mode("overwrite")
        .option("compress", "true")
        .option("string_widths", '{"s": 16}')
        .save(p)
    )
    meta = parser.read_metadata(p)
    assert meta.compression == 1
    back = spark.read.format("readstat").load(p)
    assert sorted(df.collect()) == sorted(back.collect())

    # declared width too small -> executor task raises
    import pytest as _pytest

    with _pytest.raises(Exception, match="exceeds the declared"):
        (
            df.write.format("readstat")
            .mode("overwrite")
            .option("string_widths", '{"s": 4}')
            .save(str(tmp_path / "bad.sav"))
        )


def test_directory_rle_plan_distributed(spark, tmp_path):
    """Directory of compressed .sav files: api.plan_rle_partitions runs
    the recovery-point scans as a Spark job, and the resulting plan lets
    the scan split INSIDE each compressed file (previously multi-file
    scans fell back to one partition per file). Values must equal the
    plain unsplit read."""
    import json

    from pyspark.sql import functions as F

    from polars_readstat_rs_spark import api

    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(3):
        df = spark.range(i * 10000, (i + 1) * 10000, 1, 2).select(
            F.col("id").cast("double").alias("x"),
            (F.col("id") % 7).cast("double").alias("g"),
        )
        df.write.format("readstat").mode("overwrite").option("compress", "true").save(
            str(d / f"part{i}.sav")
        )

    plan = api.plan_rle_partitions(spark, str(d), partitions=3)
    assert len(plan) == 3 and all(len(v) > 1 for v in plan.values())

    split = api.readstat_scan(spark, str(d), split_compressed=True, partitions=3)
    plain = api.readstat_scan(spark, str(d))
    assert split.rdd.getNumPartitions() > plain.rdd.getNumPartitions() >= 3
    assert sorted(r.x for r in split.collect()) == sorted(r.x for r in plain.collect())
    assert split.count() == 30000

    # plan survives a JSON roundtrip through the option channel
    rt = json.loads(json.dumps(plan))
    assert rt == plan


def test_single_file_rle_plan_auto_distributed(spark, tmp_path, monkeypatch):
    """A plain readstat_scan of ONE compressed .sav must auto-route its
    split planning through the api.plan_rle_partitions executor job (no
    explicit split_compressed needed), still splitting inside the file
    (VERDICT r3 #4)."""
    from pyspark.sql import functions as F

    from polars_readstat_rs_spark import api

    p = tmp_path / "solo.sav"
    spark.range(0, 20000, 1, 2).select(
        F.col("id").cast("double").alias("x")
    ).write.format("readstat").mode("overwrite").option("compress", "true").save(str(p))

    calls = []
    orig = api.plan_rle_partitions

    def spy(*a, **k):
        calls.append(a)
        return orig(*a, **k)

    monkeypatch.setattr(api, "plan_rle_partitions", spy)
    df = api.readstat_scan(spark, str(p), partitions=4)
    assert calls, "single compressed file did not route through the planning job"
    assert df.rdd.getNumPartitions() > 1  # split INSIDE the file
    assert df.count() == 20000
    assert sorted(r.x for r in df.limit(0).union(df).collect()) == [float(i) for i in range(20000)]

    # uncompressed single file: no planning job launched
    q = tmp_path / "plain.sav"
    spark.range(100).select(F.col("id").cast("double").alias("x")).write.format(
        "readstat"
    ).mode("overwrite").save(str(q))
    calls.clear()
    assert api.readstat_scan(spark, str(q)).count() == 100
    assert not calls


def test_rle_plan_respects_offset_limit(spark, tmp_path):
    """A precomputed rle_plan covers the whole file; an offset/limit
    scan must fall back to the slicing planner instead of silently
    returning every row (review regression)."""
    from pyspark.sql import functions as F

    from polars_readstat_rs_spark import api

    p = tmp_path / "one.sav"
    spark.range(0, 20000, 1, 2).select(
        F.col("id").cast("double").alias("x")
    ).write.format("readstat").mode("overwrite").option("compress", "true").save(str(p))

    sliced = api.readstat_scan(
        spark, str(p), offset=100, limit=50, split_compressed=True
    )
    rows = sliced.orderBy("x").collect()
    assert len(rows) == 50
    assert rows[0].x == 100.0 and rows[-1].x == 149.0


def test_informative_null_suffix_and_label_toggle(spark, tmp_path):
    """Reference InformativeNullOpts parity: SeparateColumn { suffix }
    is configurable (our default __missing is the documented deviation
    from the reference's _null), and use_value_labels=False emits the
    raw declared-missing value instead of its label."""
    import numpy as np

    from polars_readstat_rs_spark import api
    from polars_readstat_rs_spark.formats.spss.writer import write_sav
    import pyarrow as pa

    tbl = pa.table({"x": pa.array([1.0, 7.0, 2.0], type=pa.float64())})
    p = str(tmp_path / "um.sav")
    write_sav(
        tbl, p,
        user_missing={"x": [7.0]},
        value_labels={"x": {7.0: "REFUSED"}},
    )
    df = api.readstat_scan(
        spark, p, informative_nulls="separate", informative_null_suffix="_null",
        value_labels_as_strings=False,
    )
    assert "x_null" in df.columns and "x__missing" not in df.columns
    rows = sorted(((r.x, r.x_null) for r in df.collect()), key=str)
    # value 7 is user-missing -> nulled value + labeled indicator
    assert rows == [(1.0, None), (2.0, None), (None, "REFUSED")]

    df2 = api.readstat_scan(
        spark, p, informative_nulls="separate",
        informative_null_use_value_labels=False,
        value_labels_as_strings=False,
    )
    inds2 = [r.x__missing for r in df2.collect()]
    assert "REFUSED" not in inds2 and any(i == "7" for i in inds2 if i)


def test_zsav_distributed_write_roundtrip(spark, tmp_path):
    """A .zsav target (or option compress=zsav) produces a real
    compression=2 zlib container from the distributed writer — the RLE
    spool is wrapped block-streaming at commit; readback matches."""
    from pyspark.sql import functions as F

    from polars_readstat_rs_spark import api
    from polars_readstat_rs_spark.formats.spss import parser as SP

    api._ensure_registered(spark)
    n = 20_000
    df = spark.range(n).select(
        F.col("id").cast("double").alias("K"),
        F.concat(F.lit("name_"), F.col("id")).alias("S"),
    )
    pz = str(tmp_path / "d.zsav")
    ps = str(tmp_path / "d.sav")
    df.repartition(4).write.format("readstat").mode("overwrite").save(pz)
    df.repartition(4).write.format("readstat").mode("overwrite").save(ps)
    m = SP.read_metadata(pz)
    assert m.compression == 2 and m.row_count == n
    import os

    assert os.path.getsize(pz) < os.path.getsize(ps) / 2
    back = spark.read.format("readstat").load(pz)
    agg = back.agg(
        F.count("*").alias("n"), F.sum("K").alias("s"), F.countDistinct("S").alias("d")
    ).collect()[0]
    assert (agg.n, agg.d) == (n, n) and agg.s == n * (n - 1) / 2


# --------------------------------------------------- very long strings


def test_vls_write_read_roundtrip(tmp_path):
    """Strings over 255 bytes write as SPSS subtype-14 segments
    (non-final 255-byte variables carrying 252 data bytes each) and
    coalesce back exactly — including the 252/253 segment-boundary
    cases where naive concatenation would splice pad bytes in."""
    import pyarrow as pa

    from polars_readstat_rs_spark.formats.spss import writer as W

    vals = ["x" * 600, "short", "", None, "q" * 252, "r" * 253, "s" * 504, "t" * 1024]
    t = pa.table(
        {
            "k": pa.array([float(i) for i in range(len(vals))]),
            "txt": pa.array(vals),
            "m": pa.array(["tail"] * len(vals)),
        }
    )
    p = str(tmp_path / "vls.sav")
    W.write_sav(t, p)
    meta = parser.read_metadata(p)
    v = next(x for x in meta.variables if x.name == "txt")
    assert v.string_len == 1024 and v.vls_segments[0] == 256
    assert len(v.vls_segments) == (1024 + 251) // 252
    out = parser.read_table(p)
    exp = ["x" * 600, "short", None, None, "q" * 252, "r" * 253, "s" * 504, "t" * 1024]
    assert out.column("txt").to_pylist() == exp
    assert out.column("m").to_pylist() == ["tail"] * 8  # layout after VLS intact


def test_vls_compressed_roundtrip(tmp_path):
    import pyarrow as pa

    from polars_readstat_rs_spark.formats.spss import writer as W

    vals = ["y" * 300, "z" * 299]
    t = pa.table({"txt": pa.array(vals)})
    p = str(tmp_path / "vls_rle.sav")
    W.write_sav(t, p, compress=True)
    out = parser.read_table(p)
    assert out.column("txt").to_pylist() == vals


def test_vls_distributed_requires_declared_width(spark, tmp_path):
    import json

    from polars_readstat_rs_spark.api import _ensure_registered

    _ensure_registered(spark)
    df = spark.range(0, 60).selectExpr(
        "cast(id as double) as k",
        "repeat(substring('abcde', cast(id % 5 as int) + 1, 1), "
        "cast(id % 400 as int) + 1) as txt",
    )
    p = str(tmp_path / "vls_dist.sav")
    (
        df.repartition(3)
        .write.format("readstat")
        .mode("overwrite")
        .option("string_widths", json.dumps({"txt": 400}))
        .save(p)
    )
    back = spark.read.format("readstat").load(p)
    from pyspark.sql import functions as F

    row = back.agg(F.sum(F.length("txt")).alias("n"), F.count("*").alias("c")).collect()[0]
    assert row["c"] == 60 and row["n"] == sum((i % 400) + 1 for i in range(60))


def test_string_value_labels_and_missing_write(tmp_path):
    """Short-string (<= 8 byte) value labels and user-missing strings
    write as type-3 records with space-padded 8-byte keys — previously
    the writer was numeric-only (the reference's own writer limit)."""
    import pyarrow as pa

    from polars_readstat_rs_spark.formats.spss import writer as W

    t = pa.table({"code": pa.array(["A", "B", "NA", "C"]), "grp": pa.array([1.0, 2.0, 3.0, 9.0])})
    p = str(tmp_path / "strlab.sav")
    W.write_sav(
        t,
        p,
        value_labels={"code": {"A": "alpha", "B": "beta"}, "grp": {1.0: "one", 2.0: "two"}},
        user_missing={"code": ["NA"], "grp": [9.0]},
    )
    m = parser.read_metadata(p)
    v = next(x for x in m.variables if x.name == "code")
    assert v.missing_strings == ["NA"]
    out = parser.read_table(p)
    assert out.column("code").to_pylist() == ["alpha", "beta", None, "C"]
    assert out.column("grp").to_pylist() == ["one", "two", "3", None]
    raw = parser.read_table(
        p, opts=parser.ReadOptions(value_labels_as_strings=False, user_missing_as_null=False)
    )
    assert raw.column("code").to_pylist() == ["A", "B", "NA", "C"]
    assert raw.column("grp").to_pylist() == [1.0, 2.0, 3.0, 9.0]
