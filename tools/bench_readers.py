"""Reader-throughput bench: this engine's Spark DataSource vs pandas on
IDENTICAL stat files — the same comparison the reference publishes
(polars_readstat_rs README: SAS full-file 2.9x pandas, subset 51.5x;
Stata 6.7x; SPSS 16x on its machines). pandas is the common yardstick
both measurements share, so ratios are comparable across machines even
though absolute times are not.

Fixtures are written by THIS repo's writers (100k x mixed-type rows,
one .sas7bdat / .dta / .sav [+ a wide 60-col SAS variant for the
column-subset case]) into /tmp and reused across runs. Measured:
full-file scan -> count+sum aggregate (forces full decode) and a
2-column projection, min-of-3 each.

Usage: python tools/bench_readers.py  -> one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

N_ROWS = 100_000
N_EXTRA = 40  # extra numeric cols for the wide/subset case


def _fixtures(base: str) -> dict[str, str]:
    import numpy as np
    import pyarrow as pa

    from polars_readstat_rs_spark.formats.sas.bdat_writer import write_sas7bdat
    from polars_readstat_rs_spark.formats.stata.writer import write_dta
    from polars_readstat_rs_spark.formats.spss.writer import write_sav

    paths = {
        "sas": os.path.join(base, f"readers_{N_ROWS}.sas7bdat"),
        "sas_wide": os.path.join(base, f"readers_wide_{N_ROWS}.sas7bdat"),
        "stata": os.path.join(base, f"readers_{N_ROWS}.dta"),
        "spss": os.path.join(base, f"readers_{N_ROWS}.sav"),
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    rng = np.random.default_rng(5)
    ids = np.arange(N_ROWS, dtype=np.float64)
    vals = rng.normal(size=N_ROWS)
    cats = np.array([f"cat_{i % 50}" for i in range(N_ROWS)])
    names = np.array([f"name_{i:07d}" for i in range(N_ROWS)])
    t = pa.table(
        {"id": ids, "val": vals, "cat": pa.array(cats), "name": pa.array(names)}
    )
    write_sas7bdat(t, paths["sas"])
    write_dta(t, paths["stata"])
    write_sav(t, paths["spss"])
    wide = {"id": ids, "val": vals, "cat": pa.array(cats)}
    for j in range(N_EXTRA):
        wide[f"x{j:02d}"] = ids * (j + 1) % 977
    write_sas7bdat(pa.table(wide), paths["sas_wide"])
    return paths


def _tmin(fn, runs: int = 3) -> float:
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from polars_readstat_rs_spark import api
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark("bench-readers")
    spark.sparkContext.setLogLevel("ERROR")
    api._ensure_registered(spark)
    base = os.path.join(tempfile.gettempdir(), "readstat_reader_bench")
    os.makedirs(base, exist_ok=True)
    paths = _fixtures(base)

    # Key semantics (r13 ADVICE fix): ``spark_full`` keeps its r12
    # meaning — a fresh spark.read per run, planning included — so
    # round-over-round comparisons of that key stay apples-to-apples.
    # The steady-state path a user of api.readstat_scan gets (run 1
    # pays the schema planning worker, runs 2-3 hit the r13 session
    # DataFrame cache) is recorded under the NEW key
    # ``spark_full_cached``; every case carries both legs.
    def spark_full_cached(path):
        (
            api.readstat_scan(spark, path)
            .agg(F.count("*"), F.sum("val"))
            .collect()
        )

    def spark_full(path):
        (
            spark.read.format("readstat")
            .load(path)
            .agg(F.count("*"), F.sum("val"))
            .collect()
        )

    def spark_subset(path):
        (
            api.readstat_scan(spark, path, columns=["id", "val"])
            .agg(F.count("*"), F.sum("val"))
            .collect()
        )

    def spark_local(path):
        # r14 small-file fast path: in-process decode -> Arrow local
        # relation, no planning worker, no executor job for the read.
        # Re-decodes the file every run (no cache) — honest repeat cost.
        (
            api.readstat_read_local(spark, path)
            .agg(F.count("*"), F.sum("val"))
            .collect()
        )

    pd_read = {
        "sas": lambda p: pd.read_sas(p, encoding="utf-8"),
        "sas_wide": lambda p: pd.read_sas(p, encoding="utf-8"),
        "stata": lambda p: pd.read_stata(p),
        "spss": None,  # pandas has no SPSS reader without pyreadstat
    }

    # warm the JVM once
    spark_full(paths["sas"])

    # 1M-row SAS fixture: exposes MARGINAL throughput — on 100k-row
    # files both engines' fixed floors dominate (Spark: ~0.4 s job +
    # Python-worker startup; pandas: ~0 ms), so the small-file ratio
    # measures constants, not decode speed. ratio_marginal compares
    # (t_1M - t_100k) / 900k rows.
    big = os.path.join(base, "readers_big_1m.sas7bdat")
    if not os.path.exists(big):
        import numpy as np
        import pyarrow as pa

        from polars_readstat_rs_spark.formats.sas.bdat_writer import write_sas7bdat

        rng = np.random.default_rng(9)
        m = 1_000_000
        write_sas7bdat(
            pa.table(
                {
                    "id": np.arange(m, dtype=np.float64),
                    "val": rng.normal(size=m),
                    "cat": pa.array([f"cat_{i % 50}" for i in range(m)]),
                    "name": pa.array([f"name_{i:07d}" for i in range(m)]),
                }
            ),
            big,
        )

    out: dict = {"metric": "reader_throughput", "rows": N_ROWS, "cases": {}}
    t_small_spark = _tmin(lambda: spark_full(paths["sas"]))
    t_big_spark = _tmin(lambda: spark_full(big))
    t_big_cached = _tmin(lambda: spark_full_cached(big))
    t_small_pd = _tmin(lambda: pd.read_sas(paths["sas"], encoding="utf-8"))
    t_big_pd = _tmin(lambda: pd.read_sas(big, encoding="utf-8"))
    def spark_full_par(path, n):
        (
            api.readstat_scan(spark, path, partitions=n)
            .agg(F.count("*"), F.sum("val"))
            .collect()
        )

    t_big_par = _tmin(lambda: spark_full_par(big, 16))
    out["cases"]["sas_1m"] = {
        "spark_full": t_big_spark,
        "spark_full_cached": t_big_cached,
        "spark_full_16part": t_big_par,
        "pandas_full": t_big_pd,
        "ratio_vs_pandas": round(t_big_pd / t_big_spark, 2),
        "ratio_vs_pandas_cached": round(t_big_pd / t_big_cached, 2),
        "ratio_vs_pandas_16part": round(t_big_pd / t_big_par, 2),
        "marginal_spark_us_per_row": round((t_big_spark - t_small_spark) / 0.9, 2),
        "marginal_pandas_us_per_row": round((t_big_pd - t_small_pd) / 0.9, 2),
    }
    for key in ("sas", "sas_wide", "stata", "spss"):
        p = paths[key]
        case = {
            "spark_full": _tmin(lambda: spark_full(p)),
            "spark_full_cached": _tmin(lambda: spark_full_cached(p)),
            "spark_local": _tmin(lambda: spark_local(p)),
        }
        if key == "sas_wide":
            case["spark_subset"] = _tmin(lambda: spark_subset(p))
        rd = pd_read[key]
        if rd is not None:
            case["pandas_full"] = _tmin(lambda: rd(p))
            case["ratio_vs_pandas"] = round(case["pandas_full"] / case["spark_full"], 2)
            case["ratio_vs_pandas_cached"] = round(
                case["pandas_full"] / case["spark_full_cached"], 2
            )
            case["ratio_vs_pandas_local"] = round(
                case["pandas_full"] / case["spark_local"], 2
            )
            if "spark_subset" in case:
                case["subset_ratio_vs_pandas_full"] = round(
                    case["pandas_full"] / case["spark_subset"], 2
                )
        out["cases"][key] = case

    # Stata at MATERIAL sizes (r12 verdict item 4): the 100k case above
    # measures constants (Spark ~0.6-0.7 s/query planning+job floor vs
    # pandas' ~0 ms), not decode. 600k x 16 is the README's reference
    # row; 2.4M x 16 shows where the floor amortizes and the marginal
    # rate — the number that scales to a directory of big files —
    # takes over.
    import numpy as np
    import pyarrow as pa

    from polars_readstat_rs_spark.formats.stata.writer import write_dta

    def _stata16(n: int, path: str) -> str:
        if os.path.exists(path):
            return path
        rng = np.random.default_rng(7)
        cols = {}
        for j in range(8):
            cols[f"num{j}"] = rng.normal(size=n)
        for j in range(4):
            cols[f"int{j}"] = pa.array((np.arange(n) * (j + 3) % 10007).astype(np.int32))
        cols["cat"] = pa.array([f"cat_{i % 50}" for i in range(n)])
        cols["name"] = pa.array([f"name_{i:07d}" for i in range(n)])
        cols["code"] = pa.array([f"C{i % 997:03d}" for i in range(n)])
        cols["flag"] = pa.array((np.arange(n) % 2).astype(np.int8))
        write_dta(pa.table(cols), path)
        return path

    s600 = _stata16(600_000, os.path.join(base, "readers_stata_600k.dta"))
    s2m4 = _stata16(2_400_000, os.path.join(base, "readers_stata_2m4.dta"))

    def stata_full_cached(path):
        (
            api.readstat_scan(spark, path)
            .agg(F.count("*"), F.sum("num0"))
            .collect()
        )

    def stata_full(path):
        (
            spark.read.format("readstat")
            .load(path)
            .agg(F.count("*"), F.sum("num0"))
            .collect()
        )

    t600_sp = _tmin(lambda: stata_full(s600))
    t600_cached = _tmin(lambda: stata_full_cached(s600))
    t2m4_sp = _tmin(lambda: stata_full(s2m4))
    t600_pd = _tmin(lambda: pd.read_stata(s600))
    t2m4_cached = _tmin(lambda: stata_full_cached(s2m4))
    t2m4_pd = _tmin(lambda: pd.read_stata(s2m4))
    out["cases"]["stata_600k"] = {
        "spark_full": t600_sp,
        "spark_full_cached": t600_cached,
        "pandas_full": t600_pd,
        "ratio_vs_pandas": round(t600_pd / t600_sp, 2),
        "ratio_vs_pandas_cached": round(t600_pd / t600_cached, 2),
    }
    out["cases"]["stata_2m4"] = {
        "spark_full": t2m4_sp,
        "spark_full_cached": t2m4_cached,
        "pandas_full": t2m4_pd,
        "ratio_vs_pandas": round(t2m4_pd / t2m4_sp, 2),
        "ratio_vs_pandas_cached": round(t2m4_pd / t2m4_cached, 2),
        "marginal_spark_us_per_row": round((t2m4_sp - t600_sp) / 1.8, 2),
        "marginal_pandas_us_per_row": round((t2m4_pd - t600_pd) / 1.8, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
