"""p06_contamination bloom-prescreen A/B at sf>=1 (r15, VERDICT r14
item 1, guide §3.2): the deferred experiment.

Current shape (A): test_sh LEFT JOIN (distinct train shingles) ON sh,
one groupBy(doc). The train side fundamentally shuffles its full
distinct-shingle set.

Variant (B): build a Bloom filter over the TEST side's shingle hashes
(the small side — 10% of docs), broadcast it, and drop train shingles
that cannot match BEFORE the train side's distinct exchange. Bloom
false positives only keep extra (harmless) train rows; no false
negatives exist, so the final result is IDENTICAL row-for-row, not
just approximately: a train shingle absent from the test set can never
contribute to the LEFT join output.

The bloom is built the scale-correct way (per-partition partial blooms
via mapInArrow, OR-merged on the driver — the treeAggregate pattern of
Scala's df.stat.bloomFilter, which PySpark does not expose), never by
collecting raw keys. Membership test is a pandas_udf over the train
explode (Arrow longs in, booleans out).

Outputs wall-clock (min-of-N interleaved), shuffle bytes per variant
(AppStatusStore), and a full result-equality check of B vs A.

Usage: python tools/p06_bloom_ab.py <sf_dir> [n_files] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np  # noqa: E402

BLOOM_BITS = 1 << 24  # 16 Mbit = 2 MB: ~1% fpp at ~1.7M keys (sf1 test side)
BLOOM_K = 7


def _positions(h: "np.ndarray") -> "np.ndarray":
    """k bit positions per 64-bit key via Kirsch-Mitzenmacher double
    hashing: pos_i = (h1 + i*h2) mod m with h1/h2 carved from the key
    (the key is already an xxhash64 of the shingle words)."""
    h1 = h.astype(np.uint64)
    h2 = (h1 >> np.uint64(32)) | (h1 << np.uint64(32))
    h2 |= np.uint64(1)  # odd, so i*h2 cycles
    idx = np.arange(BLOOM_K, dtype=np.uint64)[None, :]
    return ((h1[:, None] + idx * h2[:, None]) % np.uint64(BLOOM_BITS)).astype(np.int64)


def build_bloom(sh_df) -> bytes:
    """Per-partition partial blooms, OR-merged on the driver."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("bits", T.BinaryType())])

    def partial(batches):
        import pandas as pd

        bits = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
        any_rows = False
        for b in batches:
            if not len(b):
                continue
            any_rows = True
            pos = _positions(b["sh"].to_numpy(np.int64)).ravel()
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    rows = sh_df.select("sh").mapInPandas(partial, schema).collect()
    acc = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    for r in rows:
        acc |= np.frombuffer(r.bits, dtype=np.uint8)
    return acc.tobytes()


def p06_bloom(spark, sf_dir: str):
    """Same result as p06_contamination, with the bloom prescreen on
    the train side (exact output — no false negatives)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from polars_readstat_rs_spark.operators.spread import spread
    from polars_readstat_rs_spark.operators.text import hashed_shingles_expr
    from polars_readstat_rs_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    test = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    sh_expr = hashed_shingles_expr("text", 3)
    test_sh = spread(test).select(F.col("doc_id").alias("doc"), F.explode(sh_expr).alias("sh"))

    bloom = build_bloom(test_sh)
    bc = spark.sparkContext.broadcast(bloom)

    @pandas_udf("boolean")
    def might_contain(s):
        import pandas as pd

        bits = np.frombuffer(bc.value, dtype=np.uint8)
        pos = _positions(s.to_numpy(np.int64))
        hit = np.ones(len(s), dtype=bool)
        for i in range(BLOOM_K):
            p = pos[:, i]
            hit &= (bits[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return pd.Series(hit)

    train_sh = (
        spread(train)
        .select(F.explode(sh_expr).alias("sh"))
        .filter(might_contain(F.col("sh")))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        test_sh.join(train_sh, "sh", "left")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_shingles"), F.count("__hit").alias("n_overlap"))
        .select(
            "doc",
            "n_shingles",
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double")).alias(
                "contamination"
            ),
        )
        .filter(F.col("n_overlap") >= 1)
    )


def main() -> None:
    sf_dir = sys.argv[1]
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from shuffle_bytes import stage_rows

    from bench_multifile import stage
    from polars_readstat_rs_spark.queries import QUERIES
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark("p06-bloom-ab")
    spark.sparkContext.setLogLevel("ERROR")
    staged = stage(sf_dir, n_files)

    def run_a():
        QUERIES["p06_contamination"](spark, staged).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_b():
        p06_bloom(spark, staged).write.format("noop").mode("overwrite").save()

    # correctness first: B's rows must equal A's exactly
    a_rows = sorted(map(tuple, QUERIES["p06_contamination"](spark, staged).collect()))
    b_rows = sorted(map(tuple, p06_bloom(spark, staged).collect()))
    equal = a_rows == b_rows
    print(json.dumps({"rows_a": len(a_rows), "rows_b": len(b_rows), "equal": equal}))
    if not equal:
        diff = [x for x in (set(a_rows) ^ set(b_rows))][:5]
        print(json.dumps({"diff_sample": [str(d) for d in diff]}))

    # warm both paths once (codegen + python workers), then interleaved min-of-3
    run_a()
    run_b()
    res = {"metric": "p06_bloom_ab", "sf_dir": sf_dir, "staged_files": n_files,
           "bloom_bits": BLOOM_BITS, "bloom_k": BLOOM_K, "rows_equal": equal,
           "rows": len(a_rows)}
    walls = {"A_current": [], "B_bloom": []}
    for _ in range(3):
        for name, fn in (("A_current", run_a), ("B_bloom", run_b)):
            spark.catalog.clearCache()
            t0 = time.time()
            fn()
            walls[name].append(round(time.time() - t0, 3))
    res["walls"] = walls
    res["min"] = {k: min(v) for k, v in walls.items()}

    # shuffle bytes, one measured run each
    for name, fn in (("A_current", run_a), ("B_bloom", run_b)):
        before = stage_rows(spark)
        fn()
        after = stage_rows(spark)
        new = {k: v for k, v in after.items() if k not in before}
        res[f"bytes_{name}"] = {
            "shuffle_write": sum(v["shuffle_write"] for v in new.values()),
            "input": sum(v["input"] for v in new.values()),
            "n_stages": len(new),
        }
    res["load_avg_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(res))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
