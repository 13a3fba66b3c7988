"""Per-query shuffle-byte profile (r15, VERDICT r14 item 3): run each
query once through the noop sink and report the total shuffle WRITE
bytes, shuffle READ bytes and input bytes across the stages the query
ran — read from the driver's AppStatusStore via py4j (no UI/REST
needed). This is the measurement the carried-payload trade in
d03/v05 (shset/vec replicated `bands` times through the band exchange
vs the removed join-back exchanges) was owed.

Usage: python tools/shuffle_bytes.py <sf_dir> [query ...]
Prints one JSON line per query plus a final summary line.
Env: SHUFFLE_BYTES_OUT=<path> writes the summary JSON to a file too.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def stage_rows(spark):
    jvm = spark.sparkContext._jvm
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    darr = spark.sparkContext._gateway.new_array(jvm.double, 0)
    stages = store.stageList(empty, False, False, darr, empty)
    out = {}
    for i in range(stages.size()):
        s = stages.apply(i)
        out[(s.stageId(), s.attemptId())] = {
            "shuffle_write": s.shuffleWriteBytes(),
            "shuffle_read": s.shuffleReadBytes(),
            "input": s.inputBytes(),
            "tasks": s.numCompleteTasks(),
        }
    return out


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        names = [
            "d02_dedup_ngram_jaccard",
            "d03_dedup_minhash_lsh",
            "d05_simhash_pairs",
            "v05_srp_neardup",
            "p06_contamination",
        ]

    from polars_readstat_rs_spark.operators.dedup import release_cached
    from polars_readstat_rs_spark.queries import QUERIES
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark("shuffle-bytes")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (codegen, footers, python workers) — not measured
    QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    summary = {"metric": "shuffle_bytes", "sf_dir": sf_dir, "queries": {}}
    for name in names:
        before = stage_rows(spark)
        spark.catalog.clearCache()
        t0 = time.time()
        out = QUERIES[name](spark, sf_dir)
        out.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        release_cached(out)
        after = stage_rows(spark)
        new = {k: v for k, v in after.items() if k not in before}
        rec = {
            "wall_sec": round(wall, 3),
            "n_stages": len(new),
            "shuffle_write_bytes": sum(v["shuffle_write"] for v in new.values()),
            "shuffle_read_bytes": sum(v["shuffle_read"] for v in new.values()),
            "input_bytes": sum(v["input"] for v in new.values()),
            "stages": {
                str(k[0]): {
                    "swB": v["shuffle_write"],
                    "srB": v["shuffle_read"],
                    "inB": v["input"],
                    "tasks": v["tasks"],
                }
                for k, v in sorted(new.items())
            },
        }
        summary["queries"][name] = rec
        print(json.dumps({"q": name, **{k: rec[k] for k in (
            "wall_sec", "n_stages", "shuffle_write_bytes", "shuffle_read_bytes",
            "input_bytes")}}), flush=True)
    out_path = os.environ.get("SHUFFLE_BYTES_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1)
    print(json.dumps({"done": True, "out": out_path}))


if __name__ == "__main__":
    main()
