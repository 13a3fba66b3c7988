"""Synthesize a larger scale factor from sf0.1 by key-offset replication
(r8 verdict task 8: the 2x ceiling is judged at sf0.1 where Spark's
~0.1-0.2 s/stage scheduling floor dominates sub-second queries; an sf1
run shows the floor amortizing as data grows).

Each replica i offsets every KEY column by i * STRIDE so grouped /
joined / deduped entities stay distinct; dimension tables (region,
nation, supplier, part, customer) stay single-copy, so fact->dim joins
fan out 10x — the realistic shape (more facts per dim, not more dims).
documents.text gets a per-replica suffix token so replicas are not
byte-identical documents (otherwise every shingle's df multiplies by
the replica count and the df-cap drops the whole corpus); events.ts is
offset by i microseconds to keep window orderings deterministic.

Usage: python tools/stage_sf.py [src_sf_dir] [out_dir] [factor]
Then:  python tools/bench_multifile.py <out_dir> 16
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 100_000_000
DIMS = ("region", "nation", "supplier", "part", "customer")
KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
ALL = list(DIMS) + list(KEYS)


def stage(src: str, out: str, factor: int = 10) -> str:
    done = os.path.join(out, "_STAGED")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    for name in DIMS:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{out}/{name}.parquet")
    for name, keys in KEYS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        reps = []
        for i in range(factor):
            r = t
            for k in keys:
                r = r.set_column(
                    r.schema.get_field_index(k), k,
                    pc.add(r.column(k), i * STRIDE),
                )
            if name == "documents" and i:
                idx = r.schema.get_field_index("text")
                r = r.set_column(
                    idx, "text",
                    pc.binary_join_element_wise(
                        r.column("text").cast(pa.string()), f" rep{i}", ""
                    ),
                )
            if name == "events" and i:
                idx = r.schema.get_field_index("ts")
                r = r.set_column(
                    idx, "ts",
                    pc.add(r.column("ts"), pa.scalar(i, pa.duration("us"))),
                )
            reps.append(r)
        pq.write_table(pa.concat_tables(reps), f"{out}/{name}.parquet")
    with open(done, "w") as fh:
        fh.write("ok")
    return out


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_synth"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(stage(src, out, factor))
