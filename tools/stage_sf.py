"""Synthesize a larger scale factor from sf0.1 by key-offset replication
(r8 verdict task 8: the 2x ceiling is judged at sf0.1 where Spark's
~0.1-0.2 s/stage scheduling floor dominates sub-second queries; sf1/sf10
runs show the floor amortizing as data grows).

Each replica i offsets every KEY column by i * STRIDE so grouped /
joined / deduped entities stay distinct; dimension tables (region,
nation, supplier, part, customer) stay single-copy, so fact->dim joins
fan out factor-x — the realistic shape (more facts per dim, not more
dims); events.ts is offset by i microseconds to keep window orderings
deterministic.

NEAR-DUP INVARIANT (the r9 sf10 lesson): a scale staging must keep the
TRUE near-duplicate cluster size CONSTANT as the corpus grows (same
principle as tools/scale_smoke.py's synth) — otherwise the near-dup
PAIR OUTPUT grows quadratically in the factor and a "bench" measures
that output explosion, not the operators. The first sf10 staging
appended one ` rep{i}` token per replica: cross-replica Jaccard stayed
~0.98, so every dup cluster grew 100x, candidate buckets hit the
hot-bucket caps, and one exact-verify aggregation task ran 14+ minutes.
Now:

- documents.text applies a per-replica WORD BIJECTION (every word gets
  the suffix ``~{i}``): a token renaming is an isomorphism, so every
  within-replica Jaccard/SimHash/LM relation is preserved EXACTLY,
  while cross-replica token sets (hence shingles AND token-frequency
  profiles) are fully disjoint. (The first fix — interleaving one
  shared ``rep{i}`` token after every other word — zeroed cross-replica
  Jaccard but made every doc in a replica 50% identical at the TOKEN
  level, which correlated SimHash fingerprints and recreated the hot
  band buckets for d05. A bijection has no such shared token.)
- embeddings get a per-replica ISOMETRY (component roll by i % dim,
  whole-vector negation for i >= dim): within-replica cosines are
  exactly preserved, cross-replica cosines decorrelate, so ANN/near-dup
  output scales linearly in the factor.

Usage: python tools/stage_sf.py [src_sf_dir] [out_dir] [factor]
Then:  python tools/bench_multifile.py <out_dir> 16
   or: python tools/bench_scale_checkpoint.py <out_dir> BENCH_SF10.json 16
"""

from __future__ import annotations

import os
import sys

import numpy as np
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


def _suffix_words(col: pa.ChunkedArray, i: int) -> pa.Array:
    """Per-replica word bijection: append ``~{i}`` to every word. An
    isomorphic token renaming — within-replica shingle/Jaccard/SimHash
    relations are exactly preserved; cross-replica token sets are
    disjoint."""
    return pc.replace_substring_regex(
        col.cast(pa.string()), pattern=r"(\S+)", replacement=rf"\1~{i}"
    )


def _isometry_embeddings(tbl: pa.Table, i: int) -> pa.Table:
    """Per-replica isometric transform of the embedding column: roll
    components by i % dim, negate the whole vector for i >= dim.
    Within-replica pairwise cosines are bit-preserved (same permutation
    + global sign applied to every row); cross-replica cosines
    decorrelate, keeping near-dup output linear in the factor."""
    if i == 0:
        return tbl
    idx = tbl.schema.get_field_index("embedding")
    col = tbl.column(idx).combine_chunks()
    # fixed-width list -> 2D numpy without per-row python lists
    flat = np.asarray(col.flatten(), dtype=np.float32)
    n = len(tbl)
    dim = flat.size // n
    mat = flat.reshape(n, dim)
    rolled = np.roll(mat, i % dim, axis=1)
    if i >= dim:
        rolled = -rolled
    arr = pa.FixedSizeListArray.from_arrays(pa.array(rolled.ravel(), pa.float32()), dim)
    # keep the original list<float> type so all replicas concat cleanly
    out = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
        arr.values,
    )
    return tbl.set_column(idx, "embedding", out)


# Layout version recorded in the done marker: bump whenever the staged
# parquet layout changes so stale directories re-stage instead of
# silently keeping an old layout (e.g. pre-row-group dirs single-thread
# every byte-range split but one).
_LAYOUT = "rg65536-v1"


def stage(src: str, out: str, factor: int = 10) -> str:
    done = os.path.join(out, "_STAGED")
    if os.path.exists(done):
        with open(done) as fh:
            if fh.read().strip() == _LAYOUT:
                return out
        # stale layout: rebuild in place
        os.remove(done)
    os.makedirs(out, exist_ok=True)
    # row_group_size matters: a single giant row group makes every
    # Spark byte-range split but one EMPTY (the row group belongs to the
    # split containing its start), silently single-threading any
    # per-row-expensive stage reading the staged file — the r9 sf10
    # winnowing smoke measured 82 s for a stage that runs in ~6 s once
    # the file carries real row groups. 64k rows per group gives the
    # scheduler real splits at every staged SF.
    for name in DIMS:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{out}/{name}.parquet", row_group_size=65536)
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
                r = r.set_column(idx, "text", _suffix_words(r.column("text"), i))
            if name == "embeddings":
                r = _isometry_embeddings(r, i)
            if name == "events" and i:
                idx = r.schema.get_field_index("ts")
                r = r.set_column(
                    idx, "ts",
                    pc.add(r.column("ts"), pa.scalar(i, pa.duration("us"))),
                )
            reps.append(r)
        pq.write_table(
            pa.concat_tables(reps), f"{out}/{name}.parquet", row_group_size=65536
        )
    with open(done, "w") as fh:
        fh.write(_LAYOUT)
    return out


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_synth"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(stage(src, out, factor))
