"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set,
scan the corpus once, rank per query. At 100 TB the corpus side stays
partition-parallel with zero shuffle until the final per-query top-k
(k rows per partition survive the partial top-k, so the shuffle is tiny).

Scale path: label-blocked near-dup join (the IVF idea: only compare
vectors inside the same coarse cell). Blocking keys shuffle once.

Dot products use an explicit left-to-right fold (F.aggregate over
zip_with) so the oracle's list_reduce reproduces bitwise-identical
doubles. No Python UDFs — everything stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .dedup import _track, release_cached  # noqa: F401  (re-exported lifecycle)


def dot_expr(a: str | Column, b: str | Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Top-k cosine neighbors per query vector (brute force baseline).

    ``queries`` must be small enough to broadcast; the corpus is scanned
    once. Norms are computed once per vector BEFORE the pair join (one
    fold per pair instead of three). Deterministic tie-break on id.
    """
    # persist the normed sides: Catalyst's projection collapse would
    # otherwise inline the norm fold back into every pair row
    q = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("q_norm", F.sqrt(dot_expr("q_vec", "q_vec")))
        .persist()
    )
    c = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
        .withColumn("c_norm", F.sqrt(dot_expr("c_vec", "c_vec")))
        .persist()
    )
    scored = (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "sim", F.round(dot_expr("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6)
        )
        .select("q_id", "vec_id", "sim")
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    out = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return _track(out, q, c)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    k: int = 10,
    nprobe: int = 3,
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is partitioned into cells
    (here the label column; in production a k-means assignment), each
    cell represented by a deterministic pivot vector (its minimum-id
    member — reproducible, unlike float-summed centroids). A query
    scores the pivots, probes only its ``nprobe`` nearest cells, and
    brute-forces within them. At 100 TB the probed fraction bounds both
    scan and shuffle: cost scales with nprobe/ncells, not corpus size.
    """
    w_cell = W.partitionBy("cell").orderBy("vec_id")
    pivots = (
        corpus.select(
            F.col(cell_col).alias("cell"), F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
        )
        .withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") == 1)
        .select("cell", F.col("vec").alias("pivot"))
    )
    q = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("q_norm", F.sqrt(dot_expr("q_vec", "q_vec")))
        .persist()
    )
    # rank cells per query by pivot similarity; keep nprobe
    w_q = W.partitionBy("q_id").orderBy(F.desc("psim"), F.asc("cell"))
    probed = (
        q.crossJoin(F.broadcast(pivots))
        .withColumn("psim", cosine_expr("q_vec", "pivot"))
        .withColumn("prank", F.row_number().over(w_q))
        .filter(F.col("prank") <= nprobe)
        .select("q_id", "q_vec", "q_norm", "cell")
    )
    c = (
        corpus.select(
            F.col(cell_col).alias("cell"), F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")
        )
        .withColumn("c_norm", F.sqrt(dot_expr("c_vec", "c_vec")))
        .persist()
    )
    scored = (
        c.join(F.broadcast(probed), ["cell"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "sim", F.round(dot_expr("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6)
        )
        .select("q_id", "vec_id", "sim")
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    out = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return _track(out, q, c)


def blocked_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.4,
    max_block: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs within a blocking cell (IVF-style):
    only same-block pairs are compared, so the join shuffles once on the
    block key instead of building the full cross product.

    Each cell costs O(block^2); at 100 TB a runaway hot cell (one label
    holding millions of vectors) would dominate the stage. ``max_block``
    caps that: cells larger than the cap keep only the ``max_block``
    lowest-id members (deterministic, documented truncation — near-dup
    detection within a huge homogeneous cell saturates well below the
    full pair set). Default None compares everything."""
    normed = (
        df.select(F.col(block_col).alias("blk"), F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        .withColumn("nrm", F.sqrt(dot_expr("vec", "vec")))
    )
    if max_block is not None:
        w = W.partitionBy("blk").orderBy(F.asc("vid"))
        normed = (
            normed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_block)
            .drop("__rn")
        )
    normed = normed.persist()  # see brute_force_topk: stop projection collapse re-inlining
    a = normed.select("blk", F.col("vid").alias("a_id"), F.col("vec").alias("a_vec"), F.col("nrm").alias("a_norm"))
    b = normed.select("blk", F.col("vid").alias("b_id"), F.col("vec").alias("b_vec"), F.col("nrm").alias("b_norm"))
    out = (
        a.join(b, ["blk"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "sim", F.round(dot_expr("a_vec", "b_vec") / (F.col("a_norm") * F.col("b_norm")), 6)
        )
        .filter(F.col("sim") >= threshold)
        .select("blk", "a_id", "b_id", "sim")
    )
    return _track(out, normed)
