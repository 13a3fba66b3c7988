"""Training-data sampling, packing and ordering operators.

Everything here is deterministic (hash-derived, no RNG state) so results
are reproducible across runs, engines, and partitionings — the property
a 100 TB training-data pipeline actually needs from "random" sampling:

- hash_sample / stratified_sample: Bernoulli sampling by md5 bucket.
  Pure filter expressions — no shuffle, fully pushdown-friendly, and the
  sample is stable under repartitioning and incremental reruns (a doc's
  keep/drop never depends on which partition it landed in).
- domain_mix: two-pass rate computation (tiny per-source aggregate,
  broadcast back) + hash filter, targeting a desired per-source row
  budget — the "mix CommonCrawl at 60%, books at 10%…" step.
- pack_sequences: contiguous token-budget packing via one window cumsum.
  Approximation contract: documents are packed in ascending id order and
  a pack may overshoot the budget by less than one document (the
  streaming-greedy equivalent with zero coordination; exact bin packing
  is NP-hard and needs global state).
- deterministic_shuffle: global training order by md5(seed || id) — a
  distributed range-partitioned sort, the standard epoch-shuffle shape.

All expressions are built-in pyspark.sql.functions (JVM codegen); the
DuckDB oracles in queries/pipeline.py mirror them literally
(Spark ``conv(substr(md5(x),1,8),16,10)`` == DuckDB
``('0x' || substr(md5(x),1,8))::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 32-bit bucket space: md5's first 8 hex chars as an unsigned int
BUCKETS = 1 << 32


def _bucket(id_col: str, seed: str) -> Column:
    """Deterministic uniform bucket in [0, 2^32) for (seed, id)."""
    key = F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")


def hash_sample(df: DataFrame, id_col: str, rate: float, seed: str = "s0") -> DataFrame:
    """Keep each row independently with probability ``rate``,
    deterministically: bucket(id) < rate * 2^32. A pure filter — no
    shuffle, survives repartitioning, and re-running on grown data keeps
    every previously-sampled row (stable incremental sampling)."""
    threshold = int(rate * BUCKETS)
    return df.filter(_bucket(id_col, seed) < F.lit(threshold))


def importance_sample(df: DataFrame, id_col: str, weight: Column, seed: str = "s0") -> DataFrame:
    """Quality-weighted (importance) sampling: keep each row
    independently with probability ``clamp(weight, 0, 1)``, where
    ``weight`` is any per-row expression (a quality score, an inverse
    duplication count, a domain prior ...). The continuous
    generalization of :func:`stratified_sample` — still a pure
    deterministic filter: bucket(id) < weight * 2^32, no shuffle, no RNG
    state, stable under repartitioning and incremental reruns."""
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight.cast("double")))
    return df.filter(_bucket(id_col, seed) < (p * F.lit(float(BUCKETS))).cast("bigint"))


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, rates: dict[str, float], seed: str = "s0"
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. per-language). Strata absent
    from ``rates`` are dropped. Still a pure filter: the rate lookup is
    a literal CASE over the (small) strata set."""
    expr = None
    for k, r in rates.items():
        t = F.when(F.col(stratum_col) == k, F.lit(int(r * BUCKETS)))
        expr = t if expr is None else expr.when(F.col(stratum_col) == k, F.lit(int(r * BUCKETS)))
    expr = expr.otherwise(F.lit(0))
    return df.filter(_bucket(id_col, seed) < expr)


def domain_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    target_total: int,
    seed: str = "s0",
) -> DataFrame:
    """Downsample each source so the result approximates ``target_total``
    rows distributed by ``weights`` (a source with fewer rows than its
    budget keeps everything — rates cap at 1).

    Two passes: a per-source count (tiny aggregate — one row per
    source, broadcast back onto the fact table) decides each source's
    keep-rate; the filter itself is the same deterministic hash
    Bernoulli as :func:`hash_sample`. Adding a source or rerunning on
    grown data changes no previously-kept row's fate."""
    w_items = list(weights.items())
    wmap = F.create_map(*[F.lit(x) for kv in w_items for x in kv])
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    rates = counts.select(
        F.col(source_col),
        F.least(
            F.lit(1.0),
            F.coalesce(wmap[F.col(source_col)], F.lit(0.0)) * F.lit(float(target_total))
            / F.col("_n").cast("double"),
        ).alias("_rate"),
    )
    joined = df.join(F.broadcast(rates), source_col)
    return joined.filter(
        _bucket(id_col, seed) < (F.col("_rate") * F.lit(float(BUCKETS))).cast("bigint")
    ).drop("_rate")


def pack_sequences(
    df: DataFrame, id_col: str, n_tokens: Column, budget: int, group_span: int = 100_000
) -> DataFrame:
    """Assign documents to fixed token-budget packs (context windows).

    Ids are split into contiguous blocks of ``group_span``
    (group = id div span) and each block packs independently: within a
    block, documents are taken in ascending id order and pack boundaries
    fall where the running token total crosses a budget multiple —
    local_pack = floor((cumsum - n_tokens) / budget). A pack overshoots
    the budget by less than one document (exact bin packing is NP-hard
    and needs global state); packs never span blocks, so the window
    cumsum is partitioned by group and runs embarrassingly parallel — no
    single-partition global sort at 100 TB, no driver loop.

    pack_id = group * group_span + local_pack is globally unique (a
    block of span ids holds at most span documents, hence < span packs).
    Returns (id, n_tokens, pack_id, pack_pos)."""
    wg = (
        Window.partitionBy("_grp")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        df.select(F.col(id_col), n_tokens.cast("bigint").alias("n_tokens"))
        .withColumn("_grp", F.expr(f"cast({id_col} as bigint) div {group_span}"))
        .withColumn("_cum", F.sum("n_tokens").over(wg))
        .withColumn(
            "pack_id",
            F.col("_grp") * F.lit(group_span)
            + F.expr(f"(_cum - n_tokens) div {budget}"),
        )
    )
    # packs never span _grp blocks, so partitionBy(_grp, pack_id) equals
    # partitionBy(pack_id) semantically — and because the existing
    # hash-partitioning on (_grp) already clusters (_grp, pack_id),
    # EnsureRequirements inserts NO second exchange, only a local
    # re-sort (one shuffle saved vs the old partitionBy(pack_id)).
    wp = Window.partitionBy("_grp", "pack_id").orderBy(id_col)
    return out.withColumn("pack_pos", F.row_number().over(wp)).drop("_cum", "_grp")


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: str = "epoch0", n_buckets: int = 256
) -> DataFrame:
    """Deterministic training order: (shuffle_bucket, shuffle_pos).

    The md5(seed || id) key assigns each row a bucket (key's leading
    bits) and a position within the bucket (row_number over the full
    key). A training loader reading buckets in order visits rows in one
    global pseudo-random permutation; per-bucket windows keep the sort
    embarrassingly parallel (no single-partition global row_number —
    raise ``n_buckets`` with corpus size). Changing ``seed`` reshuffles
    independently (per-epoch)."""
    key = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    df2 = df.withColumn("_k", key).withColumn(
        "shuffle_bucket",
        (F.conv(F.substring("_k", 1, 8), 16, 10).cast("bigint") % F.lit(n_buckets)).cast("int"),
    )
    w = Window.partitionBy("shuffle_bucket").orderBy(F.col("_k"), F.col(id_col))
    return df2.withColumn("shuffle_pos", F.row_number().over(w)).drop("_k")


def contamination_report(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_overlap: int = 1,
    hash_shingles: bool = True,
) -> DataFrame:
    """Train/test n-gram contamination: for each test document, how many
    of its distinct n-gram shingles appear in ANY train document, and
    the contamination rate (overlap / test shingle count).

    Shape at scale: both sides explode to (doc, shingle); the train side
    reduces to DISTINCT shingles (the only join key), so the join is a
    shuffle join on a uniform hash-like key — no doc×doc blowup. One
    fused pass (explode test ONCE, LEFT join the distinct train set,
    single groupBy(doc) computing size and overlap together): the
    earlier sizes/hits two-branch shape exploded the test corpus twice
    and paid two extra shuffles (the r3->r4 p06 regression).

    ``hash_shingles`` (default) keys on xxhash64 longs instead of the
    raw strings — and since r9's sf10 checkpoint, the hash is computed
    DIRECTLY from the n word arguments (text.hashed_shingles_expr), so
    the shingle strings are never materialized: the concat_ws
    allocations were ~80% of p06's wall at sf10 (train-side explode
    42 -> 7 s). The distinct + join shuffles carry 8-byte keys rather
    than full n-gram text. A 64-bit collision counts a clean test
    shingle as contaminated: P ~ d^2/2^65 for d distinct shingles —
    negligible below billions of shingles, and a screening metric
    tolerates ~1e-8 relative inflation at corpus scale. Pass
    ``hash_shingles=False`` for exact string membership.
    """
    from .text import hashed_shingles_expr, shingles_expr

    from .spread import spread

    sh_expr = (
        hashed_shingles_expr(text_col, n) if hash_shingles else shingles_expr(text_col, n)
    )
    test_sh = spread(test).select(
        F.col(id_col).alias("doc"), F.explode(sh_expr).alias("sh")
    )
    train_sh = (
        spread(train)
        .select(F.explode(sh_expr).alias("sh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # each test shingle matches at most one (distinct) train row, so the
    # left join preserves test_sh's row count: count(*) is the shingle
    # count and count(__hit) the overlap, in ONE aggregation
    return (
        test_sh.join(train_sh, "sh", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_overlap"),
        )
        .select(
            "doc",
            "n_shingles",
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double")).alias(
                "contamination"
            ),
        )
        .filter(F.col("n_overlap") >= min_overlap)
    )


def sample_n_per_group(
    df: DataFrame, id_col: str, group_col: str, n: int, seed: str = "s0"
) -> DataFrame:
    """Deterministic EXACT-SIZE sample: the n rows per group with the
    smallest md5(seed:id) — a distributed reservoir-sample equivalent
    with no RNG state. Unlike the Bernoulli samplers this guarantees
    |group| rows exactly (or the whole group if smaller), at the cost
    of one shuffle on the group key; the hash order makes the chosen
    set stable across runs and partitionings, and a grown corpus only
    swaps rows whose hash displaces a previous winner."""
    key = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def temperature_mix(
    df: DataFrame, id_col: str, source_col: str, target_total: int, seed: str = "s0"
) -> DataFrame:
    """sqrt-temperature source rebalancing (the multilingual-LM
    alpha = 0.5 exponent): source s keeps
    ``min(1, target * (w_s / sum_w) / n_s)`` of its rows where
    ``w_s = sqrt(n_s)`` — low-resource sources are upweighted relative
    to proportional sampling, the standard mitigation for head-language
    dominance.

    Determinism: sqrt is correctly rounded on every IEEE engine (unlike
    pow), and the normalizing sum accumulates round(sqrt, 6) in exact
    DECIMAL, so the per-source rates — and therefore every row's
    keep/drop — are bit-reproducible across engines and partitionings.
    Same two-pass shape as :func:`domain_mix`: tiny per-source
    aggregate broadcast back, then the pure hash-Bernoulli filter."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    w6 = F.round(F.sqrt(F.col("_n").cast("double")), 6).cast("decimal(18,6)")
    weights = counts.select(F.col(source_col), F.col("_n"), w6.alias("_w"))
    wsum = weights.agg(F.sum("_w").alias("_wsum"))  # exact DECIMAL sum
    rates = weights.crossJoin(F.broadcast(wsum)).select(
        F.col(source_col),
        F.least(
            F.lit(1.0),
            F.lit(float(target_total))
            * (F.col("_w").cast("double") / F.col("_wsum").cast("double"))
            / F.col("_n").cast("double"),
        ).alias("_rate"),
    )
    joined = df.join(F.broadcast(rates), source_col)
    return joined.filter(
        _bucket(id_col, seed) < F.floor(F.col("_rate") * F.lit(float(BUCKETS))).cast("bigint")
    ).drop("_rate")


def curriculum_schedule(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    thresholds: tuple[float, ...] = (4.5, 5.5),
    phase_token_budget: int | None = None,
    seed: str = "s0",
) -> DataFrame:
    """Curriculum training schedule: documents are staged easy -> hard
    by a difficulty proxy (mean word length — longer words ~ harder
    text) banded at the given ``thresholds`` (len+1 phases),
    deterministically shuffled WITHIN each phase (hash order,
    reproducible under reruns and repartitioning), and cut to an
    optional per-phase token budget via a running token sum.

    Output: (id, phase, seq, n_tokens, cum_tokens) per scheduled doc.
    Scale shape: difficulty and phase are pure per-row expressions
    (thresholds are parameters, the same shape as stratified_sample's
    rates — calibrate them once on a sample rather than paying an
    exact-NTILE global sort, which would be the single-partition-window
    trap at 100 TB); the per-phase (seq, running-sum) windows are the
    only shuffle, no joins, no driver state.
    """
    from pyspark.sql import Window

    words = F.split(F.lower(F.col(text_col)), " ")
    # exact integer proxy: total non-space chars / word count, as a
    # DOUBLE division of two exact ints (cross-engine deterministic)
    n_words = F.size(words)
    n_chars = F.length(F.regexp_replace(F.lower(F.col(text_col)), " ", ""))
    difficulty = n_chars.cast("double") / n_words.cast("double")
    phase = F.lit(1)
    for t in sorted(thresholds):
        phase = phase + F.when(difficulty >= float(t), F.lit(1)).otherwise(F.lit(0))
    staged = docs.select(
        F.col(id_col).alias("id"),
        n_words.cast("int").alias("n_tokens"),
        phase.cast("int").alias("phase"),
        _bucket(id_col, seed).alias("_h"),
    )
    w = Window.partitionBy("phase").orderBy(F.asc("_h"), F.asc("id"))
    out = (
        staged.withColumn("seq", F.row_number().over(w).cast("int"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .select("id", "phase", "seq", "n_tokens", "cum_tokens")
    )
    if phase_token_budget is not None:
        out = out.filter(F.col("cum_tokens") <= int(phase_token_budget))
    return out


def leakage_free_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    val_rate: float = 0.2,
    n: int = 3,
    threshold: float = 0.2,
    seed: str = "split",
    method: str = "minhash",
) -> DataFrame:
    """Train/val split that near-dup clusters never straddle — the
    contamination-by-construction guard a training pipeline needs
    BEFORE the split, not after (p06's contamination_report measures
    leakage; this prevents it): documents are clustered by n-gram
    Jaccard near-duplication (:func:`~.dedup.ngram_jaccard_pairs` >=
    ``threshold`` -> :func:`~.dedup.neardup_components` min-label
    clusters, unpaired docs are their own singleton cluster), then the
    ENTIRE cluster is routed to val when bucket(cluster) < rate * 2^32
    — the same deterministic md5 bucket as :func:`hash_sample`, keyed
    by the cluster representative, so two near-duplicates can never end
    up on opposite sides of the boundary.

    ``method``: "minhash" (default — LSH-banded candidates with exact
    Jaccard verify, the frontline 100 TB path) or "jaccard" (exact
    all-co-shingle pairs, superlinear by design; the verification
    oracle's formulation, used by the p11 gate for SQL parity). Both
    verify candidates with exact Jaccard >= threshold, so minhash can
    only MISS a cluster edge LSH never surfaces — never invent one.

    Scale shape: the dedup machinery's (df-capped inverted index +
    bounded min-label iterations), one left join of the corpus against
    the (small) paired-docs cluster table, then a pure map-side split
    expression — no additional shuffles.

    Output: doc (id), cluster (representative id), split ('train'/'val')."""
    from ._lifecycle import track as _track
    from .dedup import minhash_lsh_pairs, neardup_components, ngram_jaccard_pairs

    if method == "minhash":
        pairs = minhash_lsh_pairs(df, id_col, text_col, n=n).filter(
            F.col("jaccard") >= threshold
        )
    else:
        pairs = ngram_jaccard_pairs(df, id_col, text_col, n=n, threshold=threshold)
    comp = neardup_components(pairs.select("a_id", "b_id"))
    base = df.select(F.col(id_col).alias("doc"))
    lab = (
        base.join(comp.withColumnRenamed("node", "doc"), "doc", "left")
        .withColumn("cluster", F.coalesce(F.col("comp"), F.col("doc")))
        .drop("comp")
    )
    thresholdb = int(val_rate * BUCKETS)
    out = lab.withColumn(
        "split",
        F.when(_bucket("cluster", seed) < F.lit(thresholdb), F.lit("val")).otherwise(
            F.lit("train")
        ),
    )
    return _track(out, pairs, comp)


def interleave_sources(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    weights: Column | None = None,
    seed: str = "il0",
    limit: int | None = None,
) -> DataFrame:
    """Deterministic stride-scheduled interleave of multiple sources
    into one global training order.

    Classic data-mixing pass: each source s gets a weight w_s; its k-th
    example (k = 1..) is scheduled at virtual time k / w_s, and the
    global order sorts by (virtual time, source, k) — so a source with
    weight 2 contributes twice as often as a weight-1 source, uniformly
    interspersed rather than in blocks. Within a source the order is a
    deterministic md5 shuffle (same device as deterministic_shuffle).

    Scale shape: one hash-partitioned window per source numbers the
    rows (the shuffle a repartition-by-source would pay). The global
    position NEVER uses a partitionless window (that collapses the
    whole dataset onto one task): with ``limit`` the schedule head is
    taken via orderBy().limit() — Spark's distributed TakeOrdered —
    and only the bounded head is numbered; without ``limit`` the
    positions come from a range-partitioned sort plus per-partition
    prefix offsets (a bounded partition-count aggregate broadcast back)
    — the same two-phase zip-index every engine uses for global
    numbering at scale. No driver-side state beyond the per-partition
    counts; weights is a Column so callers can derive it from metadata
    joins without collecting."""
    if weights is None:
        # default: weight 1..3 by the numeric suffix of the source name
        weights = (
            F.regexp_extract(F.col(source_col), "([0-9]+)$", 1).cast("int") % 3 + 1
        ).cast("double")
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))), F.col(id_col)
    )
    d = df.select(
        F.col(id_col), F.col(source_col), weights.alias("w_src")
    ).withColumn("seq", F.row_number().over(w))
    d = d.withColumn("vtime", F.col("seq").cast("double") / F.col("w_src"))
    sort_cols = [F.col("vtime"), F.col(source_col), F.col("seq")]
    if limit is not None:
        head = d.orderBy(*sort_cols).limit(limit)
        order = Window.orderBy(*sort_cols)  # bounded: <= limit rows
        return head.withColumn("global_pos", F.row_number().over(order)).select(
            id_col, source_col, "seq", "vtime", "global_pos"
        )
    srt = d.repartitionByRange(*sort_cols).sortWithinPartitions(*sort_cols)
    srt = srt.withColumn("_pid", F.spark_partition_id())
    counts = srt.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(off_w), F.lit(0))
    ).select("_pid", "_off")  # one row per partition — broadcast model
    local = Window.partitionBy("_pid").orderBy(*sort_cols)
    return (
        srt.withColumn("_local", F.row_number().over(local))
        .join(F.broadcast(offsets), "_pid")
        .select(
            id_col,
            source_col,
            "seq",
            "vtime",
            (F.col("_off") + F.col("_local")).cast("int").alias("global_pos"),
        )
    )


def mix_budget(
    docs: DataFrame,
    budget_tokens: int,
    weight: Column,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget mixture plan (the static core of Pile/DoReMi-style
    data mixing): given per-document texts, a per-source mixing weight
    expression, and a total training token budget, compute for every
    source its available tokens, its weight-proportional target, the
    Bernoulli/epoch sampling plan that realizes the target, and the
    up/down-sampling factor.

    ``sample_rate`` > 1 means the source is repeated: ``n_full_epochs``
    whole passes plus a ``residual_rate`` Bernoulli pass — exactly the
    loader schedule (e.g. rate 2.4 = 2 full epochs + sample 40%).

    Determinism: available/target are exact integer arithmetic until
    single, identically-ordered double divisions (both engines IEEE754).
    Scale: one partial-aggregated shuffle on source (few hundred keys),
    then a 1-row broadcast for the weight total — no data-proportional
    driver work; the plan output is loader metadata, tiny by nature."""
    per_src = (
        docs.select(
            F.col(source_col).alias("source"),
            F.size(F.split(F.col(text_col), " ")).alias("_tok"),
            weight.cast("bigint").alias("_w"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("available_tokens"),
            F.max("_w").alias("weight"),
        )
    )
    totals = per_src.agg(F.sum("weight").alias("_w_total"))
    planned = per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "available_tokens",
        "weight",
        (
            (F.lit(int(budget_tokens)) * F.col("weight")).cast("double")
            / F.col("_w_total").cast("double")
        ).alias("target_tokens"),
    )
    rate = F.col("target_tokens") / F.col("available_tokens").cast("double")
    return planned.select(
        "source",
        "n_docs",
        "available_tokens",
        "weight",
        "target_tokens",
        rate.alias("sample_rate"),
        F.floor(rate).cast("bigint").alias("n_full_epochs"),
        (rate - F.floor(rate)).alias("residual_rate"),
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    k: int,
    seed: str = "s0",
) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup 2007): a weighted
    WITHOUT-replacement sample of exactly ``k`` rows with per-row
    unbiased subset-sum estimators.

    Each row gets priority ``w * (2^32 + 1) / u`` where ``u`` is the
    deterministic md5 bucket + 1 (uniform on [1, 2^32]) — i.e. w/U for
    U uniform in (0, 1]. The k highest-priority rows are the sample;
    the (k+1)-th priority is the threshold ``tau``, and each sampled
    row's estimator weight is ``max(w, tau)``: for ANY subset S,
    E[sum of est_w over sampled rows in S] = sum of true w over S — the
    property that lets a 0.001% sample answer weighted corpus questions
    unbiasedly.

    Determinism across engines: both priority factors are exact IEEE
    ops (an exact small-int double product, then one correctly-rounded
    division), so Spark and DuckDB produce bit-identical doubles; ties
    break on id. Scale: the ONLY pass over ``df`` is one
    TakeOrdered(k+1) — a per-partition partial top-k whose shuffle
    carries k+1 rows per partition, no global sort (the same plan
    shape the p12 rewrite established for ordered prefixes). The k+1
    survivors are eagerly localCheckpointed (bounded — k+1 rows), so
    deriving tau and the final k-sample from them never re-scans the
    input; tau itself is a single bounded driver value (the repo's
    documented .collect() discipline).

    Output adds ``priority``, ``tau``, ``est_w`` (with ``_w``/``_pri``/
    ``_tau`` as working names); these are reserved — inputs already
    carrying any of them raise rather than silently shadowing.
    """
    reserved = {"_w", "_pri", "_tau", "priority", "tau", "est_w"}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"priority_sample: input columns {sorted(clash)} collide with "
            "reserved output/working names (_w, _pri, _tau, priority, tau, "
            "est_w); rename them first"
        )
    w = weight.cast("double")
    u = (_bucket(id_col, seed) + F.lit(1)).cast("double")
    pri = w * F.lit(float(BUCKETS + 1)) / u
    ranked = df.withColumn("_w", w).withColumn("_pri", pri)
    topk1 = ranked.orderBy(F.desc("_pri"), F.asc(id_col)).limit(k + 1).localCheckpoint()
    n1 = topk1.count()  # already materialized by the checkpoint
    tau_val = (
        float(topk1.agg(F.min("_pri")).collect()[0][0]) if n1 > k else 0.0
    )
    sample = topk1.orderBy(F.desc("_pri"), F.asc(id_col)).limit(k)
    return (
        sample.withColumn("_tau", F.lit(tau_val))
        .withColumn("est_w", F.greatest(F.col("_w"), F.col("_tau")))
        .drop("_w")
        .withColumnRenamed("_pri", "priority")
        .withColumnRenamed("_tau", "tau")
    )


def pack_manifest(
    df: DataFrame, id_col: str, n_tokens: Column, budget: int, group_span: int = 100_000
) -> DataFrame:
    """The dataloader-facing output of :func:`pack_sequences`: one row
    per pack with its document manifest — each doc's byte/token offset
    inside the context window — plus fill accounting. A training job
    reads THIS table to materialize fixed-length sequences without
    re-deriving the packing.

    Emits (pack_id, n_docs, pack_tokens, overshoot, manifest) where
    ``manifest`` is the ordered ``doc:offset:len`` list joined with
    commas (a flat string rather than array<struct> so the result is
    trivially portable/hashable across engines).

    Scale: pack_sequences' window runs on the _grp partitioning; the
    manifest adds ONE exchange on pack_id (hash-uniform — pack
    populations are bounded by budget/min-doc-tokens), whose
    partitioning the groupBy then reuses — no further shuffle.
    """
    packed = pack_sequences(df, id_col, n_tokens, budget, group_span)
    wo = (
        Window.partitionBy("pack_id")
        .orderBy("pack_pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_off = packed.withColumn(
        "_off", F.sum("n_tokens").over(wo) - F.col("n_tokens")
    ).withColumn(
        "_entry",
        F.concat_ws(
            ":", F.col(id_col).cast("string"), F.col("_off").cast("string"),
            F.col("n_tokens").cast("string"),
        ),
    )
    return with_off.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        F.greatest(F.lit(0).cast("bigint"), F.sum("n_tokens") - F.lit(budget))
        .cast("bigint")
        .alias("overshoot"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pack_pos", "_entry"))),
                lambda s: s["_entry"],
            ),
            ",",
        ).alias("manifest"),
    )


def apportion_budget(
    df: DataFrame,
    source_col: str,
    target_total: int,
) -> DataFrame:
    """EXACT integer budget apportionment across sources by the
    largest-remainder (Hamilton) method: each source gets
    floor(target * n_s / N) rows, and the leftover
    ``target - sum(floors)`` seats go to the sources with the largest
    remainders ``(target * n_s) mod N`` (ties to the smaller source
    name). Quotas sum to EXACTLY ``target_total`` — the property the
    rate-based mixers (domain_mix/mix_budget) trade away for
    shuffle-free Bernoulli filtering; use this when a downstream
    contract needs the budget hit exactly (eval-set assembly, per-shard
    row caps).

    Everything is integer arithmetic on BIGINTs (floors and remainders
    of target*n_s, never a float), so the allocation is bit-exact on
    any engine. Shape: one tiny per-source count (rows = #sources),
    remainder ranking by window over that tiny frame, output is the
    per-source quota table a driver or a follow-up deterministic
    sampler (sample_n_per_group with n per-source) consumes.
    Overflow bound: target * n_s must fit in signed 64 bits.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(F.sum("n_rows").alias("_N"))
    base = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_rows",
        F.expr(f"CAST({target_total} AS BIGINT) * n_rows DIV _N").alias("floor_q"),
        F.expr(f"CAST({target_total} AS BIGINT) * n_rows % _N").alias("rem"),
        F.col("_N"),
    )
    w = Window.orderBy(F.desc("rem"), F.asc(source_col))
    leftover = F.lit(int(target_total)) - F.sum("floor_q").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ranked = base.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_left", leftover
    )
    return ranked.select(
        source_col,
        "n_rows",
        (F.col("floor_q") + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0))
        .cast("long")
        .alias("quota"),
        F.col("floor_q").cast("long").alias("floor_quota"),
        F.col("rem").cast("long").alias("remainder"),
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
    seed: str = "sp0",
) -> DataFrame:
    """Deterministic three-way split: adds a ``split`` column with
    'train' / 'val' / 'test' from the id's hash bucket (test gets the
    remaining 1 - train - val mass).

    The standard pre-training holdout assignment, with the same
    properties as :func:`hash_sample`: a pure map-side expression (no
    shuffle, no RNG state), stable under repartitioning, and
    incremental — new documents join a split without moving any
    existing one, so eval sets stay frozen as the corpus grows. Unlike
    randomSplit, the assignment is reproducible across runs, sessions
    and cluster sizes.

    For leakage-aware splitting (near-duplicate clusters routed to one
    side whole) use :func:`leakage_free_split`; this operator is the
    cheap exact-id variant."""
    if not (0.0 <= train and 0.0 <= val and train + val <= 1.0):
        raise ValueError(f"invalid split fractions train={train} val={val}")
    t1 = int(train * BUCKETS)
    t2 = int((train + val) * BUCKETS)
    b = _bucket(id_col, seed)
    return df.withColumn(
        "split",
        F.when(b < F.lit(t1), F.lit("train"))
        .when(b < F.lit(t2), F.lit("val"))
        .otherwise(F.lit("test")),
    )
