"""Text analysis operators: language ID, quality scoring, token stats,
document fingerprinting. All pure built-in-function expressions (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._lifecycle import release_cached, track as _track  # noqa: F401  (shared lifecycle)
from .text import shingles_expr, words_expr

# n-gram-heuristic language ID: marker-token hit counts per language.
# (Real corpora would use char n-gram profiles; the synthetic testdata is
# a closed word vocabulary, so word markers are the deterministic analogue.)
LANG_MARKERS = {
    "en": ("the", "a", "table", "row"),
    "es": ("data", "value", "part"),
    "de": ("window", "batch", "merge"),
    "zh": ("spark", "query", "scan"),
}
STOPWORDS = ("the", "a", "of", "and", "to")


def _marker_count(lang: str) -> F.Column:
    toks = ", ".join(f"'{t}'" for t in LANG_MARKERS[lang])
    return F.expr(f"size(filter(split(lower(text), ' '), w -> w IN ({toks})))")


def langid(docs: DataFrame) -> DataFrame:
    # all four marker counts from ONE let-bound tokenization (the
    # separate _marker_count exprs each re-split the text — see
    # quality_score / text.py:shingles_expr for the same trap)
    fields = ", ".join(
        f"size(filter(w, x -> x IN ({', '.join(repr(t) for t in LANG_MARKERS[lg])}))) AS {lg}"
        for lg in LANG_MARKERS
    )
    counters = F.expr(
        f"element_at(transform(array(split(lower(text), ' ')), w -> struct({fields})), 1)"
    )
    scored = docs.select(
        "doc_id",
        "lang",
        counters.alias("_m"),
    ).select(
        "doc_id",
        "lang",
        *[F.col(f"_m.{lg}").alias(f"s_{lg}") for lg in LANG_MARKERS],
    )
    s = {lg: F.col(f"s_{lg}") for lg in LANG_MARKERS}
    pred = (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["zh"]), "en")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["zh"]), "es")
        .when(s["de"] >= s["zh"], "de")
        .otherwise("zh")
    )
    return scored.withColumn("pred_lang", pred).withColumn(
        "is_correct", F.col("pred_lang") == F.col("lang")
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / vocabulary-diversity / stopword-ratio quality heuristic.

    The double arithmetic is written in one fixed evaluation order so the
    DuckDB oracle reproduces it bitwise.
    """
    stop_list = ", ".join(f"'{t}'" for t in STOPWORDS)
    # let-bind the tokenized array and fold the three counters into ONE
    # struct (see text.py:shingles_expr): Catalyst's projection collapse
    # would otherwise inline the split into every reference — measured
    # ~8 splits + interpreted IN-filters per row at the sf10 checkpoint.
    counters = F.expr(
        "element_at(transform(array(split(lower(text), ' ')), w -> struct("
        "size(w) AS nt, "
        "size(array_distinct(w)) AS nd, "
        f"size(filter(w, x -> x IN ({stop_list}))) AS ns)), 1)"
    )
    d = docs.select("doc_id", F.length("text").alias("_nc"), counters.alias("_c"))
    n_tokens = F.col("_c.nt")
    n_chars = F.col("_nc")
    distinct_ratio = F.col("_c.nd").cast("double") / n_tokens.cast("double")
    stop_ratio = F.col("_c.ns").cast("double") / n_tokens.cast("double")
    avg_word_len = (n_chars - (n_tokens - F.lit(1))).cast("double") / n_tokens.cast("double")
    score = (
        F.lit(0.5) * distinct_ratio
        + F.lit(0.3) * stop_ratio
        + F.lit(0.2) * F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(200.0))
    )
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stop_ratio"),
        avg_word_len.alias("avg_word_len"),
        score.alias("quality"),
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Corpus-level token frequency table (classic first pass of a
    tokenizer-training / contamination-analysis pipeline)."""
    toks = docs.select("doc_id", F.explode(words_expr("text")).alias("tok"))
    return toks.groupBy("tok").agg(
        F.count("*").alias("n_total"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min(F.length("tok")).alias("tok_len"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: full-text hash, 8-word-prefix hash, and a
    winnowing-style min-hash over 5-gram windows (rolling-hash analogue).

    Repartitioned first: document tables typically arrive as one parquet
    split, which would serialize the per-doc hashing on a single task.
    """
    words = words_expr("text")
    from .spread import spread

    return spread(docs).select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp_full"),
        F.md5(F.concat_ws(" ", F.slice(words, 1, 8))).alias("fp_prefix8"),
        F.array_min(F.transform(shingles_expr("text", 5), F.md5)).alias("fp_winnow5"),
    )


# PII patterns: character-class-only regexes, identical semantics under
# Java regex (Spark) and RE2 (DuckDB) — no backrefs, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / phone numbers / IPv4 addresses from the text and
    count what was removed — the pre-training privacy pass. Pure
    regexp_replace/regexp_count expressions inside codegen; patterns are
    restricted to constructs whose semantics agree between Java regex
    and RE2 so the oracle reproduces them exactly. Order is fixed
    (email, phone, ipv4) so overlapping matches resolve identically."""
    out = docs.select("doc_id", F.col(text_col).alias("_t"))
    for name, pat in PII_PATTERNS.items():
        # DataFrame API, not F.expr: a SQL string literal would eat the
        # regex backslashes
        out = out.withColumn(f"n_{name}", F.regexp_count("_t", F.lit(pat)))
        out = out.withColumn("_t", F.regexp_replace("_t", pat, f"<{name.upper()}>"))
    return out.select(
        "doc_id",
        F.col("_t").alias("redacted"),
        *[F.col(f"n_{n}").cast("bigint").alias(f"n_{n}") for n in PII_PATTERNS],
        sum(F.col(f"n_{n}") for n in PII_PATTERNS).cast("bigint").alias("n_pii"),
    )


def repetition_stats(docs: DataFrame, n: int = 3, max_dup_frac: float = 0.2) -> DataFrame:
    """Repeated-n-gram fraction per document (the Gopher/MassiveText
    repetition quality filter): dup_frac = 1 - distinct/total n-grams;
    documents above ``max_dup_frac`` are flagged for removal. Pure
    array expressions — no shuffle at all (a per-row map stage)."""
    # let-bind words AND the gram array (see text.py:shingles_expr —
    # a split referenced inside an HOF lambda re-tokenizes per element):
    # one outer transform binds w, a nested one binds the built grams g,
    # and both counters come out of a single struct.
    words = "split(lower(text), ' ')"
    grams_of_w = (
        f"CASE WHEN size(w) >= {n} THEN "
        f"transform(sequence(1, size(w) - {n - 1}), "
        f"i -> concat_ws(' ', slice(w, i, {n}))) "
        f"ELSE array() END"
    )
    both = (
        f"element_at(transform(array({words}), w -> "
        f"element_at(transform(array({grams_of_w}), g -> "
        f"struct(size(g) AS n, size(array_distinct(g)) AS nd)), 1)), 1)"
    )
    return docs.select(
        "doc_id",
        F.expr(f"({both}).n").cast("bigint").alias("n_grams"),
        F.expr(f"({both}).nd").cast("bigint").alias("n_distinct"),
    ).select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.when(
            F.col("n_grams") > 0,
            1.0 - F.col("n_distinct").cast("double") / F.col("n_grams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    ).withColumn("flagged", F.col("dup_frac") > max_dup_frac)


def unigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Corpus-unigram language-model scoring (the CCNet/KenLM-style
    quality filter, reduced to the unigram case): pass 1 builds the
    corpus token-frequency table, pass 2 scores every document by the
    average log-probability of its tokens under that table.

    Returns per document: ``n_tokens``, ``sum_tok_count`` (sum of the
    corpus frequencies of each token occurrence), ``min_tok_count``
    (the rarest token's corpus count), ``corpus_tokens``, and
    ``avg_logprob`` (mean ln(count/corpus_total); higher = more typical
    text, the usual perplexity-filter axis).

    Scale: the vocabulary aggregation shuffles on the token (uniform
    after partial aggregation — stopword skew collapses map-side); the
    count join is a shuffle join by default (AQE splits the residual
    skew on very frequent tokens). ``broadcast_vocab=True`` switches to
    a broadcast join — only for corpora whose vocabulary is known to be
    driver-sized. The corpus re-tokenizes once per pass: at scale,
    rescanning is cheaper than caching an exploded token table.
    """
    toks = docs.select(F.col(id_col), F.explode(words_expr(text_col)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("tok_count"))
    totals = vocab.agg(F.sum("tok_count").alias("corpus_tokens"))
    v = F.broadcast(vocab) if broadcast_vocab else vocab
    scored = toks.join(v, "tok").crossJoin(F.broadcast(totals))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("tok_count").alias("sum_tok_count"),
            F.min("tok_count").alias("min_tok_count"),
            F.first("corpus_tokens").alias("corpus_tokens"),
            F.sum(
                F.log(F.col("tok_count").cast("double") / F.col("corpus_tokens").cast("double"))
            ).alias("sum_logprob"),
        )
        .withColumn("avg_logprob", F.col("sum_logprob") / F.col("n_tokens").cast("double"))
    )


# Gopher-rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1) adapted
# to the synthetic corpus: the word-count floor is lowered (docs are
# 10-100 words) and the symbol/ellipsis rules are dropped (the closed
# vocabulary has no punctuation), keeping the word-shape and stopword
# rules that transfer.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_AVG_LEN = 3.0
GOPHER_MAX_AVG_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.80
GOPHER_MIN_STOP_HITS = 2


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition-free quality rules as one map-only pass.

    Emits the per-rule booleans plus the conjunction (``keep``) so a
    pipeline can both filter and audit rule-level rejection rates.
    Every expression is a built-in function over the token array —
    shuffle-free, stays inside whole-stage codegen, scales linearly.
    """
    words = words_expr(text_col)
    n_words = F.size(words)
    # Same fixed-order arithmetic as quality_score so oracles match bitwise.
    avg_len = (F.length(text_col) - (n_words - F.lit(1))).cast("double") / n_words.cast("double")
    alpha_frac = (
        F.expr(f"size(filter(split(lower({text_col}), ' '), w -> w rlike '[a-z]'))").cast("double")
        / n_words.cast("double")
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_hits = F.size(F.array_intersect(F.array_distinct(words), stop_arr))
    r_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_avg = (avg_len >= GOPHER_MIN_AVG_LEN) & (avg_len <= GOPHER_MAX_AVG_LEN)
    r_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    r_stop = stop_hits >= GOPHER_MIN_STOP_HITS
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        avg_len.alias("avg_word_len"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        r_words.alias("rule_word_count"),
        r_avg.alias("rule_avg_len"),
        r_alpha.alias("rule_alpha"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_avg & r_alpha & r_stop).alias("keep"),
    )


def bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-bigram language-model scoring — the KenLM-style perplexity
    filter one order up from :func:`unigram_lm`.

    Pass 1 aggregates corpus bigram counts and left-context (unigram
    prefix) counts; pass 2 scores each document by the average
    ln P(w2|w1) = ln(c(w1,w2)/c(w1·)) over its bigrams. Documents with
    fewer than two tokens score NULL.

    Scale shape: both count tables shuffle on their key with map-side
    partial aggregation; the scoring join shuffles on the bigram key
    (AQE splits residual hot-bigram skew). Everything else is map-only
    expression work — no UDFs, no driver materialization.

    Key representation: bigrams never materialize as strings — the
    join/count keys are xxhash64 over the two word arguments directly
    (h_bg) and over the left word (h_w1), the same string-free keying
    that cut p06/d02's shuffles (concat allocations were ~80% of the
    explode cost at the sf10 checkpoint). Hashes are equality-only
    here (counts, never ordering); a 64-bit collision merges two
    bigram types with P ~ d^2/2^65 — the d02 collision-honesty note
    applies verbatim.
    """
    # Generate positions with a codegen explode and hash with ROW
    # expressions: higher-order-function lambdas are INTERPRETED per
    # element, so building per-bigram structs inside a transform costs
    # ~4x the same xxhash64 calls as post-explode codegen expressions
    # (measured at the sf1 checkpoint: 8.1 -> 2.3 s). The token array
    # rides along inside the stage — never materialized or shuffled.
    bigrams = (
        docs.select(F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("_w"))
        .select(
            F.col(id_col),
            F.col("_w"),
            F.explode(
                F.expr("CASE WHEN size(_w) >= 2 THEN sequence(1, size(_w) - 1) "
                       "ELSE array() END")
            ).alias("_i"),
        )
        .select(
            id_col,
            F.expr("xxhash64(element_at(_w, _i), element_at(_w, _i + 1))").alias("h_bg"),
            F.expr("xxhash64(element_at(_w, _i))").alias("h_w1"),
        )
    )
    # Partial reduction before the scoring join: a document's repeated
    # bigrams collapse to one (doc, bg, cnt) row map-side, so the join
    # moves distinct-bigrams-per-doc instead of every occurrence — the
    # difference between O(tokens) and O(distinct) rows through the
    # hot-bigram shuffle (Zipf corpora: the top bigrams ARE the bulk).
    doc_bg = bigrams.groupBy(id_col, "h_bg", "h_w1").agg(F.count("*").alias("cnt"))
    bg_counts = doc_bg.groupBy("h_bg").agg(F.sum("cnt").alias("bg_count"))
    # prefix totals = occurrences of bigrams sharing the left word —
    # summing doc_bg.cnt by h_w1 equals the old sum of bg_count by w1
    prefix_counts = doc_bg.groupBy("h_w1").agg(F.sum("cnt").alias("w1_count"))
    scored = doc_bg.join(bg_counts, "h_bg").join(prefix_counts, "h_w1")
    per_doc = scored.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        F.sum(F.col("cnt") * F.col("bg_count")).alias("sum_bg_count"),
        F.min("bg_count").alias("min_bg_count"),
        F.sum(
            F.col("cnt").cast("double")
            * F.log(F.col("bg_count").cast("double") / F.col("w1_count").cast("double"))
        ).alias("sum_logprob"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .withColumn("avg_logprob", F.col("sum_logprob") / F.col("n_bigrams").cast("double"))
    )


# GPT-2-style pre-tokenizer, reduced to the synthetic corpus's lowercase
# alphabet: contraction suffixes, space-prefixed letter runs, digit runs,
# and punctuation runs. Character classes only — identical semantics under
# Java regex (Spark) and RE2 (DuckDB); no lookarounds (the original GPT-2
# pattern's \s+(?!\S) needs one, dropped here).
BPE_PRETOKEN_RE = r"('s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9' ]+)"


def bpe_pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First iteration of BPE training: pre-tokenize with the GPT-2-style
    regex, then count adjacent character pairs within each pre-token —
    the corpus statistic whose argmax becomes the first BPE merge.

    Two map stages and one shuffle on the pair key (tiny domain: at most
    |alphabet|² distinct pairs, so the shuffle is a broadcast-sized
    aggregation with map-side combine). Emits per-pair totals and
    document frequency.
    """
    toks = docs.select(
        F.col("doc_id"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), \"{BPE_PRETOKEN_RE}\", 1)")
        ).alias("tok"),
    )
    pairs = toks.select(
        "doc_id",
        F.explode(
            # CASE guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0],
            # so single-char tokens must short-circuit to an empty array.
            F.expr(
                "CASE WHEN length(tok) >= 2 THEN "
                "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2)) "
                "ELSE array() END"
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(
        F.count("*").alias("n_pair"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def zipf_stats(docs: DataFrame, text_col: str = "text", top_k: int = 1000) -> DataFrame:
    """Vocabulary frequency table with Zipf ranks: per-token corpus
    count, frequency rank (count desc, token asc), corpus share, and
    cumulative share — the vocabulary-coverage curve a tokenizer/corpus
    audit reads.

    Scale shape: the corpus-sized work is one exploded token count with
    map-side combine (one shuffle on a uniform token key). The top-k cut
    is orderBy().limit() — Spark's distributed TakeOrdered (per-partition
    partial top-k, never a single-partition sort of the vocabulary, which
    at web scale is still billions of rows) — and only the surviving
    <= top_k rows pass through the rank/cumulative window; the shares are
    exact integer counts divided once at the end (deterministic, no
    float accumulation).
    """
    counts = (
        docs.select(F.explode(words_expr(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("_total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(top_k)
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    ranked = top.withColumn("rank", F.row_number().over(w_rank)).withColumn(
        "_cum", F.sum("cnt").over(w_rank.rowsBetween(Window.unboundedPreceding, 0))
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        "rank",
        (F.col("cnt").cast("double") / F.col("_total").cast("double")).alias("share"),
        (F.col("_cum").cast("double") / F.col("_total").cast("double")).alias("cum_share"),
    )


EVENT_CODES = {"click": "c", "view": "v", "signup": "s", "purchase": "p", "error": "e"}


def event_patterns(
    events: DataFrame,
    pattern: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    codes: dict[str, str] = EVENT_CODES,
) -> DataFrame:
    """Behavioral pattern mining — the poor-man's MATCH_RECOGNIZE: each
    key's event history becomes an ordered one-char-per-event string and
    ``pattern`` (a regex over those codes, e.g. ``cc*p`` = "a click run
    ending in a purchase") is counted non-overlapping left-to-right.

    One shuffle on the key; the sequence string is bounded by the per-key
    event count (cap upstream for pathological keys). The (ts, sort-key)
    tiebreak makes the sequence — and therefore the match count —
    deterministic. Keep the pattern to character classes + */+/? so Java
    regex (Spark) and RE2 (DuckDB) agree.
    """
    code_col = F.create_map(*[F.lit(x) for kv in codes.items() for x in kv])[
        F.col(type_col)
    ]
    seqs = (
        events.select(
            F.col(key_col),
            F.struct(F.col(ts_col), F.col(tiebreak_col), code_col.alias("c")).alias("ev"),
        )
        .groupBy(key_col)
        .agg(F.array_sort(F.collect_list("ev")).alias("evs"))
        .select(
            key_col,
            F.array_join(F.transform("evs", lambda s: s["c"]), "").alias("seq"),
        )
    )
    return seqs.select(
        key_col,
        F.length("seq").alias("n_events"),
        # pattern passed as a literal column — never spliced into SQL text
        F.size(F.regexp_extract_all("seq", F.lit(pattern), F.lit(0))).alias("n_matches"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic keyword/feature
    extraction pass before sparse retrieval or topic labeling.

    weight = round(tf * ln(N / df), 6) with exact-integer tf/df/N.
    libm vs JVM ``ln`` can differ by 1 ulp, so the weight is rounded to
    6 decimals (the similarity operators' convention) before ranking —
    both the emitted value and the rank order are then cross-engine
    deterministic (ties broken by token). Two shuffles total: tf per
    (doc, token) and df per token (both map-side combined); N is a
    broadcast scalar.
    """
    toks = docs.select(F.col(id_col).alias("doc"), F.explode(words_expr(text_col)).alias("tok"))
    tf = toks.groupBy("doc", "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    from pyspark.sql import Window as W

    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "weight",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("doc").orderBy(F.desc("weight"), F.asc("tok"))
    )
    return (
        scored.withColumn("rank", rk)
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("doc").alias(id_col), "rank", "tok", "tf", "df", "n_docs", "weight"
        )
    )


def bpe_train(
    docs: DataFrame, text_col: str = "text", n_merges: int = 4, batch_k: int = 64
) -> DataFrame:
    """Iterative BPE VOCABULARY TRAINING — the full merge loop, not just
    the first iteration's statistic (:func:`bpe_pair_counts`): learn
    ``n_merges`` merges over the corpus' word-frequency table exactly as
    Sennrich et al. 2016 describes, distributed end to end.

    Formulation (the scalable one): BPE trains on DISTINCT words with
    counts, so the working table is the vocabulary — sublinear in corpus
    size — and each iteration is (pair count -> argmax -> merge), all
    relational. Words are carried as sentinel-encoded token strings
    ``>t1<>t2<...``; a merge of pair (a, b) is the literal replacement
    ``'>a<>b<' -> '>ab<'``, whose left-to-right non-overlapping
    semantics (Spark ``replace`` == DuckDB ``replace``) IS the greedy
    BPE merge rule, including the '>a<>a<>a<' -> '>aa<>a<' repeat case.
    Words containing the sentinel characters are excluded (none exist
    in the fixtures; a production tokenizer would escape them).

    Scheduling shape: a naive loop is one Spark job + one-row collect
    PER merge — 32k jobs for a real vocabulary.  Each pass here instead
    collects the top-``batch_k`` pairs (ONE bounded job) and applies the
    longest prefix of that list that is PROVABLY the exact sequential
    result, driver-side:

    - a candidate must share no token with an earlier selection (its
      count is then untouched by those merges — replacements are
      token-disjoint), and
    - its count must strictly exceed every count a merge-created pair
      could reach.  A new pair (x, ab) needs the original pair (x, a)
      at each occurrence (and (ab, y) needs (b, y); (ab, ab) needs
      (b, a)), so adjacency counts from the collected list — with the
      K-th count bounding anything uncollected — upper-bound all of
      them.

    The first unsafe candidate ends the pass (sequential order beyond
    it is unknowable without recounting), so exact equivalence to the
    one-merge-per-job loop holds for ANY batch_k (pinned by
    tests/test_operators.py::test_bpe_train_batch_equivalence); jobs
    scheduled drop from O(n_merges) toward O(n_merges / batch).

    Output: one row per learned merge — rank, left, right, merged,
    pair_count (the argmax count at learn time)."""
    if batch_k < 1:
        raise ValueError(f"batch_k ({batch_k}) must be >= 1")
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .filter((F.col("w") != "") & ~F.col("w").rlike("[<>]"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "s",
            F.concat(
                F.lit(">"),
                F.array_join(F.expr("regexp_extract_all(w, '.', 0)"), "<>"),
                F.lit("<"),
            ),
        )
        .select("s", "cnt")
        .localCheckpoint()  # the loop below rewrites s n_merges times
    )
    merges = []
    while len(merges) < n_merges:
        toks = words.select(
            "cnt", F.expr("regexp_extract_all(s, '>([^<>]+)<', 1)").alias("t")
        )
        pairs = toks.select(
            "cnt",
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN "
                    "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS a, t[i] AS b)) "
                    "ELSE array() END"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(batch_k)
            .collect()
        )
        if not top:
            break
        # anything NOT collected has count <= the K-th collected count
        # (0 when the list is complete) — the bound for adjacency pairs
        # we can't see
        unseen = int(top[-1].n) if len(top) == batch_k else 0
        used: set[str] = set()
        bound = 0  # max count any pair created by this pass' merges can reach
        selected = []
        for r in top:
            if len(merges) + len(selected) >= n_merges:
                break
            a, b, n = r.a, r.b, int(r.n)
            if selected and (a in used or b in used or n <= bound):
                break  # first unsafe candidate ends the pass
            selected.append((a, b, n))
            used.update((a, b))
            # pairs created by merging (a, b) — (x, ab), (ab, y),
            # (ab, ab) — each need an original (x, a) / (b, y) / (b, a)
            # occurrence, so their counts are bounded by those originals
            adj = max(
                (int(p.n) for p in top if p.b == a or p.a == b), default=0
            )
            bound = max(bound, adj, unseen)
        col = F.col("s")
        for a, b, n in selected:
            merges.append((len(merges) + 1, a, b, a + b, n))
            # F.lit carries token text natively through py4j — tokens
            # containing quotes/backslashes (don't, it's) never touch
            # SQL literal syntax
            col = F.call_function(
                "replace", col, F.lit(f">{a}<>{b}<"), F.lit(f">{a}{b}<")
            )
        words = words.withColumn("s", col).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count bigint"
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text") -> DataFrame:
    """Tokenize with a LEARNED BPE merge list (:func:`bpe_train`'s
    output, collected as the bounded vocabulary model): words are
    sentinel-encoded and every merge applies in rank order as the same
    greedy literal replacement used during training, so encode is
    train-consistent by construction. Pure map stages + one per-doc
    aggregation — no shuffle beyond the final groupBy(doc_id).

    Output: doc_id, n_words, n_tokens (post-merge), n_chars (pre-merge
    token count — the compression baseline)."""
    s = F.concat(
        F.lit(">"),
        F.array_join(F.expr("regexp_extract_all(w, '.', 0)"), "<>"),
        F.lit("<"),
    )
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
    ).filter((F.col("w") != "") & ~F.col("w").rlike("[<>]")).withColumn("s", s)
    # nested replace expression built from Column ops: F.lit carries
    # token text natively, so quote/backslash tokens can't break parsing
    enc = F.col("s")
    for a, b in merges:
        enc = F.call_function("replace", enc, F.lit(f">{a}<>{b}<"), F.lit(f">{a}{b}<"))
    return (
        words.withColumn("enc", enc)
        .select(
            "doc_id",
            F.size(F.expr("regexp_extract_all(s, '>([^<>]+)<', 1)")).alias("nc"),
            F.size(F.expr("regexp_extract_all(enc, '>([^<>]+)<', 1)")).alias("nt"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
            F.sum("nc").cast("bigint").alias("n_chars"),
        )
    )


def ngram_diversity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document lexical-diversity features: distinct-unigram and
    distinct-bigram ratios (type/token ratio and its bigram analogue).

    The standard cheap template/spam signal in pretraining filters (low
    bigram diversity = boilerplate or keyword stuffing; the Gopher rules
    use the same family of ratios at the n-gram level). Pure built-in
    array expressions — one projection, no shuffle, no UDF: per-doc work
    is O(len) and embarrassingly parallel, so the operator scales with
    the scan. Division happens once per doc in double precision with the
    identical operand order as the DuckDB oracle (t18)."""
    words = words_expr(text_col)
    d = docs.select(F.col("doc_id"), words.alias("w"))
    # consecutive-pair bigrams: zip words[1..n-1] with words[2..n]
    bigrams = F.zip_with(
        F.slice("w", 1, F.greatest(F.size("w") - 1, F.lit(0))),
        F.slice("w", 2, F.greatest(F.size("w") - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    d = d.select(
        "doc_id",
        F.size("w").cast("int").alias("n_tokens"),
        F.size(F.array_distinct("w")).cast("int").alias("n_distinct_tokens"),
        F.size(bigrams).cast("int").alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).cast("int").alias("n_distinct_bigrams"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        (F.col("n_distinct_tokens").cast("double") / F.col("n_tokens").cast("double")).alias("ttr"),
        "n_bigrams",
        "n_distinct_bigrams",
        (
            F.col("n_distinct_bigrams").cast("double")
            / F.nullif(F.col("n_bigrams").cast("double"), F.lit(0.0))
        ).alias("bigram_ttr"),
    )


def url_stats(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host URL statistics: page count, distinct normalized paths,
    and the dedup-relevant distinct-URL count after stripping fragments
    and a trailing slash.

    The first pass of a web-crawl pipeline (host-level quality/spam
    decisions, URL-level exact dedup). Regexes are character-class-only
    (no backrefs/lookaround) so Java regex (Spark) and RE2 (DuckDB)
    agree; the grouping shuffles once on host — at 100 TB this is the
    natural partitioning key and stays skew-safe because each host's
    state is three counters, with AQE/salting available for megasites."""
    host = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/?#]+)", 1)
    nofrag = F.regexp_replace(F.col(url_col), r"#.*$", "")
    norm = F.regexp_replace(nofrag, r"/$", "")
    path = F.regexp_extract(norm, r"^[a-z]+://[^/?#]+(/[^?#]*)?", 1)
    return (
        docs.select(
            host.alias("host"),
            norm.alias("norm_url"),
            path.alias("path"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("norm_url").alias("n_distinct_urls"),
            F.countDistinct("path").alias("n_distinct_paths"),
        )
    )


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text normalization — the first mapper of nearly every
    pretraining pipeline: lowercase, strip characters outside
    [a-z0-9 ], collapse whitespace runs, trim. Emits the normalized
    text's md5 plus before/after size stats so the gate output stays
    small while pinning every byte of the transform. Pure JVM
    expressions (regexp chains with character-class-only patterns that
    Java regex and RE2 evaluate identically); map-only, scales as the
    scan."""
    lowered = F.lower(F.col(text_col))
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    collapsed = F.trim(F.regexp_replace(stripped, "  +", " "))
    return docs.select(
        "doc_id",
        F.length(text_col).cast("int").alias("n_chars_raw"),
        F.length(collapsed).cast("int").alias("n_chars_norm"),
        F.size(F.split(collapsed, " ")).cast("int").alias("n_words_norm"),
        F.md5(collapsed).alias("norm_md5"),
    )


# C4 cleaning thresholds (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning with a Unified Text-to-Text Transformer", §2.2): keep
# lines with a terminal-punctuation character and at least 5 words; drop
# whole pages containing "lorem ipsum" or a curly brace; keep pages with
# at least 3 surviving sentences/lines. (C4's "3 sentences" is applied
# here as 3 surviving lines, its practical proxy on line-split pages.)
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
_C4_LINE_TERMINAL = '[.!?"]$'


def c4_line_filters(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """C4-style line + page filtering as ONE map-only pass.

    Per document: split on newlines, keep lines that end in terminal
    punctuation and have >= C4_MIN_LINE_WORDS words; drop the whole page
    if the raw text contains "lorem ipsum" (case-insensitive) or "{",
    or if fewer than C4_MIN_KEPT_LINES lines survive. Emits per-line and
    per-page audit counters plus ``kept_md5`` (md5 of the retained text,
    NULL for dropped pages) so a gate pins every byte of the transform.

    Scale: pure built-in array expressions (split / filter / array_join)
    inside whole-stage codegen — no shuffle, no UDF, scales as the scan.
    The page verdict and the cleaned text come out of the same pass, so
    a pipeline can fork keep/drop audit streams from one scan."""
    lines = F.split(F.col(text_col), "\n")
    keep_line = lambda ln: (  # noqa: E731 — inline predicate for F.filter
        (F.size(F.split(F.trim(ln), " ")) >= C4_MIN_LINE_WORDS)
        & ln.rlike(_C4_LINE_TERMINAL)
    )
    kept = F.filter(lines, keep_line)
    kept_text = F.array_join(kept, "\n")
    page_ok = (
        ~F.lower(F.col(text_col)).contains("lorem ipsum")
        & ~F.col(text_col).contains("{")
    )
    keep_doc = page_ok & (F.size(kept) >= C4_MIN_KEPT_LINES)
    n_words_kept = F.aggregate(
        kept,
        F.lit(0),
        lambda acc, ln: acc + F.size(F.split(F.trim(ln), " ")),
    )
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept_lines"),
        n_words_kept.cast("int").alias("n_words_kept"),
        keep_doc.alias("keep_doc"),
        F.when(keep_doc, F.md5(kept_text)).alias("kept_md5"),
    )


def langid_pred_expr(text_col: str = "text") -> F.Column:
    """:func:`langid`'s predicted-language decision as ONE Column — the
    fused-pipeline variant: a cleaning job that only needs the verdict
    can filter on this expression inside the same scan as its other
    rules instead of joining the langid operator's output back on
    doc_id (at 100 TB that join is a full extra scan + shuffle). Two
    nested 1-element transforms let-bind the tokenization and the
    marker-count struct, so each runs once per row; the decision CASE
    is bit-for-bit the one langid() emits (pinned by a pytest
    equivalence sweep)."""
    fields = ", ".join(
        f"size(filter(w, x -> x IN ({', '.join(repr(t) for t in LANG_MARKERS[lg])}))) AS {lg}"
        for lg in LANG_MARKERS
    )
    return F.expr(
        f"element_at(transform(array(element_at(transform(array(split(lower({text_col}), ' ')), "
        f"w -> struct({fields})), 1)), m -> "
        "CASE WHEN m.en >= m.es AND m.en >= m.de AND m.en >= m.zh THEN 'en' "
        "WHEN m.es >= m.de AND m.es >= m.zh THEN 'es' "
        "WHEN m.de >= m.zh THEN 'de' ELSE 'zh' END), 1)"
    )


def gopher_keep_expr(text_col: str = "text") -> F.Column:
    """:func:`gopher_quality`'s keep conjunction as ONE Column (fused-
    pipeline variant, same rationale as :func:`langid_pred_expr`).
    Identical fixed-order double arithmetic as the operator so a
    composed oracle still matches bitwise."""
    stop_list = ", ".join(f"'{t}'" for t in STOPWORDS)
    avg = f"cast(length({text_col}) - (m.nw - 1) as double) / cast(m.nw as double)"
    return F.expr(
        f"element_at(transform(array(element_at(transform(array(split(lower({text_col}), ' ')), "
        f"w -> struct(size(w) AS nw, "
        f"size(filter(w, x -> x rlike '[a-z]')) AS na, "
        f"size(array_intersect(array_distinct(w), array({stop_list}))) AS ns)), 1)), m -> "
        f"m.nw >= {GOPHER_MIN_WORDS} AND m.nw <= {GOPHER_MAX_WORDS} "
        f"AND {avg} >= {GOPHER_MIN_AVG_LEN!r} AND {avg} <= {GOPHER_MAX_AVG_LEN!r} "
        f"AND cast(m.na as double) / cast(m.nw as double) >= {GOPHER_MIN_ALPHA_FRAC!r} "
        f"AND m.ns >= {GOPHER_MIN_STOP_HITS}), 1)"
    )


def lm_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_rate: float = 0.5,
    seed: str = "t22",
) -> DataFrame:
    """CCNet-style LM quality bucketing (Wenzek et al. 2020 §4.3): score
    every document with the corpus bigram LM (:func:`bigram_lm`), split
    the corpus into head / middle / tail terciles of predictability,
    and emit the bucket per document — head feeds training, tail gets
    dropped, middle is the borderline pool.

    Exactly CCNet's recipe, including the sampling: tercile THRESHOLDS
    come from a bounded deterministic hash-sample (``sample_rate`` of
    documents via the md5 bucket — identical on every engine/run), so
    the single-group percentile sort window is bounded regardless of
    corpus size; the per-document bucket is then a pure broadcast-
    threshold comparison. Score = sum(bigram corpus count)/n_bigrams —
    one exactly-rounded IEEE division per doc, so comparisons against
    the round(6) thresholds are bit-identical cross-engine. Documents
    with < 2 tokens emit a NULL bucket (no score exists).
    """
    from .profile import exact_percentiles
    from .sampling import BUCKETS, _bucket

    skel = bigram_lm(docs, id_col, text_col)
    scored = skel.withColumn(
        "score",
        F.col("sum_bg_count").cast("double") / F.col("n_bigrams").cast("double"),
    )
    sampled = scored.filter(
        F.col("score").isNotNull()
        & (_bucket(id_col, seed) < F.lit(int(sample_rate * BUCKETS)))
    ).withColumn("_g", F.lit(1))
    thr = exact_percentiles(sampled, "_g", "score", (1 / 3, 2 / 3)).select(
        F.col("p33").alias("t_low"), F.col("p67").alias("t_high")
    )
    out = scored.crossJoin(F.broadcast(thr))
    bucket = (
        F.when(F.col("score").isNull(), F.lit(None).cast("string"))
        .when(F.col("score") >= F.col("t_high"), "head")
        .when(F.col("score") >= F.col("t_low"), "middle")
        .otherwise("tail")
    )
    return out.select(
        id_col, "n_bigrams", "sum_bg_count", "score", "t_low", "t_high",
        bucket.alias("bucket"),
    )


def _cms_bucket(j: int, tok: Column, m_buckets: int, seed: str) -> Column:
    """Row-j counter bucket of a token — the deterministic md5 family
    cms_token_freq and cms_width_curve share (and the DuckDB oracles
    reproduce counter-for-counter)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}{j}:"), tok)), 1, 8), 16, 10
        ).cast("bigint")
        % m_buckets
    )


def _cms_probe(exact: DataFrame, m_buckets: int, k_rows: int, seed: str) -> DataFrame:
    """(tok, exact_n, row, bucket) probe rows for the exact heavy
    hitters — the lookup side both cms_token_freq and cms_width_curve
    aim at the counter table."""
    return exact.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_bucket(j, F.col("tok"), m_buckets, seed).alias("bucket"),
                    )
                    for j in range(k_rows)
                ]
            )
        ).alias("c"),
    ).select(
        "tok", "exact_n", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    )


def _cms_cells(toks: DataFrame, m_buckets: int, k_rows: int, seed: str) -> DataFrame:
    """The k x m counter table: one groupBy over (row, bucket) with
    map-side partial aggregation into at most k*m cells."""
    return (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("row"),
                            _cms_bucket(j, F.col("tok"), m_buckets, seed).alias(
                                "bucket"
                            ),
                        )
                        for j in range(k_rows)
                    ]
                )
            ).alias("c")
        )
        .groupBy("c.row", "c.bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_token_freq(
    docs: DataFrame,
    text_col: str = "text",
    m_buckets: int = 4096,
    k_rows: int = 3,
    top_n: int = 20,
    seed: str = "cms",
) -> DataFrame:
    """Count-min-sketch token frequency estimation, audited against
    exact counts — the bounded-state alternative to a full token
    groupBy when only heavy-hitter frequencies matter (vocabulary
    pruning, stop-list discovery on a 100 TB corpus).

    The sketch is ``k_rows`` x ``m_buckets`` counters; token t's bucket
    in row j is the md5 bucket of "{seed}{j}:t" mod m — the same
    deterministic idiom as the samplers/bloom filter, so an external
    engine reproduces every counter exactly (no engine-internal sketch
    state). Estimate = min over rows of the token's counters; CMS
    guarantees estimate >= true count always (collisions only ADD), and
    the overshoot is bounded by corpus_tokens/m per row w.h.p.

    Returns the ``top_n`` exact heavy hitters with (tok, exact_n,
    cms_est, overestimate_ok). Scale shape: building the sketch is one
    groupBy over (row, bucket) with map-side partial aggregation into
    at most k*m cells — bounded output no matter the corpus; the exact
    side (the audit) is the usual token groupBy + TakeOrdered(top_n).
    Production uses the sketch alone and skips the exact pass; sketches
    from corpus shards merge by cell-wise addition.
    """
    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    )

    cells = _cms_cells(toks, m_buckets, k_rows, seed)
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("tok"))
        .limit(top_n)
    )
    probe = _cms_probe(exact, m_buckets, k_rows, seed)
    return (
        probe.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("n").alias("cms_est"))
        .select(
            "tok",
            "exact_n",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_n")).alias("overestimate_ok"),
        )
    )


def cms_width_curve(
    docs: DataFrame,
    text_col: str = "text",
    widths: tuple[int, ...] = (256, 1024, 4096),
    k_rows: int = 3,
    top_n: int = 20,
    seed: str = "cms",
) -> DataFrame:
    """Count-min-sketch SIZING curve: one row per counter width with
    the measured overcount on the exact heavy hitters (sum, max, mean)
    next to the classic N/m bound — the memory-vs-error table that
    sizes the sketch (and therefore s12's bounded stream state), the
    CMS sibling of the Bloom curve (d21) and the LSH band curves
    (d19/d20).

    ``within_2bound_frac`` is the fraction of probed tokens whose
    overcount stays within 2N/m, compared in EXACT integers
    ((est - exact) * m <= 2N — never a float compare); CMS theory puts
    each row's overcount under 2N/m with probability >= 1/2, so the
    min over k rows should land inside almost always. The exact heavy
    hitters and the token total are width-independent and computed
    once; each width adds one bounded k x m cell aggregate over a fresh
    corpus scan (persisting the token stream at corpus scale would cost
    more than the rescan). Call release_cached on the result after
    consuming it.
    """
    if not widths:
        raise ValueError("widths must be non-empty")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    )
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("tok"))
        .limit(top_n)
        .persist()
    )
    tot = toks.agg(F.count(F.lit(1)).cast("long").alias("total_tokens")).persist()
    out = None
    for m in widths:
        cells = _cms_cells(toks, m, k_rows, seed)
        probe = _cms_probe(exact, m, k_rows, seed)
        per_tok = (
            probe.join(F.broadcast(cells), ["row", "bucket"])
            .groupBy("tok", "exact_n")
            .agg(F.min("n").alias("est"))
            .crossJoin(F.broadcast(tot))
        )
        over = F.col("est") - F.col("exact_n")
        row = per_tok.groupBy("total_tokens").agg(
            F.count(F.lit(1)).cast("int").alias("n_probed"),
            F.sum("exact_n").cast("long").alias("sum_exact"),
            F.sum("est").cast("long").alias("sum_est"),
            F.max(over).cast("long").alias("max_overcount"),
            F.round(
                F.sum(over).cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mean_overcount"),
            F.round(
                F.sum(
                    (over * F.lit(m) <= 2 * F.col("total_tokens")).cast("long")
                ).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("within_2bound_frac"),
        ).select(
            F.lit(m).cast("int").alias("m_buckets"),
            F.col("total_tokens"),
            "n_probed",
            "sum_exact",
            "sum_est",
            "max_overcount",
            "mean_overcount",
            F.round(
                F.col("total_tokens").cast("double") / F.lit(float(m)), 6
            ).alias("bound_n_over_m"),
            "within_2bound_frac",
        )
        out = row if out is None else out.unionByName(row)
    return _track(out, exact, tot)


def _kmv_hash(seed: str) -> Column:
    """Uniform 32-bit md5 hash of a token — the family kmv_ndv and
    kmv_k_curve share (and the DuckDB oracles reproduce)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col("tok"))), 1, 8), 16, 10
    ).cast("bigint")


def _kmv_point(hashes: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """(exact_ndv, kmv_est) at one sketch size: estimate
    (k-1) * 2^32 / h_k from the k-th smallest distinct hash, falling
    back to the exact count when FEWER than k distinct hashes exist
    (the sketch then IS the exact set). Shared by kmv_ndv and
    kmv_k_curve so the estimator/saturation rule has one definition."""
    kth = hashes.orderBy(F.asc("h")).limit(k).agg(
        F.max("h").alias("h_k"), F.count(F.lit(1)).alias("_n")
    )
    est = F.lit(float(k - 1)) * F.lit(float(1 << 32)) / F.col("h_k").cast("double")
    return exact.crossJoin(F.broadcast(kth)).select(
        "exact_ndv",
        F.when(F.col("_n") < k, F.col("exact_ndv").cast("double"))
        .otherwise(est)
        .alias("kmv_est"),
    )


def kmv_k_curve(
    docs: DataFrame,
    text_col: str = "text",
    ks: tuple[int, ...] = (16, 64, 256, 1024),
    seed: str = "kmv",
) -> DataFrame:
    """KMV SIZING curve: the NDV estimate and its relative error per
    sketch size k — the state-vs-accuracy table (theory: std err ~
    1/sqrt(k)) that picks the k for a corpus-scale cardinality pass,
    completing the sketch-sizing family next to Bloom (d21) and CMS
    (t26). Two corpus passes total — the persisted distinct-hash set
    and the exact-NDV AUDIT (production uses the sketch alone and
    skips the audit) — plus len(ks) bounded top-k reads. When fewer
    than k distinct hashes exist the sketch degenerates to the exact
    set (rel_err 0) — the saturation row that tells you the sketch is
    oversized. Call release_cached on the result after consuming it."""
    if not ks:
        raise ValueError("ks must be non-empty")
    toks = docs.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"))
    hashes = toks.select(_kmv_hash(seed).alias("h")).distinct().persist()
    exact = toks.agg(F.countDistinct("tok").alias("exact_ndv")).persist()
    out = None
    for k in ks:
        row = (
            _kmv_point(hashes, exact, k)
            .select(
                F.lit(k).cast("int").alias("k"),
                "exact_ndv",
                "kmv_est",
            )
            .withColumn(
                "rel_err",
                F.abs(F.col("kmv_est") - F.col("exact_ndv").cast("double"))
                / F.col("exact_ndv").cast("double"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return _track(out, hashes, exact)


def kmv_ndv(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 256,
    seed: str = "kmv",
) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002)
    for the corpus vocabulary, audited against the exact NDV — the
    bounded-state cardinality estimator whose whole state (the k
    smallest hashes) an external engine reproduces exactly, same
    discipline as the d17 Bloom filter and t23 count-min sketch.

    Tokens hash to the uniform 32-bit md5 bucket; the estimator is
    (k-1) * 2^32 / h_k where h_k is the k-th smallest DISTINCT hash
    (standard error ~ 1/sqrt(k)). Every arithmetic step is one exact
    integer op or one correctly-rounded IEEE division, so the estimate
    is bit-identical cross-engine. Scale shape: distinct hashes with
    map-side partial agg, then TakeOrdered(k) — k rows per partition
    survive; sketches merge by keeping the k smallest of a union.

    Returns one row: (exact_ndv, kmv_est, rel_err, k).
    """
    toks = docs.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"))
    hashes = toks.select(_kmv_hash(seed).alias("h")).distinct()
    exact = toks.agg(F.countDistinct("tok").alias("exact_ndv"))
    return (
        _kmv_point(hashes, exact, k)
        .select("exact_ndv", "kmv_est", F.lit(k).alias("k"))
        .withColumn(
            "rel_err",
            F.abs(F.col("kmv_est") - F.col("exact_ndv").cast("double"))
            / F.col("exact_ndv").cast("double"),
        )
    )


def token_drift(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Token-distribution drift between two halves of a corpus: the
    ``top_k`` tokens whose frequency differs most between documents
    with even vs odd ids (a deterministic stand-in for before/after
    snapshots or two data sources).

    Drift detection over token distributions is a standard data-quality
    probe for training pipelines (did the crawl change under us?). The
    ranking key is EXACT integer cross-multiplication —
    ``|cnt_a * total_b - cnt_b * total_a|`` — not a floating rate
    difference, so the top-k boundary is bit-deterministic across
    engines (a 1-ulp rate divergence cannot reorder the cut; products
    stay far below 2^63 through sf10 corpus sizes — at larger scales
    promote to decimal).

    Scale shape: explode -> ONE hash agg on token (map-side partial
    combine absorbs hot tokens), a one-row broadcast crossJoin for the
    totals, and a TakeOrdered top-k — no full sort, no second shuffle.

    Output: (tok, cnt_a, cnt_b, diff_num) ordered by drift."""
    toks = df.select(
        (F.col(id_col) % 2).alias("_half"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    cnt = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("_half") == 0, 1).otherwise(0)).cast("long").alias("cnt_a"),
        F.sum(F.when(F.col("_half") == 1, 1).otherwise(0)).cast("long").alias("cnt_b"),
    )
    totals = cnt.agg(
        F.sum("cnt_a").cast("long").alias("_ta"), F.sum("cnt_b").cast("long").alias("_tb")
    )
    return (
        cnt.crossJoin(F.broadcast(totals))  # one-row totals table
        .withColumn(
            "diff_num",
            F.abs(F.col("cnt_a") * F.col("_tb") - F.col("cnt_b") * F.col("_ta")),
        )
        .orderBy(F.desc("diff_num"), "tok")
        .limit(top_k)
        .select("tok", "cnt_a", "cnt_b", "diff_num")
    )


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    precision: int = 6,
) -> DataFrame:
    """Per-document token-level Shannon entropy in bits — the
    information-density quality signal: boilerplate and keyword-stuffed
    pages sit low, natural prose high, so training pipelines screen on
    it alongside the rule-based filters (t02/t21's Gopher/C4 rules).

    Exactness discipline: ``n_tokens``/``n_distinct`` are exact longs;
    the entropy itself is float, computed as the algebraically stable
    ``(ln(n) - sum(c*ln(c))/n) / ln(2)`` in BOTH engines and rounded to
    ``precision`` decimals (the repo's cross-engine float rule — a
    1-ulp libm divergence cannot survive the rounding).

    Scale shape: explode -> ONE (doc, tok) hash agg (map-side combine
    absorbs repeated tokens) -> ONE per-doc agg; both shuffles are on
    keys that shard naturally, no joins, no window.
    """
    toks = df.select(
        id_col,
        lang_col,
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    per_tok = toks.groupBy(id_col, lang_col, "tok").agg(F.count("*").alias("c"))
    n = F.sum("c").cast("double")
    return per_tok.groupBy(id_col, lang_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.round(
            (F.log(n) - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / n)
            / F.log(F.lit(2.0)),
            precision,
        ).alias("entropy_bits"),
    )
