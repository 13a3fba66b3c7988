"""Shared text expressions: tokenization and n-gram shingling.

All expressions are pure `pyspark.sql.functions` (JVM-side, inside
whole-stage codegen) — no Python UDFs in the hot path. The DuckDB oracle
fragments mirroring these live in queries/llm.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words_expr(text_col: str) -> Column:
    """Whitespace tokens of the lowercased text."""
    return F.split(F.lower(F.col(text_col)), " ")


def shingles_expr(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the dedup unit for MinHash/Jaccard).

    The tokenized array is LET-BOUND via a 1-element outer ``transform``
    (its lambda binds ``w`` once per row): higher-order-function lambdas
    are interpreted, so a ``split(...)`` referenced directly inside the
    inner lambda would re-tokenize the document once PER SHINGLE —
    O(words^2) per document. That quadratic hid at sf0.1 (50-word docs)
    and surfaced at the sf10 checkpoint as a 6-minute shingling stage;
    the binding makes it one split per row (measured 3.4x at 150 words,
    growing with length). Results are expression-for-expression
    identical — the DuckDB oracles that replicate shingling are
    unaffected."""
    words = f"split(lower(`{text_col}`), ' ')"
    return F.expr(
        f"element_at(transform(array({words}), w -> "
        f"CASE WHEN size(w) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(w) - {n - 1}), "
        f"i -> concat_ws(' ', slice(w, i, {n})))) "
        f"ELSE array() END), 1)"
    )


def chunk_documents(
    docs, id_col: str = "doc_id", text_col: str = "text",
    chunk_size: int = 64, stride: int = 32,
):
    """Split documents into overlapping fixed-token windows — the
    chunking pass that precedes embedding in a retrieval/training
    pipeline.

    Chunk i covers words [1 + i*stride, 1 + i*stride + chunk_size); the
    last chunk is the first one whose window reaches the document's end
    (partial tail chunks are emitted, empty ones are not). Pure
    explode(transform(sequence(...))) — per-row work bounded by
    doc length, no shuffle at all; output order/ids deterministic.

    Returns (id, chunk_id, chunk_tokens, chunk_text).
    """
    words = f"split(lower({text_col}), ' ')"
    # let-bind the tokenized array (same O(words^2) re-split trap as
    # shingles_expr — see its docstring): `w` is bound once per row,
    # the inner lambda slices the bound array instead of re-splitting
    chunks = F.expr(
        f"element_at(transform(array({words}), w -> "
        f"transform(sequence(0, greatest(0, (size(w) - {chunk_size} + {stride} - 1) div {stride})), "
        f"i -> named_struct("
        f"'chunk_id', cast(i as int), "
        f"'chunk_tokens', least({chunk_size}, size(w) - i * {stride}), "
        f"'chunk_text', concat_ws(' ', slice(w, i * {stride} + 1, {chunk_size}))))), 1)"
    )
    return (
        docs.select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.chunk_tokens").alias("chunk_tokens"),
            F.col("_c.chunk_text").alias("chunk_text"),
        )
    )


def wordpiece_tokenize(
    docs,
    id_col: str,
    text_col: str,
    vocab: list[str],
    max_words: int | None = None,
):
    """Greedy longest-match subword tokenization (WordPiece-style
    inference): each whitespace word is segmented left-to-right, at
    every position taking the LONGEST vocabulary entry that prefixes
    the remainder; a character not starting any entry is emitted as a
    single-character token (char fallback — total, no <unk> state).

    The vocabulary rides to the executors as a broadcast-sized python
    trie inside an Arrow-batched mapInPandas (tokenization is genuinely
    per-character string work — the one place the UDF path earns its
    keep); the 1:N fan-out happens inside each batch, no shuffle, and
    ordering columns (word_idx, tok_idx) make the output deterministic
    under any partitioning. ``max_words`` caps per-doc fan-out.

    Returns (id, word_idx, tok_idx, token).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # prefix trie: maps each vocab entry; walk returns longest match
    trie: dict = {}
    for v in vocab:
        node = trie
        for ch in v:
            node = node.setdefault(ch, {})
        node["$"] = v

    def longest(word: str, pos: int) -> str:
        node, best = trie, None
        for i in range(pos, len(word)):
            node = node.get(word[i])
            if node is None:
                break
            if "$" in node:
                best = node["$"]
        return best if best is not None else word[pos]

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("word_idx", T.IntegerType()),
            T.StructField("tok_idx", T.IntegerType()),
            T.StructField("token", T.StringType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"id": [], "word_idx": [], "tok_idx": [], "token": []}
            for doc_id, text in zip(b["id"], b["text"]):
                words = str(text).lower().split(" ")
                if max_words is not None:
                    words = words[:max_words]
                for wi, w in enumerate(words):
                    pos, ti = 0, 0
                    while pos < len(w):
                        tok = longest(w, pos)
                        rows["id"].append(doc_id)
                        rows["word_idx"].append(wi)
                        rows["tok_idx"].append(ti)
                        rows["token"].append(tok)
                        pos += len(tok)
                        ti += 1
            out = pd.DataFrame(rows)
            for k in ("word_idx", "tok_idx"):
                out[k] = out[k].astype("int32")
            yield out

    return docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(fn, schema)


def hashed_shingles_expr(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles ALREADY hashed to xxhash64 longs,
    built without materializing the shingle strings: the n words hash
    directly via the multi-argument xxhash64, skipping the per-element
    concat_ws allocation that dominated shingle construction at the
    sf10 checkpoint (p06's train-side explode: concat_ws strings 40 s
    vs direct word-triple hashing — see NOTES_r9).

    Equality-preserving vs hashing the joined string (words contain no
    spaces post-split, so the n-tuple determines the shingle), but the
    VALUES differ from xxhash64(concat_ws(' ', ...)): use only where
    the hash is an internal equality key (membership joins, distinct
    counts), never where an oracle replicates hash values. The same
    64-bit collision caveat as all hashed-shingle paths applies."""
    args = ", ".join(f"element_at(w, i + {j})" for j in range(n))
    words = f"split(lower(`{text_col}`), ' ')"
    return F.expr(
        f"element_at(transform(array({words}), w -> "
        f"CASE WHEN size(w) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(w) - {n - 1}), "
        f"i -> xxhash64({args}))) "
        f"ELSE array() END), 1)"
    )
