"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``binary`` columns with
a metadata struct alongside (modality, byte length, checksum). The
Spark-side plumbing — schema, partitioning, Arrow batch shape through
mapInPandas — is real and tested; the actual codec step is stubbed
(image/audio libraries are not in this container) behind
``decode_stub``: a deterministic fake "decoder" so the pipeline shape can
be exercised end-to-end, and ``NotImplementedError`` where a real codec
would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Output schema of the (stub) feature extractor. A real image decoder
# would emit e.g. width/height/channels + a float feature vector; the
# stub derives deterministic values from the payload bytes so tests can
# assert exact results.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_head", T.ArrayType(T.DoubleType())),
    ]
)


def attach_payload(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Wrap a text column as an opaque binary payload + metadata struct —
    the storage shape a multimodal table uses (payload stays opaque to
    Catalyst; metadata columns remain filterable/pushdown-able)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def decode_real(payload: bytes) -> dict:
    """Placeholder for a real codec (PIL / torchaudio / pyav)."""
    raise NotImplementedError(
        "no image/audio codecs in this container — use decode_stub, which "
        "exercises the identical Spark plumbing with a deterministic fake"
    )


def _decode_stub_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: 'features' are byte statistics. The
    Arrow-batched mapInPandas shape is exactly what a real decoder uses."""
    feats = []
    for payload in batch["payload"]:
        b = bytes(payload)
        head = [float(x) for x in b[:4]]
        feats.append((sum(b) / len(b) if b else 0.0, head))
    out = pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "modality": [m["modality"] for m in batch["meta"]],
            "n_bytes": [m["n_bytes"] for m in batch["meta"]],
            "checksum": [m["checksum"] for m in batch["meta"]],
            "feat_mean": [f[0] for f in feats],
            "feat_head": [f[1] for f in feats],
        }
    )
    return out


def decode_features(multimodal: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves the binary batches to the Python workers; partitioning is
    preserved (no shuffle). At 100 TB the payload column dominates I/O, so
    callers should project it away immediately after this step.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _decode_stub_batch(b)

    return multimodal.mapInPandas(fn, DECODED_SCHEMA)


def payload_stats(multimodal: DataFrame) -> DataFrame:
    """Pure-SQL byte-level stats over binary payloads (no Python): length,
    checksum, head bytes in hex — the metadata-extraction fast path."""
    return multimodal.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
        F.hex(F.expr("substring(payload, 1, 8)")).alias("head_hex"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.StringType()),
        T.StructField("frame_len", T.IntegerType()),
    ]
)


def sample_frames(
    multimodal: DataFrame,
    frame_chars: int = 64,
    stride: int = 2,
    max_frames: int = 16,
) -> DataFrame:
    """Frame sampling through mapInPandas — the video-pipeline batch
    shape where one input row fans out to N output rows worker-side
    (a real decoder would pyav-demux and emit every ``stride``-th frame;
    the deterministic stand-in chunks the decoded payload into
    ``frame_chars``-character frames). Partitioning is preserved: the
    fan-out happens inside each Arrow batch, no shuffle, and the
    payload column never crosses an exchange."""
    import math

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                s = bytes(payload).decode("utf-8")
                n_frames = min(math.ceil(len(s) / frame_chars), max_frames)
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(s[i * frame_chars : (i + 1) * frame_chars])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                    "frame_len": pd.array([len(f) for f in frames], dtype="int32"),
                }
            )

    return multimodal.mapInPandas(fn, FRAME_SCHEMA)
