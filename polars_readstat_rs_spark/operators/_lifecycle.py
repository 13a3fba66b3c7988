"""Cached-intermediate lifecycle shared by the operator families.

Dedup / similarity / textstats / graph operators persist intermediates
(inverted indexes, candidate sets, centroid assignments) that outlive
the operator call — the caller must be able to free executor storage
once the result is consumed. The contract: every operator records its
persisted upstream frames on the returned DataFrame via :func:`track`,
and the caller frees them with :func:`release_cached`. This module is
the single home for that contract (it used to live as a private helper
inside dedup.py that three sibling modules imported).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def track(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Record persisted upstream frames on ``result`` for later release.

    Frames are chained: any ``_readstat_cached`` already recorded on the
    result or on an input frame is carried forward, so composed
    operators (e.g. neardup_components over minhash_lsh_pairs) release
    the whole pipeline's storage in one call.
    """
    deps = list(getattr(result, "_readstat_cached", []))
    for c in cached:
        deps.extend(getattr(c, "_readstat_cached", []))
        if c.storageLevel.useMemory or c.storageLevel.useDisk:
            deps.append(c)
    result._readstat_cached = deps
    return result


def release_cached(df: DataFrame) -> None:
    """Unpersist every intermediate an operator cached while building
    ``df``. Call after the result has been consumed — otherwise long
    pipelines accumulate executor storage."""
    for c in getattr(df, "_readstat_cached", []):
        c.unpersist()
    df._readstat_cached = []
