"""(path, size, mtime_ns)-keyed caches for file-metadata planning work.

The planning workers Spark launches for ``schema()`` / ``partitions()``
are REUSED processes (observed: the same ``create_data_source`` /
``plan_data_source_read`` workers serve successive queries), and
executor read tasks re-parse the same file header once per partition.
Caching ``read_metadata`` (and the O(file-bytes) SPSS RLE recovery-point
scan) on a stat fingerprint makes every repeat plan/read of an unchanged
file hit a dict instead of the filesystem; replacing the file (new size
or mtime_ns) invalidates naturally — the semantics the session-scoped
parquet DataFrame cache in tables.py already established.

Metadata objects are treated as immutable after construction (the only
attribute writes live inside the ``read_metadata`` builders themselves);
a cached instance is therefore safe to share across queries.
"""

from __future__ import annotations

import os
from functools import wraps

_MAXSIZE = 64


def stat_keyed_cache(fn):
    """Cache ``fn(path, *args, **kwargs)`` keyed by the path's
    (realpath, size, mtime_ns) stat fingerprint plus the remaining
    arguments. FIFO-bounded at 64 entries per function. A path that
    cannot be stat'ed bypasses the cache so the wrapped function raises
    its native error."""
    cache: dict = {}

    @wraps(fn)
    def wrapper(path, *args, **kwargs):
        try:
            real = os.path.realpath(path)
            st = os.stat(real)
        except OSError:
            return fn(path, *args, **kwargs)
        key = (real, st.st_size, st.st_mtime_ns, args, tuple(sorted(kwargs.items())))
        try:
            hit = cache.get(key)
        except TypeError:  # unhashable extra arg — bypass
            return fn(path, *args, **kwargs)
        if hit is not None:
            return hit
        out = fn(path, *args, **kwargs)
        if len(cache) >= _MAXSIZE:
            cache.pop(next(iter(cache)))
        cache[key] = out
        return out

    wrapper._cache = cache  # test/introspection hook
    return wrapper
