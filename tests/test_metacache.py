"""Unit tests for _metacache.stat_keyed_cache (r13 ADVICE items 1+2):
the decorator is parameterizable (small maxsize for large-entry
caches like the SAS page index) and eviction races from concurrent
maintenance worker threads must not raise."""

import os
import threading

import pytest

from polars_readstat_rs_spark._metacache import stat_keyed_cache


@pytest.fixture()
def files(tmp_path):
    paths = []
    for i in range(12):
        p = tmp_path / f"f{i:02d}.bin"
        p.write_bytes(b"x" * (i + 1))
        paths.append(str(p))
    return paths


def test_maxsize_bounds_entries(files):
    calls = []

    @stat_keyed_cache(maxsize=4)
    def load(path):
        calls.append(path)
        return os.path.getsize(path)

    for p in files:
        assert load(p) == os.path.getsize(p)
    assert len(load._cache) <= 4
    # repeat of the most recent file hits the cache
    n = len(calls)
    load(files[-1])
    assert len(calls) == n


def test_default_form_still_works(files):
    @stat_keyed_cache
    def load(path):
        return os.path.getsize(path)

    assert load(files[0]) == 1
    assert len(load._cache) == 1


def test_sas_page_index_cache_is_small():
    from polars_readstat_rs_spark.formats.sas import parser

    # bound per reused worker: 8 entries x ~6 MB cap, not 64 x 6 MB
    assert parser._page_index_cached.__wrapped__ is not None
    # the cache dict exists and starts bounded — the maxsize closure is
    # not introspectable, so assert behaviorally in test_maxsize above
    assert isinstance(parser._page_index_cached._cache, dict)


def test_concurrent_eviction_does_not_raise(files):
    @stat_keyed_cache(maxsize=2)
    def load(path):
        return os.path.getsize(path)

    errors = []

    def worker(seed):
        try:
            for i in range(300):
                load(files[(seed + i) % len(files)])
        except Exception as e:  # pragma: no cover - the regression
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
