"""Deferred third-party imports for planning-path modules.

Spark's Python DataSource API runs ``schema()`` and ``partitions()`` in
short-lived PLANNING workers (``pyspark.sql.worker.create_data_source``
/ ``plan_data_source_read``). Those workers import this package to
unpickle the DataSource, so every module-level ``import numpy`` in the
format parsers is ~90 ms of pure worker overhead on a metadata-only
code path (measured: numpy 89 ms + pyarrow 48 ms of the 165 ms schema
worker; ``read_metadata`` itself is ~1 ms). Decode paths — the only
numpy users — run in long-lived, reused EXECUTOR workers where the
one-time import amortizes across tasks.

``lazy_import`` returns a proxy that imports the real module on first
attribute access and then replaces itself in the owning module's
globals, so steady-state access after the first touch is an ordinary
module attribute lookup (no per-call indirection in decode loops).
"""

from __future__ import annotations

import importlib


class _LazyModule:
    __slots__ = ("_name", "_owner_globals", "_alias")

    def __init__(self, name: str, owner_globals: dict, alias: str):
        self._name = name
        self._owner_globals = owner_globals
        self._alias = alias

    def __getattr__(self, attr: str):
        mod = importlib.import_module(self._name)
        # swap the proxy out of the owner module's namespace — later
        # references bind the real module directly
        self._owner_globals[self._alias] = mod
        return getattr(mod, attr)

    def __repr__(self) -> str:  # pragma: no cover — debugging aid
        return f"<lazy module {self._name!r} (not yet imported)>"


def lazy_import(name: str, owner_globals: dict, alias: str | None = None) -> _LazyModule:
    return _LazyModule(name, owner_globals, alias or name)
