"""Scoped cache lifetime management.

Several operators cache intermediates they cannot cheaply recompute
(minhash signatures, the symmetric edge set, k-sweep distance tables).
In a short-lived driver/bench session that is fine — the JVM dies with the
caches — but a long-lived session accumulates session-lifetime
InMemoryRelations. ``cache_scope`` gives callers deterministic cleanup
without threading unpersist plumbing through every operator:

    with cache_scope():
        pairs = dedup_minhash_lsh(docs).collect()
    # every cache an operator registered inside the scope is unpersisted

Operators opt in by routing their ``df.cache()`` through
``register_cache(df.cache())`` — outside any scope it is a no-op (the
status quo: caches live until the session ends), inside a scope the frame
records the DataFrame and unpersists it on exit. Scopes nest; each cache
belongs to the innermost open scope. Thread-local, so concurrent driver
threads (e.g. parallel bench entries) do not release each other's caches.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

__all__ = ["cache_scope", "register_cache"]

_local = threading.local()


def _stack() -> list:
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


def register_cache(df: DataFrame) -> DataFrame:
    """Record ``df`` (already cached) in the innermost open cache_scope.

    Returns ``df`` unchanged so it wraps call sites inline:
    ``register_cache(df.cache())``. No-op when no scope is open.
    """
    stack = _stack()
    if stack:
        stack[-1].append(df)
    return df


@contextmanager
def cache_scope():
    """Unpersist every operator-registered cache created inside the block."""
    frame: list[DataFrame] = []
    _stack().append(frame)
    try:
        yield frame
    finally:
        _stack().pop()
        for df in frame:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped / cache already dropped
