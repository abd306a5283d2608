"""Deterministic cache reclamation for the dedup/ANN builders.

The builders cache narrow intermediate frames (signatures, candidate
pairs — ids + hashes, never documents) because the lazy plans they
return read each frame from 2-3 consumers; unpersisting inside a
builder would evict the block before the caller's action runs. That
leaves reclamation to Spark's LRU storage pool — fine for one-shot
jobs, a footgun for long-lived library sessions (round-3 advice).

``scoped_caches`` closes the gap: every internal ``.cache()`` routes
through :func:`cache_df`, which registers the frame with the innermost
active scope; leaving the scope unpersists everything registered in
it. Callers bracket build + action:

    with scoped_caches():
        pairs = minhash_dedup_pairs(docs)
        pairs.write.parquet(out)        # action runs INSIDE the scope
    # here: zero blocks left behind (pytest-pinned)

Without an active scope, ``cache_df`` degrades to plain ``.cache()``
— the documented LRU policy — so nothing changes for existing
callers. Scopes nest (inner frames release first); blocks double-
registered across nested scopes unpersist once (idempotent).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, List

from pyspark.sql import DataFrame

__all__ = ["cache_df", "scoped_caches"]

_STACK: List[List[DataFrame]] = []


def cache_df(df: DataFrame) -> DataFrame:
    """``df.cache()`` + registration with the innermost active
    :func:`scoped_caches` scope (no-op registration outside one)."""
    out = df.cache()
    if _STACK:
        _STACK[-1].append(out)
    return out


@contextmanager
def scoped_caches() -> Iterator[List[DataFrame]]:
    """Unpersist every frame the wrapped code cached via
    :func:`cache_df`, when the block exits (even on error). Blocking
    unpersist is unnecessary: the blocks are unreferenced after the
    caller's action, so async release is safe; tests use the cache-
    manager emptiness check, which reflects the markings immediately."""
    scope: List[DataFrame] = []
    _STACK.append(scope)
    try:
        yield scope
    finally:
        _STACK.pop()
        for df in scope:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
