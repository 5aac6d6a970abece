"""Cache lifecycle for operator-internal persists (VERDICT r2 item 3).

Several operators persist an intermediate that feeds multiple plan
branches (``jaccard_pairs``'s shingle table, ``minhash_lsh_pairs``'s
per-doc signatures, BM25's query-term hits, the IVF probe fan-out,
``tfidf_top_terms``'s doc-term tf table). They cannot unpersist before
returning: the result is a LAZY DataFrame whose plan still references
the cached table, and the caller materializes it after the operator
returns — unpersisting early would silently recompute the dominant
map-side work once per downstream branch.

``cache_scope`` makes the lifecycle explicit and caller-controlled::

    from weaviate_txtai_spark import cache_scope

    with cache_scope():
        pairs = jaccard_pairs(docs, threshold=0.8).collect()
    # every operator-internal cache created in the scope is released

Scopes nest (inner scope releases only its own caches) and are
per-thread, so concurrent driver threads running independent pipelines
don't release each other's intermediates. Without an active scope the
behavior is unchanged — caches live until ``spark.catalog.clearCache()``
or session end — which is fine for one-shot jobs; long-lived drivers
looping heavy operators should wrap each iteration.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_local = threading.local()


def _stack() -> list:
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


def scoped_persist(df: DataFrame, level=None, *, eager: bool = False) -> DataFrame:
    """persist() that registers the frame with the innermost active
    ``cache_scope`` (if any) for release on scope exit. Operators use
    this instead of bare ``.persist()`` for every internal cache.

    ``eager=True`` additionally runs one ``count()`` so the cache is
    FILLED before the function returns. Use it for every frame that
    feeds two or more branches of ONE downstream action: AQE
    materializes independent query stages (shuffle AND broadcast builds)
    concurrently, and concurrent consumer stages that reference a
    not-yet-filled cache race to compute its partitions — duplicate
    upstream work that GROWS with available task slots (the r13
    regression: part_also_bought 7.5 s on 32 cores vs 1.8 s on 8 on the
    lazy shape, driver BENCH_r13/BENCH_r13_c8). The barrier costs one
    job whose work — filling the cache — was owed anyway; after it every
    consumer reads cached partitions. Leave ``eager=False`` only when a
    SEQUENTIAL action between the persist and the fan-out already
    materializes the frame (e.g. connected_components' fingerprint
    collect, pagerank's edge count)."""
    df = df.persist(level) if level is not None else df.persist()
    st = _stack()
    if st:
        st[-1].append(df)
    if eager:
        df.count()
    return df


@contextmanager
def cache_scope():
    """Release every operator-internal cache created inside the block.

    Yields the (mutable) list of registered DataFrames — mostly useful
    for tests asserting what got cached. Unpersist is non-blocking; a
    frame already unpersisted (or whose session died) is skipped.
    """
    handles: list[DataFrame] = []
    _stack().append(handles)
    try:
        yield handles
    finally:
        _stack().pop()
        for df in handles:
            try:
                df.unpersist()
            except Exception:  # session gone / already released
                pass
