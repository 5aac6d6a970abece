"""Skyline (Pareto frontier) queries: the rows not dominated by any
other row across a set of minimize/maximize criteria.

Row ``r`` is dominated when some row ``s`` is no worse on EVERY
criterion and strictly better on at least one. The skyline is the set
of non-dominated rows — "cheapest-for-its-size" parts,
"fastest-for-its-cost" suppliers. Duplicate criterion vectors do not
dominate each other; all copies survive (the standard skyline
convention — dominance requires a strict improvement somewhere).

Scale notes
-----------
The naive formulation is a quadratic NOT EXISTS self-join of the full
table — a broadcast nested-loop over N² at corpus scale. This operator
uses the classic two-phase distributed skyline (Börzsönyi 2001
block-nested-loop locally, partition-union globally):

1. **Local prune** (``mapInPandas``, map-only, no shuffle): each
   partition computes its own skyline. Dominance is transitive, so a
   row dominated within its partition is dominated globally — the
   local pass only ever removes true negatives, and the union of local
   skylines is a superset of the answer. Per-partition cost is
   O(n_p · s_p) with s_p the LOCAL skyline size (vectorized numpy
   compare against the kept set), and the surviving fraction is
   tiny for realistically-correlated data (skyline size grows
   ~O(log^(d-1) n) for independent dims).
2. **Global verify**: the pruned candidate set anti-joins itself under
   the dominance predicate with the candidate side ``broadcast`` —
   an O(s²) broadcast nested-loop, but on s ≪ N survivors, not N.
   No single-task bottleneck and no driver collect.

Anti-correlated adversarial data (every row on the frontier) degrades
to the quadratic verify on ~N rows — that is inherent to the skyline
itself being O(N); no algorithm beats its own output size.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dominates(
    a: str, b: str, minimize: Sequence[str], maximize: Sequence[str]
) -> Column:
    """Column predicate: row-alias ``a`` dominates row-alias ``b``."""
    no_worse = [F.col(f"{a}.{c}") <= F.col(f"{b}.{c}") for c in minimize]
    no_worse += [F.col(f"{a}.{c}") >= F.col(f"{b}.{c}") for c in maximize]
    better = [F.col(f"{a}.{c}") < F.col(f"{b}.{c}") for c in minimize]
    better += [F.col(f"{a}.{c}") > F.col(f"{b}.{c}") for c in maximize]
    cond = F.lit(True)
    for p in no_worse:
        cond = cond & p
    strictly = F.lit(False)
    for p in better:
        strictly = strictly | p
    return cond & strictly


def skyline(
    df: DataFrame,
    minimize: Sequence[str] = (),
    maximize: Sequence[str] = (),
) -> DataFrame:
    """All rows of ``df`` not dominated on (minimize ∪ maximize).
    Criterion columns must be non-null numerics; other columns pass
    through untouched."""
    minimize, maximize = list(minimize), list(maximize)
    crit = minimize + maximize
    if not crit:
        raise ValueError("skyline needs at least one criterion column")
    if len(set(crit)) != len(crit):
        raise ValueError(f"criterion listed twice: {crit}")

    import numpy as np

    schema = df.schema
    # numpy view with maximize columns negated -> pure minimization
    signs = [1.0] * len(minimize) + [-1.0] * len(maximize)

    def _local_prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        m = np.column_stack(
            [pdf[c].to_numpy(dtype=np.float64) * s for c, s in zip(crit, signs)]
        )
        # scan in lexicographic order of the minimized view: a row can
        # only be dominated by one sorting BEFORE it (dominance implies
        # lex-<=), so comparing against kept-so-far is complete
        order = np.lexsort(m.T[::-1])
        m = m[order]
        kept_rows: list[int] = []
        kept: np.ndarray | None = None
        for i in range(len(m)):
            r = m[i]
            if kept is not None and bool(
                ((kept <= r).all(axis=1) & (kept < r).any(axis=1)).any()
            ):
                continue
            kept_rows.append(i)
            kept = m[kept_rows]
        yield pdf.iloc[order[kept_rows]]

    candidates = df.mapInPandas(_local_prune, schema=schema)
    # global O(s²) verify on the survivors only. Both join sides derive
    # from `candidates`, so the local prune runs twice — two map-only
    # scans of the source; the broadcast side is column-pruned to the
    # criteria. Callers verifying over an expensive upstream plan
    # should persist/checkpoint it first.
    dom = _dominates("__d", "__c", minimize, maximize)
    return candidates.alias("__c").join(
        F.broadcast(candidates.select(*crit).alias("__d")),
        on=dom,
        how="left_anti",
    )


def skyline_2d(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    n_buckets: "int | None" = None,
) -> DataFrame:
    """2-D specialization of :func:`skyline` maximizing (``x_col``,
    ``y_col``) — pure JVM-side DataFrame ops, no Python workers: a
    point is on the frontier iff its y is the max among its own x AND
    strictly above every y at higher x, so the whole answer is a
    SUFFIX MAX over the x-domain, computed hierarchically (per-x max →
    range-binned bucket max → cross-bucket suffix from the buckets²
    join → within-bucket self-join; ~|x-domain|^1.5 integer work,
    no unpartitioned window). Prefer this for two maximize criteria on
    integer-scalable columns; the general :func:`skyline` handles any
    minimize/maximize mix at mapInPandas cost. Both cast to long
    (pre-scale decimals to integer units). Output: ``id_col, x_col,
    y_col`` for every non-dominated row; equal (x, y) duplicates are
    all kept (dominance needs one strict inequality).

    ``n_buckets=None`` (default) auto-sizes to ⌈√|x-domain|⌉ — the
    optimum of the Σ(size²) within-bucket work, keeping total work at
    ~|x-domain|^1.5 at any scale (a fixed count degrades to quadratic
    when the domain outgrows it). The answer is bucketing-invariant
    (pinned in tests), so the choice affects only the plan."""
    if n_buckets is not None and n_buckets < 1:
        raise ValueError("skyline_2d: n_buckets must be >= 1")
    import math as _math

    from weaviate_txtai_spark.cache import scoped_persist

    # pts feeds both the per-x max AND the final join-back — persist so
    # the caller's upstream aggregate runs once, not twice
    pts = scoped_persist(
        df.select(
            F.col(id_col).alias("__id"),
            F.col(x_col).cast("long").alias("__x"),
            F.col(y_col).cast("long").alias("__y"),
        ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    )

    # eager: computing gx scans every pts partition, so ONE count
    # barrier fills BOTH caches sequentially before the span broadcast
    # build and the downstream consumers fan out over them (r14 opt)
    gx = scoped_persist(
        pts.groupBy("__x").agg(F.max("__y").alias("__ymax")),
        eager=True,
    )
    # auto bucket count ⌈√|x-domain|⌉ as a COLUMN of the same 1-row span
    # aggregate rather than a separate gx.count() action: the count was
    # a full barrier job before any bucketing work could plan (r13 opt).
    # floor(sqrt(n)) in doubles can land one too high at n = k²−1-style
    # boundaries (sqrt rounds up to k); the m−(m·m>n) correction makes
    # it exact isqrt for any int64 n. The answer is bucketing-invariant
    # (pinned in tests), so this only shapes the plan.
    if n_buckets is None:
        nb = F.expr(
            "greatest(1L, cast(floor(sqrt(cast(count(1) as double))) as bigint)"
            " - cast(cast(floor(sqrt(cast(count(1) as double))) as bigint)"
            "        * cast(floor(sqrt(cast(count(1) as double))) as bigint)"
            "        > count(1) as int))"
        ).alias("__nb")
    else:
        nb = F.lit(int(n_buckets)).cast("long").alias("__nb")
    span = gx.agg(
        F.min("__x").alias("__lo"),
        (F.max("__x") - F.min("__x") + 1).alias("__w"),
        nb,
    )
    # eager: bmax, the within self-join sides and the suffix join all
    # fan out over this frame as concurrent stages of one action and
    # raced the lazy fill (r14 opt)
    binned = scoped_persist(
        gx.join(F.broadcast(span)).select(
            "__x",
            "__ymax",
            F.expr("((__x - __lo) * __nb) div __w").alias("__b"),
        ),
        eager=True,
    )
    bmax = binned.groupBy("__b").agg(F.max("__ymax").alias("__bm"))
    hi, lo = bmax.alias("hi"), bmax.alias("lo")
    suffix_b = (
        lo.join(hi, F.col("hi.__b") > F.col("lo.__b"), "left")
        .groupBy(F.col("lo.__b").alias("__b"))
        .agg(F.max(F.col("hi.__bm")).alias("__suf_b"))
    )
    a, c = binned.alias("a"), binned.alias("c")
    within = (
        a.join(
            c,
            (F.col("a.__b") == F.col("c.__b"))
            & (F.col("c.__x") > F.col("a.__x")),
            "left",
        )
        .groupBy(F.col("a.__x").alias("__x"))
        .agg(F.max(F.col("c.__ymax")).alias("__suf_w"))
    )
    suf = (
        binned.join(within, "__x")
        .join(suffix_b, "__b")
        .select(
            "__x",
            "__ymax",
            # greatest() skips NULLs natively (NULL only when BOTH
            # suffix branches are NULL — the max-x point)
            F.greatest("__suf_w", "__suf_b").alias("__suf"),
        )
    )
    frontier_x = suf.filter(
        F.col("__suf").isNull() | (F.col("__suf") < F.col("__ymax"))
    )
    return (
        pts.join(frontier_x, "__x")
        .filter(F.col("__y") == F.col("__ymax"))
        .select(
            F.col("__id").alias(id_col),
            F.col("__x").alias(x_col),
            F.col("__y").alias(y_col),
        )
    )
