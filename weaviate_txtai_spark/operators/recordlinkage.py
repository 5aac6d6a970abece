"""Fellegi–Sunter probabilistic record linkage scoring.

Fellegi & Sunter 1969 (public knowledge): given candidate record pairs
and per-field agreement indicators, weight each field by how much more
likely agreement is under a match than a non-match —

    w_agree(k)    = log2( m_k / u_k )
    w_disagree(k) = log2( (1−m_k) / (1−u_k) )

with m_k = P(field k agrees | pair is a match) and u_k = P(agrees |
non-match) — and score a pair by the sum of its fields' weights. The
entity-resolution operator every dedup/linkage pipeline runs after
BLOCKING cuts the cross product down to candidate pairs.

This implementation estimates m/u from a LABELED candidate frame (the
supervised variant: a truth column marks known matches — e.g. pairs
sharing a stable key in a re-linkage benchmark, or a hand-labeled
sample). The EM-fitted unsupervised variant shares the scoring half.

Scale shape: ONE 1-row aggregate over the candidate frame collects the
2·K+2 agreement counts (map-side combined; K = number of compared
fields, driver state is K-bounded), the weights become literals, and
scoring is a pure map — no shuffle after the aggregate. Candidate
generation (blocking) is the caller's join and carries the real cost.

Determinism: m/u derive from exact integer counts (identical on any
engine); weights round to 9 dp before scoring so a last-ulp libm
difference in log2 cannot reach the 6-dp score (the pow-key lesson,
NOTES.md); probabilities clamp to [1e-6, 1−1e-6] so degenerate fields
(always/never agreeing) keep finite weights.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fs_weights(
    pairs: DataFrame,
    agree_cols: Sequence[str],
    match_col: str,
    *,
    clamp: float = 1e-6,
    weight_decimals: int = 9,
) -> "dict[str, tuple[float, float]]":
    """Estimate per-field (w_agree, w_disagree) from a labeled candidate
    frame. One 1-row aggregate; returns a K-entry dict."""
    if not agree_cols:
        raise ValueError("fs_weights: no agreement columns")
    aggs = [
        F.sum(F.when(F.col(match_col), 1).otherwise(0)).alias("__nm"),
        F.sum(F.when(~F.col(match_col), 1).otherwise(0)).alias("__nu"),
    ]
    for c in agree_cols:
        aggs.append(
            F.sum(
                F.when(F.col(match_col) & F.col(c), 1).otherwise(0)
            ).alias(f"__am_{c}")
        )
        aggs.append(
            F.sum(
                F.when(~F.col(match_col) & F.col(c), 1).otherwise(0)
            ).alias(f"__au_{c}")
        )
    row = pairs.agg(*aggs).collect()[0]
    nm, nu = row["__nm"] or 0, row["__nu"] or 0
    if nm == 0 or nu == 0:
        raise ValueError(
            f"fs_weights: need both matches and non-matches in the "
            f"labeled frame (got {nm} / {nu})"
        )
    lo, hi = clamp, 1.0 - clamp
    out = {}
    for c in agree_cols:
        m = min(max(row[f"__am_{c}"] / nm, lo), hi)
        u = min(max(row[f"__au_{c}"] / nu, lo), hi)
        out[c] = (
            round(math.log2(m / u), weight_decimals),
            round(math.log2((1 - m) / (1 - u)), weight_decimals),
        )
    return out


def fs_score(
    pairs: DataFrame,
    weights: "dict[str, tuple[float, float]]",
    *,
    out_col: str = "score",
    round_decimals: int = 6,
) -> DataFrame:
    """Append the Fellegi–Sunter match score: Σ per-field agree /
    disagree weights (literals — pure map, no shuffle)."""
    expr = F.lit(0.0)
    for c, (wa, wd) in weights.items():
        expr = expr + F.when(F.col(c), F.lit(wa)).otherwise(F.lit(wd))
    return pairs.withColumn(out_col, F.round(expr, round_decimals))


def fs_weights_blocked(
    a: DataFrame,
    b: DataFrame,
    *,
    a_key: str,
    b_key: str,
    a_block: str,
    b_block: str,
    fields: "dict[str, tuple[str, str]]",
    clamp: float = 1e-6,
    weight_decimals: int = 9,
) -> "dict[str, tuple[float, float]]":
    """:func:`fs_weights` computed WITHOUT enumerating the blocked
    cross product: every count it needs is a marginal, so

    - matched-pair counts come from the key equijoin (|A| rows, not
      |pairs|),
    - the blocked pair total is Σ_blocks cntA·cntB,
    - per-field agreement totals are Σ_{block, value} cntA·cntB
      (count-product joins on the tiny (block, value) domains),

    and non-match agreements are the differences. Identical integer
    counts ⇒ bit-identical weights to the pair-frame estimator (pinned
    in tests), at dimension-table cost instead of pair-expansion cost —
    the "never enumerate pairs for an aggregate" scale rule. NULL field
    values count as disagreement on both paths (equijoins drop them;
    the pair frame's ``=`` yields NULL → falsy).

    ``fields`` maps each output weight name to its (a-column, b-column)
    pair. Returns the same K-entry dict as :func:`fs_weights`.
    """
    if not fields:
        raise ValueError("fs_weights_blocked: no fields")
    ak, bk = F.col(a_key), F.col(b_key)
    m = a.join(
        b, (ak == bk) & (F.col(a_block) == F.col(b_block))
    )
    m_aggs = [F.count(F.lit(1)).alias("__nm")]
    for name, (fa, fb) in fields.items():
        m_aggs.append(
            F.sum(
                F.when(F.col(fa) == F.col(fb), 1).otherwise(0)
            ).alias(f"__am_{name}")
        )
    row_m = m.agg(*m_aggs).collect()[0]
    nm = row_m["__nm"] or 0

    ca = a.groupBy(F.col(a_block).alias("__blk")).agg(
        F.count(F.lit(1)).alias("__ca")
    )
    cb = b.groupBy(F.col(b_block).alias("__blk")).agg(
        F.count(F.lit(1)).alias("__cb")
    )
    # ONE action for the blocked total and every per-field agreement
    # total: tagged 1-row union branches collected together (the
    # previous per-field collect() paid K+1 sequential job barriers —
    # same fix as fs_pattern_counts_blocked, r13 opt)
    frames = [
        ca.join(cb, "__blk")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__t"))
        .select(F.lit("__total").alias("__tag"), "__t")
    ]
    for name, (fa, fb) in fields.items():
        ga = a.groupBy(
            F.col(a_block).alias("__blk"), F.col(fa).alias("__v")
        ).agg(F.count(F.lit(1)).alias("__ca"))
        gb = b.groupBy(
            F.col(b_block).alias("__blk"), F.col(fb).alias("__v")
        ).agg(F.count(F.lit(1)).alias("__cb"))
        frames.append(
            ga.join(gb, ["__blk", "__v"])
            .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__t"))
            .select(F.lit(name).alias("__tag"), "__t")
        )
    allf = frames[0]
    for fr in frames[1:]:
        allf = allf.unionByName(fr)
    totals = {r["__tag"]: int(r["__t"] or 0) for r in allf.collect()}
    total = totals["__total"]
    nu = total - nm
    if nm == 0 or nu == 0:
        raise ValueError(
            f"fs_weights_blocked: need both matches and non-matches "
            f"(got {nm} / {nu})"
        )
    lo, hi = clamp, 1.0 - clamp
    out = {}
    for name, (fa, fb) in fields.items():
        agree = totals[name]
        am = row_m[f"__am_{name}"] or 0
        au = agree - am
        mm = min(max(am / nm, lo), hi)
        uu = min(max(au / nu, lo), hi)
        out[name] = (
            round(math.log2(mm / uu), weight_decimals),
            round(math.log2((1 - mm) / (1 - uu)), weight_decimals),
        )
    return out


def fs_pattern_counts(
    pairs: DataFrame,
    agree_cols: Sequence[str],
) -> "dict[int, int]":
    """Exact agreement-PATTERN counts from an explicit candidate frame:
    one groupBy over the K booleans (≤2^K groups). Returns
    {bitmask: count} with bit i = agree_cols[i] agreeing; NULL
    indicators count as disagreement (COALESCE FALSE), matching the
    blocked marginal path."""
    if not agree_cols:
        raise ValueError("fs_pattern_counts: no agreement columns")
    bit = F.lit(0)
    for i, c in enumerate(agree_cols):
        bit = bit + F.when(
            F.coalesce(F.col(c), F.lit(False)), F.lit(1 << i)
        ).otherwise(F.lit(0))
    rows = (
        pairs.groupBy(bit.alias("__bits"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    return {int(r["__bits"]): int(r["__n"]) for r in rows}


def fs_pattern_counts_blocked(
    a: DataFrame,
    b: DataFrame,
    *,
    a_block: str,
    b_block: str,
    fields: "dict[str, tuple[str, str]]",
) -> "dict[int, int]":
    """Exact agreement-pattern counts over the blocked cross product
    WITHOUT enumerating it — the unsupervised twin of
    :func:`fs_weights_blocked`'s marginal trick.

    For every subset T of the K fields, the at-least-T agreement total
    A_T = Σ_{block, joint T-values} cntA·cntB is a count-product join on
    the tiny (block, values) domain (2^K such aggregates). Möbius
    inversion on the subset lattice then recovers each EXACT pattern
    count: n_S = Σ_{T ⊇ S} (−1)^{|T\\S|} A_T. Identical integers to the
    pair-frame groupBy (pinned in tests) at dimension-table cost; NULL
    field values never equijoin, i.e. count as disagreement on both
    paths. Returns {bitmask: count}, zero-count patterns included.

    The 2^K aggregates each re-scan ``a`` and ``b`` DELIBERATELY
    unpersisted: for direct table projections, 2^K cheap scans beat
    persisting (the measured shared-joint-table pessimization in
    NOTES.md — a row-unique field makes the "reduction" corpus-sized).
    Callers whose ``a``/``b`` carry EXPENSIVE upstream lineage (joins,
    aggregates) should scoped_persist them before calling."""
    names = list(fields)
    if not names:
        raise ValueError("fs_pattern_counts_blocked: no fields")
    K = len(names)
    # ONE action for all 2^K at-least-T totals: each subset's
    # count-product aggregate becomes a tagged 1-row branch of a union,
    # collected together — the branches run as concurrent stages inside
    # a single job, where the previous per-subset collect() paid 2^K
    # SEQUENTIAL barriers of pure scheduler latency (r13 opt; the
    # aggregate work itself is unchanged)
    frames = []
    for tbits in range(1 << K):
        acols = [a_block] + [fields[names[i]][0] for i in range(K)
                             if tbits & (1 << i)]
        bcols = [b_block] + [fields[names[i]][1] for i in range(K)
                             if tbits & (1 << i)]
        ga = a.groupBy(
            *[F.col(c).alias(f"__j{j}") for j, c in enumerate(acols)]
        ).agg(F.count(F.lit(1)).alias("__ca"))
        gb = b.groupBy(
            *[F.col(c).alias(f"__j{j}") for j, c in enumerate(bcols)]
        ).agg(F.count(F.lit(1)).alias("__cb"))
        keys = [f"__j{j}" for j in range(len(acols))]
        frames.append(
            ga.join(gb, keys)
            .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__t"))
            .select(F.lit(tbits).alias("__tbits"), "__t")
        )
    allf = frames[0]
    for fr in frames[1:]:
        allf = allf.unionByName(fr)
    at_least = {int(r["__tbits"]): int(r["__t"] or 0)
                for r in allf.collect()}
    out: dict[int, int] = {}
    for sbits in range(1 << K):
        n = 0
        rest = [i for i in range(K) if not sbits & (1 << i)]
        for extra in range(1 << len(rest)):
            tbits, popc = sbits, 0
            for j, i in enumerate(rest):
                if extra & (1 << j):
                    tbits |= 1 << i
                    popc += 1
            n += (-1 if popc % 2 else 1) * at_least[tbits]
        out[sbits] = n
    return out


def fs_em_fit(
    pattern_counts: "dict[int, int]",
    n_fields: int,
    *,
    n_iter: int = 8,
    scale: int = 10**12,
    p0: "int | None" = None,
    m0: "int | None" = None,
    u0: "int | None" = None,
) -> "dict[str, object]":
    """EM-fitted unsupervised Fellegi–Sunter parameters (Winkler 1988:
    conditional-independence mixture of match/non-match over K binary
    agreement indicators) from the 2^K pattern-count table — the
    domain-sized state the whole corpus reduces to, so the loop is pure
    driver-side arithmetic.

    Fixed-point discipline (the pagerank_exact / pca_power_fit_exact
    pattern): every probability is an INTEGER in units of 1/scale and
    every step is integer multiply + truncating divide on positive
    values (Python ``//`` == SQL ``//`` there), so the trajectory —
    hence the fitted m/u and the weights derived from them — replays
    bit-identically as unrolled SQL CTEs in any engine. E-step products
    rescale after each factor (A ← A·f // scale) to stay within 128-bit
    headroom; M-step ratios clamp to [1, scale−1].

    Returns ``{"p": int, "m": [int]*K, "u": [int]*K, "trajectory":
    [...]}`` (all scaled); ``trajectory`` holds each iteration's params
    for convergence tests."""
    if n_fields < 1:
        raise ValueError("fs_em_fit: need at least one field")
    if n_iter < 1:
        raise ValueError("fs_em_fit: n_iter must be >= 1")
    counts = {
        g: int(pattern_counts.get(g, 0)) for g in range(1 << n_fields)
    }
    if any(v < 0 for v in counts.values()):
        raise ValueError("fs_em_fit: negative pattern count")
    N = sum(counts.values())
    if N == 0:
        raise ValueError("fs_em_fit: empty pattern table")
    sc = int(scale)
    clamp = lambda x: min(max(x, 1), sc - 1)  # noqa: E731
    p = clamp(p0 if p0 is not None else sc // 10)
    m = [clamp(m0 if m0 is not None else 9 * sc // 10)] * n_fields
    u = [clamp(u0 if u0 is not None else sc // 10)] * n_fields
    traj = []
    for _ in range(n_iter):
        S = 0
        sm = [0] * n_fields
        su = [0] * n_fields
        for g, n in counts.items():
            if not n:
                continue
            A = p
            B = sc - p
            for k in range(n_fields):
                if g & (1 << k):
                    A = A * m[k] // sc
                    B = B * u[k] // sc
                else:
                    A = A * (sc - m[k]) // sc
                    B = B * (sc - u[k]) // sc
            w = A * sc // max(A + B, 1)
            S += n * w
            for k in range(n_fields):
                if g & (1 << k):
                    sm[k] += n * w
                    su[k] += n * (sc - w)
        p = clamp(S // N)
        m = [clamp(sm[k] * sc // max(S, 1)) for k in range(n_fields)]
        u = [
            clamp(su[k] * sc // max(N * sc - S, 1))
            for k in range(n_fields)
        ]
        traj.append({"p": p, "m": list(m), "u": list(u)})
    return {"p": p, "m": m, "u": u, "scale": sc, "trajectory": traj}


def fs_em_weights(
    fit: "dict[str, object]",
    names: Sequence[str],
    *,
    weight_decimals: int = 9,
) -> "dict[str, tuple[float, float]]":
    """FS (w_agree, w_disagree) from an :func:`fs_em_fit` result — the
    same 9-dp-rounded log2 shape :func:`fs_weights` emits, so
    :func:`fs_score` / :func:`fs_topk_blocked` consume it unchanged.
    log2 runs on one double ratio of the two exact scaled integers, so
    a last-ulp libm difference dies in the rounding."""
    sc = int(fit["scale"])
    sc_m = [int(x) for x in fit["m"]]
    sc_u = [int(x) for x in fit["u"]]
    out = {}
    for i, name in enumerate(names):
        out[name] = (
            round(math.log2(sc_m[i] / sc_u[i]), weight_decimals),
            round(
                math.log2((sc - sc_m[i]) / (sc - sc_u[i])),
                weight_decimals,
            ),
        )
    return out


def fs_topk_blocked(
    a: DataFrame,
    b: DataFrame,
    weights: "dict[str, tuple[float, float]]",
    k: int,
    *,
    a_key: str,
    b_key: str,
    a_block: str,
    b_block: str,
    fields: "dict[str, tuple[str, str]]",
    out_col: str = "score",
    round_decimals: int = 6,
    enumeration_cap: "int | None" = None,
) -> DataFrame:
    """Top-``k`` Fellegi–Sunter pairs WITHOUT scoring the blocked cross
    product: the FS score is a pure function of the agreement PATTERN,
    so the best pairs live in the best patterns — enumerate patterns in
    descending score order, generate each one's pairs with an equijoin
    ON its agree fields (tiny output for high-agreement patterns), and
    stop as soon as the accumulated candidates cover k, including every
    remaining pattern that TIES the last admitted score (so the global
    tie-break stays exact). A final TakeOrdered over the union
    reproduces the full-enumeration top-k bit-for-bit (pinned in
    tests).

    At 100 TB this is the difference between scoring 10¹² candidate
    pairs and scoring the near-agreeing sliver: the all-agree pattern's
    join output is ≈ the match set, and each dropped agreement grows it
    by one blocking-factor — the disagree-everything floods are never
    touched unless k demands them. ``enumeration_cap`` (rows) guards
    the driver loop's per-pattern count jobs on adversarial inputs.

    Output columns: ``a_key, b_key, <agreement name per field>,
    out_col`` — the same shape ``fs_score`` produces over a pair frame
    built with those names.
    """
    names = list(fields)
    k = int(k)
    if k < 1:
        raise ValueError("fs_topk_blocked: k must be >= 1")
    # pattern scores from the (driver-side literal) weights
    pats = []
    for bits in range(1 << len(names)):
        sc = 0.0
        for i, name in enumerate(names):
            wa, wd = weights[name]
            sc += wa if bits & (1 << i) else wd
        # loop decisions use python rounding; the emitted literal is
        # rounded by SPARK below so the value matches fs_score exactly
        pats.append((round(sc, round_decimals), sc, bits))
    pats.sort(key=lambda t: -t[0])

    def pattern_pairs(bits):
        cond = F.col(a_block) == F.col(b_block)
        for i, name in enumerate(names):
            fa, fb = fields[name]
            if bits & (1 << i):
                cond = cond & (F.col(fa) == F.col(fb))
        cand = a.join(b, cond)
        out_cols = [F.col(a_key), F.col(b_key)]
        for i, name in enumerate(names):
            fa, fb = fields[name]
            if bits & (1 << i):
                out_cols.append(F.lit(True).alias(name))
            else:
                # post-filter the disagreements (NULL-safe: NULL
                # compares are disagreement, matching the pair frame)
                cand = cand.filter(
                    ~F.coalesce(F.col(fa) == F.col(fb), F.lit(False))
                )
                out_cols.append(F.lit(False).alias(name))
        return cand.select(*out_cols)

    chosen, have, last_score = [], 0, None
    for sc, raw, bits in pats:
        if have >= k and sc != last_score:
            break
        pp = pattern_pairs(bits).localCheckpoint(eager=True)
        n = pp.count()
        if enumeration_cap is not None and n > enumeration_cap:
            raise ValueError(
                f"fs_topk_blocked: pattern enumeration exceeded cap "
                f"({n} > {enumeration_cap}); raise k-awareness upstream"
            )
        if n:
            chosen.append(
                pp.withColumn(
                    out_col, F.round(F.lit(raw), round_decimals)
                )
            )
            have += n
            last_score = sc
    if not chosen:
        empty = pattern_pairs(pats[0][2]).withColumn(
            out_col, F.lit(0.0)
        )
        return empty.filter(F.lit(False))
    out = chosen[0]
    for c in chosen[1:]:
        out = out.unionByName(c)
    return out
