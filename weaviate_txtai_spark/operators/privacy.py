"""Differentially-private count release (Laplace mechanism).

Dwork et al. 2006 (public knowledge): releasing a group-by count with
Laplace(Δ/ε) noise gives ε-differential privacy for sensitivity-Δ
counts. The privacy layer a training-data pipeline needs before
publishing per-source / per-cohort statistics — k-anonymity and
ℓ-diversity (operators/profile.py) suppress rows, the DP release
perturbs aggregates.

Noise here is PSEUDO-random from a Knuth multiplicative hash of an
INTEGER group key (the split_fraction discipline — portable across
engines, unlike xxhash64): with k = (key mod 2³¹),
u = ((k·2654435761 + salt) mod 2³² + 0.5) / 2³² is uniform in (0,1),
and the Laplace inverse CDF

    noise = −b · sign(u − ½) · ln(1 − 2|u − ½|)

maps it to Laplace(b). Determinism is deliberate — it makes the
release REPRODUCIBLE (and the gate oracle-able); the privacy calculus
is identical to a fresh RNG draw as long as the hash seed/key is not
itself released (pass ``salt`` for per-release randomness). ln(0) is
unreachable: the argument clamps at 2⁻³³.

Scale shape: one map-side-combined groupBy; noise is a per-group
projection — nothing beyond the aggregate shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    *,
    key_col: "str | None" = None,
    epsilon: float = 1.0,
    sensitivity: float = 1.0,
    salt: int = 0,
    round_decimals: int = 6,
) -> DataFrame:
    """ε-DP noisy counts per group: ``group_cols…, noisy_count``.

    ``key_col`` (default: the first group column) must be an integer
    column uniquely identifying the group — it seeds the per-group
    noise draw. The true count never leaves the plan; the released
    value is count + Laplace(sensitivity/ε), floored at 0 (counts are
    non-negative by definition; post-processing preserves DP).
    """
    if epsilon <= 0 or sensitivity <= 0:
        raise ValueError("dp_noisy_counts: epsilon/sensitivity must be > 0")
    if not group_cols:
        raise ValueError("dp_noisy_counts: no group columns")
    b = float(sensitivity) / float(epsilon)
    kc = key_col if key_col is not None else group_cols[0]
    # a NULL noise key would NULL the noise and release
    # greatest(NULL, 0) = 0.0 for that group — a silently wrong count
    g = (
        df.filter(F.col(kc).isNotNull())
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    # mod 2^31 BEFORE the multiply keeps the product inside int64
    # under ANSI mode (2^31 · 2654435761 < 2^63)
    k = F.pmod(F.col(kc).cast("long"), F.lit(2147483648))
    u = (
        F.pmod(
            k * F.lit(2654435761) + F.lit(int(salt)), F.lit(4294967296)
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    centered = u - F.lit(0.5)
    mag = F.greatest(
        F.lit(1.0) - F.lit(2.0) * F.abs(centered), F.lit(2.0 ** -33)
    )
    noise = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(mag)
    )
    return g.select(
        *group_cols,
        F.round(
            F.greatest(F.col("__c") + noise, F.lit(0.0)), round_decimals
        ).alias("noisy_count"),
    )
