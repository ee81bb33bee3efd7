"""Join strategies for skewed keys.

AQE's skew-join splitting (on in session.py) handles most sort-merge
skew at runtime; explicit salting remains the tool when one hot key
dominates an aggregation-after-join or when the skewed side must
stay hash-partitioned. The pattern: explode the small side into
``salts`` replicas, scatter the big side's hot keys across the same
salt space, join on (key, salt) — the hot key's rows land on
``salts`` partitions instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` ⋈ ``small`` on ``key`` with salt-scattered
    partitioning.

    ``big`` gets a random-but-deterministic salt per row (hash of the
    whole row modulo ``salts``); ``small`` is exploded ``salts``-fold
    so every (key, salt) pair finds its match. Correct for any key
    distribution; worth the ``salts``x small-side duplication exactly
    when a hot key would otherwise pin one reducer.

    Only inner and left joins are valid: an outer-preserved SMALL side
    would emit one null-padded row per unmatched salt replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}: the "
            "exploded small side would duplicate its unmatched rows "
            "once per salt under right/full outer semantics"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
    b = big.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<int>"))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")
