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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: each left row picks up the LATEST right row with
    ``right.on <= left.on`` (backward direction — the
    quote-at-trade-time / dimension-state-at-event-time operator
    Spark has no built-in for).

    Spark-first via the union trick, NOT a range join (a theta-join
    on ``r.ts <= l.ts`` is a nested-loop product): tag and union both
    sides, then one window per ``by`` key ordered by (on, side-rank)
    carries the most recent right-side values forward with
    ``last(..., ignorenulls=True)``. Right rows sort BEFORE left rows
    at equal timestamps, so an exactly-simultaneous right row is
    visible to the left row (pandas merge_asof semantics). ONE shuffle
    on the by-key; at 100 TB this is the same shape as any keyed
    window — salt upstream if one key dominates.

    ``tolerance`` (in ``on``'s units, e.g. seconds for numeric
    timestamps) nulls matches staler than ``left.on - tolerance``.
    Right's payload columns come back suffixed; its ``on`` value
    returns as ``on + suffix`` (also the staleness witness).
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in right.columns if c not in {*by_cols, on}]
    overlap = set(payload) & set(left.columns)

    def rname(c: str) -> str:
        return c + suffix if c in overlap or c == on else c

    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        *by_cols,
        F.col(on),
        *[F.col(c).alias(rname(c)) for c in payload],
    ).withColumn("_side", F.lit(0))
    allc = l_tag.unionByName(r_tag, allowMissingColumns=True)

    from pyspark.sql import Window

    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [rname(c) for c in payload]
    filled = allc.select(
        "*",
        F.last(F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True)
        .over(w)
        .alias(on + suffix),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias("_f_" + c)
            for c in carried
        ],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side", *carried)
    for c in carried:
        out = out.withColumnRenamed("_f_" + c, c)
    if tolerance is not None:
        stale = F.col(on) - F.col(on + suffix) > F.lit(tolerance)
        keep_cols = [on + suffix, *carried]
        for c in keep_cols:
            out = out.withColumn(c, F.when(~F.coalesce(stale, F.lit(True)), F.col(c)))
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    by: str | list[str] | None = None,
    bin_width: int = 1000,
) -> DataFrame:
    """Interval-containment join: left rows against right intervals
    with ``lo <= point <= hi`` (+ optional equi keys).

    Written naively (`l.p between r.lo and r.hi`) Spark plans a
    nested-loop product. The scale path is bin bucketing: points map
    to ``floor(point / bin_width)``, each interval EXPLODES to every
    bin it touches (``sequence(floor(lo/w), floor(hi/w))``), and the
    join becomes an equi-join on (by, bin) with an exact residual
    filter. Candidate work is |right| * avg_interval/bin_width +
    true matches — pick ``bin_width`` near the typical interval
    length. Two shuffles (one per side), no product, AQE-compatible.
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    w = F.lit(bin_width)
    lbin = left.withColumn("_bin", F.floor(F.col(point) / w))
    rbin = right.withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(F.col(lo) / w), F.floor(F.col(hi) / w))),
    )
    out = lbin.join(rbin, [*by_cols, "_bin"]).filter(
        (F.col(point) >= F.col(lo)) & (F.col(point) <= F.col(hi))
    )
    return out.drop("_bin")
