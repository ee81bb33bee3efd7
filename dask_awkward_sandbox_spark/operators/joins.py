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


def asof_join_skew(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    tolerance=None,
    suffix: str = "_r",
    slice_width: int = 3600,
) -> DataFrame:
    """:func:`asof_join` for HOT by-keys — the two-phase segmented
    scan.

    The union-trick asof is ONE keyed window, so a single dominant
    key (one instrument with 40% of the quotes) pins one reducer: a
    window partition cannot be split by AQE. This variant slices TIME
    into fixed-width buckets (``_slice = floor(on / slice_width)``)
    so the hot key's rows spread across its time slices:

    1. **local**: the carry-forward window runs per ``(by, _slice)``
       — the hot key now occupies many partitions, one per slice;
    2. **boundary**: per ``(by, _slice)`` the last right-side row is
       a struct-max aggregate; a window over the tiny boundary table
       (one row per key x slice, ordered by slice, rows up to -1)
       computes the carry ENTERING each slice — the classic parallel
       prefix-sum boundary pass, driver-free;
    3. **stitch**: join the entering carry back on ``(by, _slice)``
       (the window's partitioning is reused — only the boundary
       table shuffles) and ``coalesce(local, entering)``.

    Same output contract as :func:`asof_join` (backward, right rows
    visible at equal timestamps, ``tolerance`` staleness nulling);
    equal-timestamp right rows resolve by struct-max on (on, payload)
    at slice boundaries, which is a DETERMINISTIC refinement of the
    base version's unspecified tie order. ``on`` must be numeric
    (epoch seconds/micros); pick ``slice_width`` so one key's rows
    per slice fit a task (e.g. an hour of ticks). Cost: the same
    one big shuffle, plus a key x slice-sized boundary pass.
    """
    from pyspark.sql import Window

    by_cols = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in right.columns if c not in {*by_cols, on}]
    overlap = set(payload) & set(left.columns)

    def rname(c: str) -> str:
        return c + suffix if c in overlap or c == on else c

    carried = [rname(c) for c in payload]
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        *by_cols, F.col(on), *[F.col(c).alias(rname(c)) for c in payload]
    ).withColumn("_side", F.lit(0))
    # null-timestamp rows: the base asof's window orders nulls FIRST
    # (asc), so a null-ts left row sees only null-ts right rows and a
    # null-ts right row is visible to everything after it. A null
    # slice would instead fall out of the inner stitch join entirely,
    # silently DROPPING those left rows — so nulls ride a sentinel
    # key that sorts (and slices) before every real timestamp,
    # reproducing the base ordering exactly.
    _SENT = -(2**62)
    k = F.coalesce(F.col(on).cast("long"), F.lit(_SENT))
    allc = l_tag.unionByName(r_tag, allowMissingColumns=True).withColumn(
        "_k", k
    ).withColumn("_slice", F.floor(F.col("_k") / F.lit(slice_width)))

    # 1. local carry, per (by, slice) — the hot key is split by time
    w_local = (
        Window.partitionBy(*by_cols, "_slice")
        .orderBy(F.col("_k").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    right_on = F.when(F.col("_side") == 0, F.col(on))
    filled = allc.select(
        "*",
        F.last(right_on, ignorenulls=True).over(w_local).alias("_l_" + on),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w_local)
            .alias("_l_" + c)
            for c in carried
        ],
    ).filter(F.col("_side") == 1)

    # 2. boundary pass: last right row per (by, slice) -> carry
    # entering each slice. Slices with left-but-no-right rows must
    # appear (null boundary) so the entering carry still reaches them.
    slices = allc.select(*by_cols, "_slice").distinct()
    bnd = (
        allc.filter(F.col("_side") == 0)
        .groupBy(*by_cols, "_slice")
        .agg(
            F.max(
                F.struct(F.col("_k"), F.col(on), *[F.col(c) for c in carried])
            ).alias("_b")
        )
    )
    w_b = (
        Window.partitionBy(*by_cols)
        .orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    entering = slices.join(bnd, [*by_cols, "_slice"], "left").select(
        *by_cols,
        "_slice",
        F.last("_b", ignorenulls=True).over(w_b).alias("_cin"),
    )

    # 3. stitch: local carry wins; else the carry entering the slice
    out = filled.join(entering, [*by_cols, "_slice"]).select(
        *[
            c
            for c in filled.columns
            if not c.startswith("_l_")
            and c not in ("_side", "_slice", "_k", *carried)
        ],
        F.coalesce(F.col("_l_" + on), F.col("_cin." + on)).alias(on + suffix),
        *[
            F.coalesce(F.col("_l_" + c), F.col("_cin." + c)).alias(c)
            for c in carried
        ],
    ).drop("_cin")
    if tolerance is not None:
        stale = F.col(on) - F.col(on + suffix) > F.lit(tolerance)
        for c in [on + suffix, *carried]:
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
