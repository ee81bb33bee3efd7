"""Custom relational operators Spark lacks, exercised end-to-end
under full value oracles: as-of join (operators/joins.py:asof_join,
union-trick, ONE shuffle) against DuckDB's NATIVE ``ASOF JOIN``, and
range join (operators/joins.py:range_join, bin-bucketed interval
containment, product-free) against a plain non-equi join the oracle
can afford at gate scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.operators.joins import (
    asof_join,
    interval_join,
    range_join,
)
from dask_awkward_sandbox_spark.plans.common import read
from dask_awkward_sandbox_spark.plans.registry import query

# staleness cutoff for the asof tolerance leg (seconds): old enough
# that most purchases keep their view, young enough that some are
# nulled — both branches of the tolerance logic execute on testdata
_ASOF_TOL_S = 6 * 3600


@query(
    "q_asof_join",
    f"""
    with l as (select event_id, user_id, cast(floor(epoch(ts)) as bigint) as ts
               from events where event_type = 'purchase'),
         r as (select user_id, cast(floor(epoch(ts)) as bigint) as ts,
                      cast(round(max(value) * 100) as bigint) as view_cents
               from events where event_type = 'view'
               group by user_id, floor(epoch(ts))),
         b as (select l.event_id, l.user_id, l.ts,
                      r.ts as bts, r.view_cents as bvc
               from l asof left join r
               on l.user_id = r.user_id and l.ts >= r.ts),
         f as (select l.event_id, r.ts as fts, r.view_cents as fvc
               from l asof left join r
               on l.user_id = r.user_id and l.ts <= r.ts),
         j as (select b.*, f.fts, f.fvc from b join f using (event_id))
    select event_id, user_id, ts,
           case when ts - bts > {_ASOF_TOL_S} then null else bts end as ts_r,
           case when ts - bts > {_ASOF_TOL_S} then null else bvc end
               as view_cents,
           case when fts - ts > {_ASOF_TOL_S} then null else fts end as fwd_ts_r,
           case when fts - ts > {_ASOF_TOL_S} then null else fvc end
               as fwd_view_cents,
           case when bts is not null and ts - bts <= {_ASOF_TOL_S}
                     and (fts is null or fts - ts > {_ASOF_TOL_S}
                          or ts - bts <= fts - ts)
                then bts
                when fts is not null and fts - ts <= {_ASOF_TOL_S}
                then fts end as near_ts_r,
           case when bts is not null and ts - bts <= {_ASOF_TOL_S}
                     and (fts is null or fts - ts > {_ASOF_TOL_S}
                          or ts - bts <= fts - ts)
                then bvc
                when fts is not null and fts - ts <= {_ASOF_TOL_S}
                then fvc end as near_view_cents
    from j
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join, the quote-at-trade-time operator, ALL THREE
    merge_asof directions under the driver's oracle (r6 — the
    backward-only slot grew fwd/near legs): every purchase event
    picks up the user's LATEST at-or-before view (backward), EARLIEST
    at-or-after view (forward), and the CLOSER of the two with
    exact-distance ties resolving backward (nearest), matches staler
    than 6h nulled on their side's bound. Oracle: DuckDB's NATIVE
    ``ASOF LEFT JOIN`` in both comparison directions, with nearest
    re-derived from the two native results — tolerance-then-pick and
    pick-then-tolerance coincide because the nearer candidate exceeds
    the tolerance only if the farther one does too. Two independent
    implementations (union trick + flipped second window frame vs
    DuckDB's dedicated operator) agreeing row-for-row every round.
    The right side is pre-aggregated to one row per (user, ts) so
    'latest'/'earliest' are deterministic under ties. Scale shape:
    direction='all' emits all three picks off ONE keyed window pass —
    a single Exchange total (plan-asserted in tests/test_joins_props)
    where three separate joins would shuffle five times; no range or
    nested-loop join."""
    ev = read(spark, sf_dir, "events")
    ts_s = F.col("ts").cast("long")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", ts_s.alias("ts")
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", ts_s.alias("ts"), "value")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value") * 100).cast("long").alias("view_cents"))
    )
    return asof_join(
        left, right, on="ts", by="user_id", tolerance=_ASOF_TOL_S,
        direction="all",
    )


@query(
    "q_range_join",
    """
    with iv as (select p_brand,
                       min(p_retailprice) as lo,
                       (3 * min(p_retailprice) + max(p_retailprice)) / 4 as hi
                from part group by p_brand),
         pt as (select l_extendedprice / l_quantity as unit_price from lineitem)
    select iv.p_brand, cast(count(*) as bigint) as n_in_band
    from pt join iv on pt.unit_price >= iv.lo and pt.unit_price <= iv.hi
    group by iv.p_brand
    """,
)
def q_range_join(spark, sf_dir):
    """Interval-containment join: every lineitem's unit price against
    each brand's lower-quartile retail-price band [min, (3*min+max)/4]
    — how many line items priced inside each brand's budget band.
    Spark side is the bin-bucketed range_join (equi-join on the bin +
    exact residual filter — product-free, plan-asserted in
    tests/test_plans.py); the oracle affords the naive non-equi join
    at gate scale. Both engines derive the bands with identical
    double arithmetic, so boundary comparisons agree bit-for-bit."""
    part = read(spark, sf_dir, "part")
    li = read(spark, sf_dir, "lineitem")
    iv = part.groupBy("p_brand").agg(
        F.min("p_retailprice").alias("lo"),
        ((3 * F.min("p_retailprice") + F.max("p_retailprice")) / 4).alias("hi"),
    )
    pt = li.select((F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    joined = range_join(pt, iv, point="unit_price", lo="lo", hi="hi", bin_width=5)
    return joined.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_in_band"))


@query(
    "q_interval_join",
    """
    with e as (select event_id, user_id,
                      cast(floor(epoch(ts)) as bigint) as ts, event_type
               from events),
    l as (select event_id as l_id, user_id, ts as lo, ts + 3600 as hi
          from e where event_type = 'purchase'),
    r as (select event_id as r_id, user_id, ts as lo, ts + 1800 as hi
          from e where event_type = 'view')
    select l.user_id, l.l_id, r.r_id,
           greatest(l.lo, r.lo) as ov_lo, least(l.hi, r.hi) as ov_hi
    from l join r on l.user_id = r.user_id
                 and l.lo <= r.hi and r.lo <= l.hi
    """,
)
def q_interval_join(spark, sf_dir):
    """Interval-OVERLAP join (operators/joins.py interval_join —
    range_join's interval x interval sibling, r6): every purchase's
    1h attribution window against every same-user view's 30min
    activity window; emit each overlapping pair once with its exact
    overlap bounds. Spark side is the bin-bucketed form — both sides
    explode to touched bins, equi-join on (user, bin), exact overlap
    residual, and the EXACTLY-ONCE rule (emit only in the first
    overlap bin) replaces a distinct shuffle with a per-row predicate
    (no-product + dup-free plan-asserted in tests/test_joins_props).
    The oracle affords the naive non-equi join at gate scale; all-int
    columns, no rounding slack."""
    ev = read(spark, sf_dir, "events")
    ts_s = F.col("ts").cast("long")
    l = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("l_id"),
        ts_s.alias("lo"),
        (ts_s + 3600).alias("hi"),
    )
    r = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("r_id"),
        ts_s.alias("lo"),
        (ts_s + 1800).alias("hi"),
    )
    out = interval_join(l, r, by="user_id", bin_width=3600)
    return out.select(
        "user_id", "l_id", "r_id",
        F.greatest(F.col("lo"), F.col("lo_r")).alias("ov_lo"),
        F.least(F.col("hi"), F.col("hi_r")).alias("ov_hi"),
    )
