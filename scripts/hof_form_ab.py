"""A/B probe: two-scan vs single-persisted-scan forms of the
re-coupled HOF gate slots (r12, verdict item 5).

The r11 verdict asked each re-coupled slot to compute its sampled
hof_* legs off the slot's FIRST scan instead of a second full table
read. The cache form was built (plans/common.shared_lineitem: one
persisted narrow projection read by both the flat legs and the HOF
twin — persist rather than repartition+ReusedExchange because
per-branch pruning/pushdown breaks canonicalized exchange reuse) and
the full sf1+sf10 panel measured it REGRESSING every re-coupled slot
(q_cartesian_combinations sf10 7.9s -> 22.5s): materializing a
60M-row columnar cache inside the query costs more than the second
vectorized parquet scan it saves. The registered slots keep two
scans; this script reproduces the A/B on demand and its results ride
SCALE_SF10.json's ``hof_form_ab`` block.

Usage: python scripts/hof_form_ab.py [sf_dir ...]
(defaults to .scaledata/sf1 and .scaledata/sf10 when present)

NOTE (r13): the registered donor slots no longer carry the twin legs
at all (relocated to q_parquet_roundtrip, verdict item 7), so this
script now reconstructs the HISTORICAL r12 shapes on both sides of
its A/B — the recorded hof_form_ab evidence stands as the reason the
two-scan form shipped, but the registered slots have moved past it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _cache_form(name, spark, sf_dir):
    """Rebuild the measured-and-rejected single-scan cache variant of
    a re-coupled slot: flat legs and HOF twin over one
    shared_lineitem persist, unhinted leg join (exactly the form the
    r12 panel measured before the revert)."""
    from dask_awkward_sandbox_spark.plans import nested as N
    from dask_awkward_sandbox_spark.plans.common import shared_lineitem

    if name == "q_cartesian_combinations":
        base = shared_lineitem(
            spark, sf_dir,
            ["l_linenumber", "l_quantity", "l_extendedprice",
             "l_discount", "l_tax"],
        )
        qc = F.round(F.col("l_quantity") * 100).cast("long")
        pc = F.round(F.col("l_extendedprice") * 100).cast("long")
        dc = F.round(F.col("l_discount") * 100).cast("long")
        agg = base.groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(qc).alias("sq"),
            F.sum(qc * qc).alias("sqq"),
            F.sum(dc).alias("sd"),
            F.sum(qc * pc).alias("dot"),
            F.sum(pc * (F.lit(100) - dc)).alias("dpu"),
        )
        n, sq, sqq, sd = F.col("n"), F.col("sq"), F.col("sqq"), F.col("sd")
        flat = agg.select(
            "l_orderkey",
            (n * n).alias("n_pairs_cart"),
            (sq * sd).alias("cross_sum"),
            ((n * (n - 1)) / 2).cast("long").alias("n_pairs_comb"),
            ((sq * sq - sqq) / 2).cast("long").alias("pair_sum"),
            F.col("dot").alias("dot_c"),
            F.col("dpu").alias("sum_disc_price_u"),
        )
        hof = N.q_cartesian_combinations_hof(
            spark, sf_dir, where=N._HOF_SAMPLE(), base=base
        ).select(
            "l_orderkey",
            F.col("n_pairs_cart").cast("long").alias("hof_n_pairs_cart"),
            F.col("cross_sum").alias("hof_cross_sum"),
            F.col("n_pairs_comb").cast("long").alias("hof_n_pairs_comb"),
            F.col("pair_sum").alias("hof_pair_sum"),
            F.col("dot_c").alias("hof_dot_c"),
            F.col("sum_disc_price_u").alias("hof_sum_disc_price_u"),
        )
        return flat.join(hof, "l_orderkey", "left")
    raise KeyError(name)


def main() -> None:
    from dask_awkward_sandbox_spark.plans import QUERIES
    from dask_awkward_sandbox_spark.session import get_spark

    dirs = sys.argv[1:] or [
        d for d in ("/root/repo/.scaledata/sf1", "/root/repo/.scaledata/sf10")
        if os.path.isdir(os.path.join(d, "lineitem.parquet"))
    ]
    spark = get_spark("hof-form-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    slot = "q_cartesian_combinations"  # the worst-regressing witness
    for d in dirs:
        tag = d.rstrip("/").rsplit("/", 1)[-1]
        rec: dict[str, float] = {}
        def _two_scan_r12():
            # r13: the registered slot dropped its twin; rebuild the
            # r12 two-scan shape (flat slot + sampled twin join) so
            # the A/B still compares like with like
            from dask_awkward_sandbox_spark.plans import nested as N

            flat = QUERIES[slot](spark, d)
            hof = N.q_cartesian_combinations_hof(
                spark, d, where=N._HOF_SAMPLE()
            ).select(
                "l_orderkey",
                F.col("n_pairs_cart").cast("long").alias("hof_n_pairs_cart"),
                F.col("cross_sum").alias("hof_cross_sum"),
                F.col("n_pairs_comb").cast("long").alias("hof_n_pairs_comb"),
                F.col("pair_sum").alias("hof_pair_sum"),
                F.col("dot_c").alias("hof_dot_c"),
                F.col("sum_disc_price_u").alias("hof_sum_disc_price_u"),
            )
            return flat.join(hof, "l_orderkey", "left")

        for form, build in (
            ("two_scan", _two_scan_r12),
            ("cache", lambda: _cache_form(slot, spark, d)),
        ):
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rec[form] = round(best, 3)
        rec["cache_over_two_scan"] = round(rec["cache"] / rec["two_scan"], 2)
        out[tag] = rec
        print(f"# {slot} {tag}: {rec}", file=sys.stderr)
    print(json.dumps({"slot": slot, "walls": out}))


if __name__ == "__main__":
    main()
