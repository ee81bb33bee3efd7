"""TPC-H-style analytics plans — the scale-graded relational surface.

These exercise the engine the way the reference's users exercise
dask-awkward on flat fields: scan → filter → join → aggregate. Scale
design per query is noted in the docstrings; dims broadcast, facts
shuffle once on the aggregation key, aggregates are map-side partial
(Catalyst does this for all algebraic aggs used here).

Money sums use exact integer units computed as LONG sums (not double)
so they remain exact beyond 2**53; at true 100 TB scale the same
queries would switch the unit columns to DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.plans.common import cents, read
from dask_awkward_sandbox_spark.plans.registry import query

# disc_price in units of 1e-4 ("price cents * (100 - discount cents)")
_DISC_PRICE_U = (
    "cast(round(l_extendedprice*100) as bigint) * (100 - cast(round(l_discount*100) as bigint))"
)
_CHARGE_U = f"{_DISC_PRICE_U} * (100 + cast(round(l_tax*100) as bigint))"


def _disc_price_u(df):
    return cents(df["l_extendedprice"]) * (F.lit(100) - cents(df["l_discount"]))


@query(
    "q1_pricing_summary",
    f"""
    select l_returnflag, l_linestatus,
           cast(sum(cast(round(l_quantity*100) as bigint)) as bigint) as sum_qty_c,
           cast(sum(cast(round(l_extendedprice*100) as bigint)) as bigint) as sum_base_c,
           cast(sum({_DISC_PRICE_U}) as bigint) as sum_disc_u,
           cast(sum({_CHARGE_U}) as bigint) as sum_charge_u,
           cast(sum(cast(round(l_quantity*100) as bigint)) as double)
                 / count(*) / 100 as avg_qty,
           cast(count(*) as bigint) as n
    from lineitem
    where l_shipdate <= timestamp '1998-09-02'
    group by l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1. Scale: single scan, predicate pushed to parquet,
    map-side partial agg on a 6-group key — no skew possible."""
    li = read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    qty_c = cents(F.col("l_quantity"))
    base_c = cents(F.col("l_extendedprice"))
    disc_u = _disc_price_u(li)
    charge_u = disc_u * (F.lit(100) + cents(F.col("l_tax")))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty_c).alias("sum_qty_c"),
        F.sum(base_c).alias("sum_base_c"),
        F.sum(disc_u).alias("sum_disc_u"),
        F.sum(charge_u).alias("sum_charge_u"),
        (F.sum(qty_c).cast("double") / F.count(F.lit(1)) / 100).alias("avg_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q3_shipping_priority",
    f"""
    select l.l_orderkey,
           cast(sum({_DISC_PRICE_U.replace('l_', 'l.l_')}) as bigint) as revenue_u,
           strftime(o.o_orderdate, '%Y-%m-%d') as o_orderdate
    from customer c
    join orders o on o.o_custkey = c.c_custkey
    join lineitem l on l.l_orderkey = o.o_orderkey
    where c.c_mktsegment = 'BUILDING'
      and o.o_orderdate < timestamp '1998-06-01'
      and l.l_shipdate > timestamp '1998-06-01'
    group by l.l_orderkey, o.o_orderdate
    order by revenue_u desc, l.l_orderkey asc
    limit 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3. Scale: customer scales with SF, so it carries NO
    broadcast hint — AQE picks BHJ while it fits and demotes to SMJ
    beyond autoBroadcastJoinThreshold (a forced hint would OOM the
    build side at 100 TB); lineitem⋈orders shuffles once on orderkey;
    top-k is a total order (revenue desc, unique orderkey asc)."""
    cut = F.lit("1998-06-01").cast("timestamp")
    c = read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = read(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        c, o["o_custkey"] == c["c_custkey"]
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price_u(j)).alias("revenue_u"))
        .select(
            "l_orderkey",
            "revenue_u",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue_u"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier",
    f"""
    select n.n_name,
           cast(sum({_DISC_PRICE_U.replace('l_', 'l.l_')}) as bigint) as revenue_u
    from region r
    join nation n on n.n_regionkey = r.r_regionkey
    join customer c on c.c_nationkey = n.n_nationkey
    join orders o on o.o_custkey = c.c_custkey
    join lineitem l on l.l_orderkey = o.o_orderkey
    join supplier s on s.s_suppkey = l.l_suppkey and s.s_nationkey = c.c_nationkey
    where r.r_name = 'ASIA'
      and o.o_orderdate >= timestamp '1996-01-01'
      and o.o_orderdate < timestamp '1998-01-01'
    group by n.n_name
    """,
)
def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5. Scale: region/nation keep broadcast hints (fixed 5/25
    rows at every SF); customer/supplier scale with SF so they are
    unhinted — AQE broadcasts them while small and shuffles beyond the
    threshold. Core shuffle is lineitem⋈orders on orderkey + final
    5-group agg."""
    r = read(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = read(spark, sf_dir, "nation")
    c = read(spark, sf_dir, "customer")
    s = read(spark, sf_dir, "supplier")
    o = read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = read(spark, sf_dir, "lineitem")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"]) & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return j.groupBy("n_name").agg(F.sum(_disc_price_u(j)).alias("revenue_u"))


@query(
    "q_top_customers",
    """
    select c.c_custkey, c.c_name,
           cast(sum(cast(round(o.o_totalprice*100) as bigint)) as bigint) as total_c,
           cast(count(*) as bigint) as n_orders
    from orders o join customer c on c.c_custkey = o.o_custkey
    group by c.c_custkey, c.c_name
    order by total_c desc, c_custkey asc
    limit 20
    """,
)
def q_top_customers(spark, sf_dir):
    """Join + agg + deterministic top-k. Scale: aggregate orders FIRST
    (shrinks to one row per customer), then join customer unhinted
    (customer scales with SF; AQE broadcasts only while it fits) —
    never shuffle the pre-agg fact against the dim."""
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(cents(F.col("o_totalprice"))).alias("total_c"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        per_cust.join(c, per_cust["o_custkey"] == c["c_custkey"])
        .select("c_custkey", "c_name", "total_c", "n_orders")
        .orderBy(F.desc("total_c"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q6_forecast_revenue",
    """
    select cast(sum(cast(round(l_extendedprice*100) as bigint)
                    * cast(round(l_discount*100) as bigint)) as bigint) as revenue_u,
           cast(count(*) as bigint) as n
    from lineitem
    where l_shipdate >= timestamp '1997-01-01'
      and l_shipdate <  timestamp '1998-01-01'
      and l_discount between 0.02 and 0.04
      and l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6. Scale: the pure-pushdown query — every predicate
    reaches the parquet row-group reader, so the scan skips whole row
    groups on l_shipdate/l_discount/l_quantity statistics; a single
    global partial-aggregated sum follows."""
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(cents(F.col("l_extendedprice")) * cents(F.col("l_discount"))).alias(
            "revenue_u"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q18_large_orders",
    """
    with t as (select l_orderkey,
                      sum(cast(round(l_quantity*100) as bigint)) as sum_qty_c
               from lineitem group by l_orderkey
               having sum(cast(round(l_quantity*100) as bigint)) > 9000)
    select c.c_name, o.o_custkey, o.o_orderkey,
           cast(o.o_orderdate as timestamp) as o_orderdate,
           cast(round(o.o_totalprice*100) as bigint) as totalprice_c,
           cast(t.sum_qty_c as bigint) as sum_qty_c
    from t
    join orders o on o.o_orderkey = t.l_orderkey
    join customer c on c.c_custkey = o.o_custkey
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 (large-volume customers), nested-style: the having
    filter runs on the per-order nested aggregate BEFORE joining
    orders/customer, so the join input is the small filtered set.
    Scale: one fact shuffle for the groupBy; orders joins on its
    primary key; customer unhinted (SF-scaling side — AQE decides)."""
    li = read(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"))
        .filter(F.col("sum_qty_c") > 9000)
    )
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            cents(F.col("o_totalprice")).alias("totalprice_c"),
            "sum_qty_c",
        )
    )


@query(
    "q10_returned_items",
    f"""
    select c.c_custkey, c.c_name, n.n_name,
           cast(sum({_DISC_PRICE_U}) as bigint) as revenue_u,
           cast(count(*) as bigint) as n_items
    from customer c
    join orders o on o.o_custkey = c.c_custkey
    join lineitem l on l.l_orderkey = o.o_orderkey
    join nation n on n.n_nationkey = c.c_nationkey
    where l.l_returnflag = 'R'
    group by c.c_custkey, c.c_name, n.n_name
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 (returned-item revenue by customer). Scale: the
    returnflag filter pushes to the lineitem scan; lineitem-orders is
    the one fact-fact shuffle join (on orderkey); nation keeps its
    hint (25 rows always); customer is unhinted — it scales with SF,
    so AQE chooses BHJ only while it fits."""
    li = read(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = _disc_price_u(li)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("revenue_u"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "q_money_decimal",
    f"""
    select l_returnflag, l_linestatus,
           cast(cast(sum(cast({_DISC_PRICE_U} as decimal(38,0))) as decimal(38,0))
                as varchar) as sum_disc_dec,
           cast(cast(sum(cast({_CHARGE_U} as decimal(38,0))) as decimal(38,0))
                as varchar) as sum_charge_dec,
           cast(count(*) as bigint) as n
    from lineitem
    where l_shipdate <= timestamp '1998-09-02'
    group by l_returnflag, l_linestatus
    """,
)
def q_money_decimal(spark, sf_dir):
    """Q1's money aggregates carried in DECIMAL(38,0) end-to-end — the
    100 TB money-unit contract. A LONG sum of charge units (price_c *
    (100-disc_c) * (100+tax_c) ~ 1e11/row) overflows 2**63 around 1e8
    rows, i.e. well inside a 100 TB lineitem; the decimal path is
    exact to 38 digits and still map-side partial-aggregated (Spark's
    decimal sum is an algebraic agg, same shuffle shape as the long
    sum). Per-row units stay LONG (exact, cheap); only the sum widens.
    Output serializes the decimals as strings: both engines' pandas
    bridges coerce wide decimals to float64 (lossy past 2^53), so the
    exact comparison must ride a lossless type."""
    li = read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_u = _disc_price_u(li)
    charge_u = disc_u * (F.lit(100) + cents(F.col("l_tax")))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(disc_u.cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("sum_disc_dec"),
        F.sum(charge_u.cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("sum_charge_dec"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q7_volume_shipping",
    f"""
    select sn.n_name as supp_nation, cn.n_name as cust_nation,
           cast(extract(year from l.l_shipdate) as bigint) as l_year,
           cast(sum({_DISC_PRICE_U}) as bigint) as revenue_u
    from lineitem l
    join orders o on o.o_orderkey = l.l_orderkey
    join customer c on c.c_custkey = o.o_custkey
    join supplier s on s.s_suppkey = l.l_suppkey
    join nation sn on sn.n_nationkey = s.s_nationkey
    join nation cn on cn.n_nationkey = c.c_nationkey
    where sn.n_name <> cn.n_name
    group by sn.n_name, cn.n_name, extract(year from l.l_shipdate)
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 (cross-nation shipping volume by year). Scale: one
    fact-fact shuffle (lineitem⋈orders on orderkey); both nation legs
    keep hints (fixed 25 rows); supplier/customer are unhinted
    (SF-scaling — AQE decides); the inequality filter runs after the
    nation joins, never a shuffle of its own."""
    li = read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = read(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    rev = _disc_price_u(li)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(rev).alias("revenue_u"))
    )


# ---------------------------------------------------------------------------
# Extended TPC-H-style surface (q4/q14/q16/q19 shapes), adapted to the
# testdata's columns (no partsupp/commitdate/shipmode). Join-strategy
# plan assertions live in tests/test_tpch_extra.py.
# ---------------------------------------------------------------------------


@query(
    "q4_priority_semi",
    """
    select o_orderpriority, cast(count(*) as bigint) as n_orders
    from orders o
    where o.o_orderdate >= timestamp '1997-01-01'
      and o.o_orderdate <  timestamp '1998-01-01'
      and exists (select 1 from lineitem l
                  where l.l_orderkey = o.o_orderkey and l.l_returnflag = 'R')
    group by o_orderpriority
    """,
)
def q4_priority_semi(spark, sf_dir):
    """TPC-H Q4 shape: order counts by priority for orders having at
    least one returned lineitem — a LEFT SEMI join (exists), which
    Spark executes as a semi hash join on orderkey: the fact shuffles
    once, no row multiplication, no distinct needed."""
    o = read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = read(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    sj = o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
    return sj.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "q14_promo_effect",
    f"""
    select cast(sum(case when p.p_type like 'PROMO%' then {_DISC_PRICE_U} else 0 end)
                as bigint) as promo_u,
           cast(sum({_DISC_PRICE_U}) as bigint) as total_u,
           100.0 * sum(case when p.p_type like 'PROMO%' then {_DISC_PRICE_U} else 0 end)
                 / sum({_DISC_PRICE_U}) as promo_pct
    from lineitem l join part p on p.p_partkey = l.l_partkey
    where l.l_shipdate >= timestamp '1997-09-01'
      and l.l_shipdate <  timestamp '1997-10-01'
    """,
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14: promo revenue share for one ship-month. part scales
    with SF so the join is unhinted (AQE broadcasts it while small);
    the month filter pushes to the lineitem scan. The
    ratio is computed from exact integer unit sums with the same
    expression both engines."""
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = read(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    rev = _disc_price_u(j)
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))
    return j.agg(
        F.sum(promo).alias("promo_u"),
        F.sum(rev).alias("total_u"),
        (F.lit(100.0) * F.sum(promo) / F.sum(rev)).alias("promo_pct"),
    )


@query(
    "q16_supplier_breadth",
    """
    select p.p_brand, substr(p.p_type, 1, 6) as p_type6,
           cast(count(distinct l.l_suppkey) as bigint) as n_suppliers,
           cast(count(*) as bigint) as n_items
    from lineitem l join part p on p.p_partkey = l.l_partkey
    group by p.p_brand, p_type6
    """,
)
def q16_supplier_breadth(spark, sf_dir):
    """TPC-H Q16 shape: distinct suppliers per (brand, type-prefix)
    from the lineitem-part join — exercises count(distinct) (Spark
    expands it to a two-level aggregate: partial distinct per
    partition, then exact merge — no naive row explosion)."""
    li = read(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = read(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", F.substring("p_type", 1, 6).alias("p_type6")
    )
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    return j.groupBy("p_brand", "p_type6").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q19_disjunctive",
    f"""
    select cast(sum({_DISC_PRICE_U}) as bigint) as revenue_u,
           cast(count(*) as bigint) as n
    from lineitem l join part p on p.p_partkey = l.l_partkey
    where (p.p_brand = 'Brand#1' and p.p_size <= 10
           and l.l_quantity between 1 and 20)
       or (p.p_brand = 'Brand#2' and p.p_size <= 20
           and l.l_quantity between 10 and 30)
       or (p.p_brand = 'Brand#3' and p.p_size <= 30
           and l.l_quantity between 20 and 40)
    """,
)
def q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape: revenue under a DISJUNCTION of
    (brand, size-range, qty-range) branches. Catalyst pushes the
    common conjuncts and keeps the OR as one scan predicate — one pass
    over lineitem, part joined unhinted (SF-scaling side; AQE
    decides), no union-of-three-scans."""
    li = read(spark, sf_dir, "lineitem")
    p = read(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (qty >= 1) & (qty <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (qty >= 10) & (qty <= 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (qty >= 20) & (qty <= 40))
    )
    f = j.filter(cond)
    return f.agg(
        F.sum(_disc_price_u(f)).alias("revenue_u"), F.count(F.lit(1)).alias("n")
    )
