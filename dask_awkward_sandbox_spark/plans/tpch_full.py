"""The remaining 11 TPC-H query shapes (q2 q8 q9 q11 q12 q13 q15 q17
q20 q21 q22), completing all 22 alongside plans/tpch.py's eleven.

These live OUTSIDE the driver's 50-slot gate (registry capped by the
driver) in their own ``TPCH_FULL_QUERIES`` / ``TPCH_FULL_ORACLES``
maps; tests/test_tpch_full.py runs the same Spark-vs-DuckDB
value-parity check over them that the gate applies to registered
slots, at sf0.001 and sf0.01.

The testdata is reduced TPC-H (TESTDATA.md): no partsupp table, and
no l_commitdate/l_receiptdate/l_shipmode, o_comment, c_phone,
p_container columns. Where the official query needs one of those, the
column is replaced by a documented analogue that PRESERVES THE QUERY
SHAPE (the join/subquery/aggregation structure the query exists to
exercise):

- partsupp (q2 q11 q20)  -> derived supply relation: the distinct
  (l_partkey, l_suppkey) pairs seen in lineitem, with
  ps_supplycost := min unit price (extendedprice/quantity, cents) and
  ps_availqty := sum quantity that pair ever shipped;
- commit/receipt lateness (q12 q21) -> ship lag: l_shipdate more
  than 90 days after o_orderdate;
- o_comment exclusion (q13) -> exclude '5-LOW' priority orders;
- c_phone country code (q22) -> c_nationkey;
- p_container/p_brand filters keep whichever of the two columns the
  data carries.

Determinism contract as registry.py: money in integer cents before
summing, derived ratios computed with the same expression both
engines, top-k under a total order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.plans.common import cents, read

QueryFn = Callable[[SparkSession, str], DataFrame]

TPCH_FULL_QUERIES: dict[str, QueryFn] = {}
TPCH_FULL_ORACLES: dict[str, str] = {}


def tpch_query(name: str, oracle: str) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        TPCH_FULL_QUERIES[name] = fn
        TPCH_FULL_ORACLES[name] = oracle
        return fn

    return deco


# the derived supply relation standing in for partsupp (see module
# docstring); unit cost in cents = round(100*ext/qty) — double
# division then round, identical arithmetic both engines
_PARTSUPP_SQL = """
    select l_partkey as ps_partkey, l_suppkey as ps_suppkey,
           min(cast(round(100 * l_extendedprice / l_quantity) as bigint))
               as ps_supplycost_c,
           cast(sum(cast(round(l_quantity * 100) as bigint)) as bigint)
               as ps_availqty_c
    from lineitem group by l_partkey, l_suppkey
"""


def _partsupp(spark, sf_dir) -> DataFrame:
    li = read(spark, sf_dir, "lineitem")
    unit_c = F.round(100 * F.col("l_extendedprice") / F.col("l_quantity")).cast("long")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(unit_c).alias("ps_supplycost_c"),
        F.sum(cents(F.col("l_quantity"))).alias("ps_availqty_c"),
    )


_DISC_U = (
    "cast(round(l_extendedprice*100) as bigint)"
    " * (100 - cast(round(l_discount*100) as bigint))"
)


def _disc_u(prefix: str = "") -> F.Column:
    return cents(F.col(prefix + "l_extendedprice")) * (
        100 - cents(F.col(prefix + "l_discount"))
    )


@tpch_query(
    "q2_min_cost_supplier",
    f"""
    with partsupp as ({_PARTSUPP_SQL})
    select cast(round(s.s_acctbal*100) as bigint) as s_acctbal_c,
           s.s_name, n.n_name, p.p_partkey, ps.ps_supplycost_c
    from part p
    join partsupp ps on ps.ps_partkey = p.p_partkey
    join supplier s on s.s_suppkey = ps.ps_suppkey
    join nation n on n.n_nationkey = s.s_nationkey
    join region r on r.r_regionkey = n.n_regionkey
    where p.p_size = 5 and p.p_type = 'PROMO' and r.r_name = 'EUROPE'
      and ps.ps_supplycost_c = (
        select min(ps2.ps_supplycost_c)
        from partsupp ps2
        join supplier s2 on s2.s_suppkey = ps2.ps_suppkey
        join nation n2 on n2.n_nationkey = s2.s_nationkey
        join region r2 on r2.r_regionkey = n2.n_regionkey
        where ps2.ps_partkey = p.p_partkey and r2.r_name = 'EUROPE')
    order by s_acctbal_c desc, n.n_name, s.s_name, p.p_partkey
    limit 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2, the correlated-min shape: for each qualifying part,
    the EUROPE supplier(s) matching the regional minimum supply cost.
    Spark-first: the correlated scalar subquery becomes a per-partkey
    window MIN over the regional offers — ONE shuffle on partkey, one
    pass, no offers self-join (a groupBy-min joined back would build
    and shuffle the offers subtree twice); the dims
    (supplier/nation/region) broadcast."""
    from pyspark.sql import Window

    ps = _partsupp(spark, sf_dir)
    part = read(spark, sf_dir, "part")
    sup = read(spark, sf_dir, "supplier")
    nat = read(spark, sf_dir, "nation")
    reg = read(spark, sf_dir, "region")
    euro_offers = (
        ps.join(sup, ps.ps_suppkey == sup.s_suppkey)
        .join(nat, F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
    )
    min_w = F.min("ps_supplycost_c").over(Window.partitionBy("ps_partkey"))
    best = euro_offers.withColumn("_min_cost", min_w).filter(
        F.col("ps_supplycost_c") == F.col("_min_cost")
    )
    out = (
        best.join(
            part.filter((F.col("p_size") == 5) & (F.col("p_type") == "PROMO")),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .select(
            cents(F.col("s_acctbal")).alias("s_acctbal_c"),
            "s_name",
            "n_name",
            "p_partkey",
            "ps_supplycost_c",
        )
    )
    return out.orderBy(
        F.col("s_acctbal_c").desc(), "n_name", "s_name", "p_partkey"
    ).limit(100)


@tpch_query(
    "q8_market_share",
    f"""
    with allrev as (
      select cast(year(o.o_orderdate) as bigint) as o_year,
             {_DISC_U.replace('l_', 'l.l_')} as vol_u,
             n2.n_name as supp_nation
      from part p
      join lineitem l on l.l_partkey = p.p_partkey
      join orders o on o.o_orderkey = l.l_orderkey
      join customer c on c.c_custkey = o.o_custkey
      join nation n1 on n1.n_nationkey = c.c_nationkey
      join region r on r.r_regionkey = n1.n_regionkey
      join supplier s on s.s_suppkey = l.l_suppkey
      join nation n2 on n2.n_nationkey = s.s_nationkey
      where r.r_name = 'AMERICA' and p.p_type = 'ECONOMY'
        and o.o_orderdate between timestamp '1996-01-01'
                              and timestamp '1997-12-31')
    select o_year,
           cast(sum(case when supp_nation = 'NATION_3' then vol_u else 0 end)
                as double) / sum(vol_u) as mkt_share
    from allrev group by o_year order by o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share): NATION_3's share of AMERICA's
    ECONOMY-part purchase volume by order year. Scale: lineitem is
    the only big fact; part/orders prune it via two shuffle joins,
    every dim (supplier, nation x2, region, customer at ~1.5% of
    lineitem) broadcasts under AQE; the share is one tiny agg."""
    li = read(spark, sf_dir, "lineitem")
    part = read(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    cust = read(spark, sf_dir, "customer")
    sup = read(spark, sf_dir, "supplier")
    nat = read(spark, sf_dir, "nation")
    reg = read(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nat.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(reg), F.col("c_rkey") == reg.r_regionkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _disc_u().alias("vol_u"),
            "supp_nation",
        )
    )
    share = rev.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol_u")).otherwise(0)).cast(
                "double"
            )
            / F.sum("vol_u")
        ).alias("mkt_share")
    )
    return share.orderBy("o_year")


@tpch_query(
    "q9_product_type_profit",
    f"""
    select n.n_name as nation, cast(year(o.o_orderdate) as bigint) as o_year,
           cast(sum({_DISC_U.replace('l_', 'l.l_')}) as bigint) as profit_u
    from part p
    join lineitem l on l.l_partkey = p.p_partkey
    join supplier s on s.s_suppkey = l.l_suppkey
    join orders o on o.o_orderkey = l.l_orderkey
    join nation n on n.n_nationkey = s.s_nationkey
    where p.p_name like '%widget%'
    group by n.n_name, year(o.o_orderdate)
    order by nation, o_year desc
    """,
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by supplier nation and
    year). The official profit subtracts ps_supplycost*quantity; the
    reduced schema has no independent supply cost, so profit is the
    discounted revenue term — the join tree (part filters lineitem,
    orders dates it, supplier->nation groups it) is Q9's. Scale: one
    shuffle join lineitem x orders; part and supplier broadcast."""
    li = read(spark, sf_dir, "lineitem")
    part = read(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    sup = read(spark, sf_dir, "supplier")
    orders = read(spark, sf_dir, "orders")
    nat = read(spark, sf_dir, "nation")
    out = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(_disc_u()).alias("profit_u"))
    )
    return out.orderBy("nation", F.col("o_year").desc())


@tpch_query(
    "q11_important_stock",
    f"""
    with partsupp as ({_PARTSUPP_SQL}),
    scoped as (
      select ps.ps_partkey, ps.ps_supplycost_c * ps.ps_availqty_c as value_u
      from partsupp ps
      join supplier s on s.s_suppkey = ps.ps_suppkey
      join nation n on n.n_nationkey = s.s_nationkey
      where n.n_name = 'NATION_8')
    select ps_partkey, cast(sum(value_u) as bigint) as value_u
    from scoped
    group by ps_partkey
    having sum(value_u) > (select sum(value_u) * 0.001 from scoped)
    order by value_u desc, ps_partkey
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 (important stock): parts whose NATION_8 supply value
    exceeds 0.1% of the nation's total — the scalar-subquery-
    threshold shape. Spark-first: the total is a 1-row aggregate
    crossJoin-broadcast against the per-part rollup (no collect);
    value = derived supplycost x availqty, exact int64."""
    ps = _partsupp(spark, sf_dir)
    sup = read(spark, sf_dir, "supplier")
    nat = read(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8")
    scoped = (
        ps.join(sup, ps.ps_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_c") * F.col("ps_availqty_c")).alias("value_u"),
        )
    )
    per_part = scoped.groupBy("ps_partkey").agg(F.sum("value_u").alias("value_u"))
    # the threshold derives from the ROLLUP, not a second pass over
    # the offers: sum of per-part sums == nation total
    total = per_part.agg((F.sum("value_u") * 0.001).alias("_threshold"))
    out = per_part.crossJoin(F.broadcast(total)).filter(
        F.col("value_u") > F.col("_threshold")
    )
    return out.select("ps_partkey", "value_u").orderBy(
        F.col("value_u").desc(), "ps_partkey"
    )


@tpch_query(
    "q12_ship_priority_lag",
    """
    select case when l.l_shipdate > o.o_orderdate + interval 90 day
                then 'late' else 'ontime' end as ship_lag,
           cast(sum(case when o.o_orderpriority in ('1-URGENT', '2-HIGH')
                         then 1 else 0 end) as bigint) as high_line_count,
           cast(sum(case when o.o_orderpriority not in ('1-URGENT', '2-HIGH')
                         then 1 else 0 end) as bigint) as low_line_count
    from orders o
    join lineitem l on l.l_orderkey = o.o_orderkey
    where l.l_shipdate >= timestamp '1997-01-01'
      and l.l_shipdate < timestamp '1998-01-01'
    group by 1 order by 1
    """,
)
def q12_ship_priority_lag(spark, sf_dir):
    """TPC-H Q12 shape (shipping-mode priority counts). The reduced
    schema has no l_shipmode/commit/receipt dates, so the two-valued
    grouping column is ship lag (shipped >90 days after order) and
    lateness needs no receipt date — the orders x lineitem join with
    dual conditional counts is Q12's. Scale: one shuffle join, both
    sides date-pruned at the scan."""
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = read(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lag = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 90 days"),
        F.lit("late"),
    ).otherwise(F.lit("ontime"))
    out = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(lag.alias("ship_lag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )
    return out.orderBy("ship_lag")


@tpch_query(
    "q13_customer_distribution",
    """
    select c_count, cast(count(*) as bigint) as custdist
    from (select c.c_custkey, cast(count(o.o_orderkey) as bigint) as c_count
          from customer c
          left join orders o on o.o_custkey = c.c_custkey
                            and o.o_orderpriority <> '5-LOW'
          group by c.c_custkey)
    group by c_count
    order by custdist desc, c_count desc
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution), the left-join +
    double-aggregation shape; the o_comment NOT LIKE exclusion becomes
    an o_orderpriority exclusion (no comment column). Scale: one
    shuffle join on custkey (both sides), then a tiny histogram agg;
    customers with zero surviving orders are KEPT by the left join —
    the bucket the query exists to count."""
    cust = read(spark, sf_dir, "customer")
    orders = read(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@tpch_query(
    "q15_top_supplier",
    f"""
    with revenue as (
      select l_suppkey as supplier_no,
             cast(sum({_DISC_U}) as bigint) as total_revenue_u
      from lineitem
      where l_shipdate >= timestamp '1997-01-01'
        and l_shipdate < timestamp '1997-04-01'
      group by l_suppkey)
    select s.s_suppkey, s.s_name, r.total_revenue_u
    from supplier s
    join revenue r on r.supplier_no = s.s_suppkey
    where r.total_revenue_u = (select max(total_revenue_u) from revenue)
    order by s.s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): the view + correlated-max shape.
    Spark-first: the revenue "view" is a date-pruned aggregate, its
    max a 1-row broadcast joined back — no second scan of lineitem,
    no collect. Ties all surface (exact int64 revenue)."""
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_u()).alias("total_revenue_u")
    )
    mx = revenue.agg(F.max("total_revenue_u").alias("_mx"))
    sup = read(spark, sf_dir, "supplier")
    out = (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue_u") == F.col("_mx"))
        .join(sup, F.col("supplier_no") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_u")
    )
    return out.orderBy("s_suppkey")


@tpch_query(
    "q17_small_quantity_revenue",
    """
    select cast(sum(cast(round(l.l_extendedprice*100) as bigint)) as double)
               / 7.0 as avg_yearly_u
    from lineitem l
    join part p on p.p_partkey = l.l_partkey
    where p.p_brand = 'Brand#23'
      and l.l_quantity * 5 < (
        select sum(l2.l_quantity) from lineitem l2
        where l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): the correlated
    average shape — lineitems under 20% of their part's average
    quantity. qty*5 < sum(qty) is the exact-arithmetic form of
    qty < 0.2*avg (avoids a division both engines would have to
    round identically). Spark-first: per-part sums join back; the
    part filter prunes first and joins UNHINTED (part scales with
    SF — AQE broadcasts only while it fits). One row out."""
    li = read(spark, sf_dir, "lineitem")
    part = read(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("l_quantity").alias("_sum_qty")
    )
    out = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") * 5 < F.col("_sum_qty"))
        .agg(
            (F.sum(cents(F.col("l_extendedprice"))).cast("double") / 7.0).alias(
                "avg_yearly_u"
            )
        )
    )
    return out


@tpch_query(
    "q20_potential_promotion",
    f"""
    with partsupp as ({_PARTSUPP_SQL})
    select s.s_name, n.n_name
    from supplier s
    join nation n on n.n_nationkey = s.s_nationkey
    where n.n_name in ('NATION_1', 'NATION_2')
      and s.s_suppkey in (
        select ps.ps_suppkey from partsupp ps
        where ps.ps_partkey in (
            select p_partkey from part where p_name like 'small%')
          and ps.ps_availqty_c > (
            select 0.5 * sum(cast(round(l.l_quantity*100) as bigint))
            from lineitem l
            where l.l_partkey = ps.ps_partkey and l.l_suppkey = ps.ps_suppkey
              and l.l_shipdate >= timestamp '1997-01-01'
              and l.l_shipdate < timestamp '1998-01-01'))
    order by s.s_name
    """,
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 (potential part promotion): the nested IN-subquery
    shape — suppliers holding more than half a year's shipments of
    'small%' parts. Spark-first: each IN becomes a left-semi join;
    the correlated half-year sum is a pre-aggregated frame joined on
    (partkey, suppkey) — no correlated execution, three semi joins.
    Scale: lineitem aggregates once per (part, supp); everything
    after is supplier-sized."""
    ps = _partsupp(spark, sf_dir)
    part = read(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    half_year = li.groupBy(
        F.col("l_partkey").alias("_pk"), F.col("l_suppkey").alias("_sk")
    ).agg((0.5 * F.sum(cents(F.col("l_quantity")))).alias("_half_qty_c"))
    qualifying = (
        ps.join(
            part.select("p_partkey"), ps.ps_partkey == F.col("p_partkey"), "left_semi"
        )
        .join(
            half_year,
            (ps.ps_partkey == F.col("_pk")) & (ps.ps_suppkey == F.col("_sk")),
        )
        .filter(F.col("ps_availqty_c") > F.col("_half_qty_c"))
        .select("ps_suppkey")
    )
    sup = read(spark, sf_dir, "supplier")
    nat = read(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    out = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(qualifying, sup.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )
    return out.orderBy("s_name")


@tpch_query(
    "q21_waiting_supplier",
    """
    with lmax as (
      select l_orderkey, max(l_shipdate) as max_ship,
             count(distinct l_suppkey) as n_supps
      from lineitem group by l_orderkey)
    select s.s_name, cast(count(distinct l1.l_orderkey) as bigint) as numwait
    from supplier s
    join lineitem l1 on l1.l_suppkey = s.s_suppkey
    join orders o on o.o_orderkey = l1.l_orderkey
    join lmax on lmax.l_orderkey = l1.l_orderkey
    where o.o_orderstatus = 'F'
      and lmax.n_supps >= 2
      and l1.l_shipdate = lmax.max_ship
      and not exists (
        select 1 from lineitem l3
        where l3.l_orderkey = l1.l_orderkey
          and l3.l_suppkey <> l1.l_suppkey
          and l3.l_shipdate = lmax.max_ship)
    group by s.s_name
    order by numwait desc, s.s_name
    limit 100
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting): the
    exists/not-exists correlated pair. With no receipt/commit dates,
    "kept waiting" means: on a finished multi-supplier order, this
    supplier alone shipped on the order's last ship date. Spark-first:
    BOTH correlated subqueries collapse into per-order window
    aggregates over ONE shuffle on orderkey — max ship date,
    distinct-supplier set size, and last-day distinct-supplier set
    size (collect_set windows: items per order are bounded, so the
    in-window sets are too). No self-joins over lineitem at all; the
    exists/not-exists become row filters (the prior groupBy+join-back
    form measured 2.1s at sf0.1, this one ~1.0s)."""
    from pyspark.sql import Window

    li = read(spark, sf_dir, "lineitem")
    orders = read(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    w = Window.partitionBy("l_orderkey")
    annotated = li.select("l_orderkey", "l_suppkey", "l_shipdate").select(
        "*",
        F.max("l_shipdate").over(w).alias("_max_ship"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("_n_supps"),
    )
    annotated = annotated.withColumn(
        "_n_last_supps",
        F.size(
            F.collect_set(
                F.when(F.col("l_shipdate") == F.col("_max_ship"), F.col("l_suppkey"))
            ).over(w)
        ),
    )
    waiting = (
        annotated.filter(
            (F.col("l_shipdate") == F.col("_max_ship"))
            & (F.col("_n_supps") >= 2)
            & (F.col("_n_last_supps") == 1)
        )
        .join(orders, F.col("l_orderkey") == orders.o_orderkey, "left_semi")
    )
    sup = read(spark, sf_dir, "supplier")
    out = (
        waiting.join(sup, waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )
    return out.orderBy(F.col("numwait").desc(), "s_name").limit(100)


@tpch_query(
    "q22_sales_opportunity",
    """
    with pos as (
      select * from customer
      where c_nationkey % 10 between 1 and 7),
    threshold as (
      select sum(cast(round(c_acctbal*100) as bigint)) as s, count(*) as n
      from pos where c_acctbal > 0.0)
    select cast(c_nationkey % 10 as bigint) as cntrycode,
           cast(count(*) as bigint) as numcust,
           cast(sum(cast(round(c_acctbal*100) as bigint)) as bigint) as totacctbal_c
    from pos, threshold
    where cast(round(c_acctbal*100) as bigint) * threshold.n > threshold.s
      and not exists (
        select 1 from orders o
        where o.o_custkey = pos.c_custkey
          and o.o_orderdate >= timestamp '2000-08-01')
    group by c_nationkey % 10
    order by cntrycode
    """,
)
def q22_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): rich customers with no
    recent orders. Country code = c_nationkey % 10 (no phone column).
    Spark-first: the scalar average broadcasts; the not-exists is a
    left-anti join against date-pruned orders. The avg threshold
    compare is cross-multiplied into exact int64 (bal_c * n > sum_c)
    so no engine-ordered double accumulation can flip a boundary
    customer."""
    cust = read(spark, sf_dir, "customer").filter(
        (F.col("c_nationkey") % 10).between(1, 7)
    )
    thr = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents(F.col("c_acctbal"))).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    recent = read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-08-01"
    )
    out = (
        cust.crossJoin(F.broadcast(thr))
        .filter(cents(F.col("c_acctbal")) * F.col("_n") > F.col("_s"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(cents(F.col("c_acctbal"))).alias("totacctbal_c"),
        )
    )
    return out.orderBy("cntrycode")
