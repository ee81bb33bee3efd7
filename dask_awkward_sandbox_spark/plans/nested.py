"""Nested (awkward-style) structure + reducer queries with DuckDB oracles.

Each query builds the per-order ``items: array<struct>`` nested
collection (plans.common.order_items — the Spark analogue of a
dask-awkward partitioned Array of lists-of-records), applies
structure/reducer operators from ``operators/``, and flattens back to
scalar columns for the oracle comparison. The oracle SQL computes the
same answer relationally — it does NOT mirror the nested mechanics,
which is the point: two independent routes to the same result.

Determinism contract: see plans.registry docstring (integer cents,
identical arithmetic expressions for derived floats).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.operators import reducers as red
from dask_awkward_sandbox_spark.operators import structure as st
from dask_awkward_sandbox_spark.plans.common import cents, fld, fld_map, order_items, read
from dask_awkward_sandbox_spark.plans.registry import query

# SQL fragments for exact integer units (see common.cents).
QC = "cast(round(l_quantity*100) as bigint)"   # quantity cents
PC = "cast(round(l_extendedprice*100) as bigint)"  # price cents
DC = "cast(round(l_discount*100) as bigint)"   # discount cents


def _qty_c(items):
    return fld_map(items, "l_quantity", cents)


def _price_c(items):
    return fld_map(items, "l_extendedprice", cents)


def _disc_c(items):
    return fld_map(items, "l_discount", cents)


# ---------------------------------------------------------------------------
# structure
# ---------------------------------------------------------------------------


@query(
    "q_num",
    f"""
    select l_orderkey,
           cast(count(*) as bigint) as n_items,
           cast(count(case when {QC} > 4500 then 1 end) as bigint) as n_high
    from lineitem group by l_orderkey
    """,
)
def q_num(spark, sf_dir):
    """ak.num: list lengths, plus length after an elementwise filter."""
    it = order_items(spark, sf_dir)
    q = _qty_c(F.col("items"))
    return it.select(
        "l_orderkey",
        st.num(F.col("items")).alias("n_items"),
        st.num(F.filter(q, lambda x: x > 4500)).alias("n_high"),
    )


@query(
    "q_flatten",
    f"""
    select l_orderkey, cast(l_linenumber as bigint) as l_linenumber,
           {QC} as qty_c, {PC} as price_c
    from lineitem
    """,
)
def q_flatten(spark, sf_dir):
    """Build nested then flatten back to rows — lossless roundtrip."""
    it = order_items(spark, sf_dir)
    ex = st.explode_flatten(it, "items", keep=["l_orderkey"])
    return ex.select(
        "l_orderkey",
        F.col("items")["l_linenumber"].cast("long").alias("l_linenumber"),
        cents(F.col("items")["l_quantity"]).alias("qty_c"),
        cents(F.col("items")["l_extendedprice"]).alias("price_c"),
    )


@query(
    "q_firsts",
    f"""
    select l_orderkey, cast(l_linenumber as bigint) as first_ln, {QC} as first_qty_c
    from lineitem
    qualify row_number() over (partition by l_orderkey order by l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus) = 1
    """,
)
def q_firsts(spark, sf_dir):
    """ak.firsts: first element of each list (null-safe via F.get)."""
    it = order_items(spark, sf_dir)
    first = st.firsts(F.col("items"))
    return it.select(
        "l_orderkey",
        first["l_linenumber"].cast("long").alias("first_ln"),
        cents(first["l_quantity"]).alias("first_qty_c"),
    )


@query(
    "q_sort",
    f"""
    select l_orderkey, qty_c from (
      select l_orderkey, {QC} as qty_c,
             row_number() over (partition by l_orderkey
                                order by l_quantity desc, l_linenumber) as rn
      from lineitem) t
    where rn <= 2
    """,
)
def q_sort(spark, sf_dir):
    """ak.sort descending + list slice: top-2 quantities per order."""
    it = order_items(spark, sf_dir, fields=['l_linenumber', 'l_quantity'])
    top2 = F.slice(st.sort(_qty_c(F.col("items")), ascending=False), 1, 2)
    return it.select("l_orderkey", F.explode(top2).alias("qty_c"))


@query(
    "q_argsort",
    f"""
    select l_orderkey,
           cast(l_linenumber as bigint) as min_ln, {QC} as min_qty_c
    from lineitem
    qualify row_number() over (partition by l_orderkey
                               order by l_quantity asc, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus) = 1
    """,
)
def q_argsort(spark, sf_dir):
    """ak.argsort: indices sorting each list; pick the item at the first
    (stable) index and prove it matches SQL's (value, position) order."""
    it = order_items(spark, sf_dir)
    idx = st.argsort(_qty_c(F.col("items")))
    first_item = F.get(F.col("items"), F.get(idx, 0).cast("int"))
    return it.select(
        "l_orderkey",
        first_item["l_linenumber"].cast("long").alias("min_ln"),
        cents(first_item["l_quantity"]).alias("min_qty_c"),
    )


@query(
    "q_zip_unzip",
    f"""
    select l_orderkey, cast(sum({QC} * {PC}) as bigint) as dot_c
    from lineitem group by l_orderkey
    """,
)
def q_zip_unzip(spark, sf_dir):
    """ak.zip + ak.unzip + elementwise product reduce (list dot product)."""
    it = order_items(spark, sf_dir)
    z = st.zip({"q": _qty_c(F.col("items")), "p": _price_c(F.col("items"))})
    itz = it.select("l_orderkey", z.alias("z"))
    qs, ps = st.unzip(F.col("z"), ["q", "p"])
    prod = F.zip_with(qs, ps, lambda a, b: a * b)
    return itz.select("l_orderkey", red.sum(prod).cast("long").alias("dot_c"))


@query(
    "q_cartesian",
    f"""
    select l_orderkey,
           cast(count(*) * count(*) as bigint) as n_pairs,
           cast(sum({QC}) * sum({DC}) as bigint) as cross_sum
    from lineitem group by l_orderkey
    """,
)
def q_cartesian(spark, sf_dir):
    """ak.cartesian of (qty, discount) lists; closed-form oracle
    (sum over all pairs of x_i*y_j == sum(x)*sum(y))."""
    it = order_items(spark, sf_dir)
    pairs = st.cartesian(_qty_c(F.col("items")), _disc_c(F.col("items")))
    return it.select(
        "l_orderkey",
        st.num(pairs).alias("n_pairs"),
        F.aggregate(pairs, F.lit(0.0), lambda a, p: a + p["_0"] * p["_1"])
        .cast("long")
        .alias("cross_sum"),
    )


@query(
    "q_combinations",
    f"""
    with s as (select l_orderkey, count(*) as n,
                      sum({QC}) as sq, sum({QC}*{QC}) as sqq
               from lineitem group by l_orderkey)
    select l_orderkey,
           cast(n*(n-1)/2 as bigint) as n_pairs,
           cast((sq*sq - sqq)/2 as bigint) as pair_sum
    from s
    """,
)
def q_combinations(spark, sf_dir):
    """ak.combinations (n=2): unordered pairs i<j; oracle uses the
    closed form sum_{i<j} x_i x_j = (S^2 - SS)/2."""
    it = order_items(spark, sf_dir, fields=['l_linenumber', 'l_quantity'])
    pairs = st.combinations(_qty_c(F.col("items")))
    return it.select(
        "l_orderkey",
        st.num(pairs).alias("n_pairs"),
        F.aggregate(pairs, F.lit(0.0), lambda a, p: a + p["_0"] * p["_1"])
        .cast("long")
        .alias("pair_sum"),
    )


@query(
    "q_local_index",
    """
    select l_orderkey,
           cast(row_number() over (partition by l_orderkey order by l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus) - 1
                as bigint) as idx,
           cast(l_linenumber as bigint) as ln
    from lineitem
    """,
)
def q_local_index(spark, sf_dir):
    """ak.local_index zipped with a field and flattened."""
    it = order_items(spark, sf_dir)
    z = F.arrays_zip(
        st.local_index(F.col("items")).alias("idx"),
        fld(F.col("items"), "l_linenumber").alias("ln"),
    )
    ex = it.select("l_orderkey", F.explode(z).alias("e"))
    return ex.select(
        "l_orderkey", F.col("e")["idx"].alias("idx"), F.col("e")["ln"].cast("long").alias("ln")
    )


@query(
    "q_run_lengths",
    """
    with seq as (
      select l_orderkey, l_returnflag,
             row_number() over (partition by l_orderkey order by l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus) as rn,
             row_number() over (partition by l_orderkey, l_returnflag
                                order by l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus) as rnf
      from lineitem),
    runs as (
      select l_orderkey, min(rn) as mn, count(*) as c
      from seq group by l_orderkey, l_returnflag, rn - rnf)
    select l_orderkey,
           cast(row_number() over (partition by l_orderkey order by mn) - 1 as bigint) as idx,
           cast(c as bigint) as run_len
    from runs
    """,
)
def q_run_lengths(spark, sf_dir):
    """ak.run_lengths over the returnflag sequence of each order;
    oracle is the classic gaps-and-islands rewrite."""
    it = order_items(spark, sf_dir)
    rl = st.run_lengths(fld(F.col("items"), "l_returnflag"))
    ex = it.select("l_orderkey", F.posexplode(rl).alias("idx", "run_len"))
    return ex.select("l_orderkey", F.col("idx").cast("long").alias("idx"), "run_len")


_PAD_ORACLE = f"""
    with g as (select distinct l_orderkey from lineitem),
    i as (select cast(unnest([0,1,2,3]) as bigint) as idx),
    v as (select l_orderkey,
                 cast(row_number() over (partition by l_orderkey
                                         order by l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus) - 1 as bigint) as idx,
                 {QC} as qty_c
          from lineitem)
    select g.l_orderkey, i.idx, {{val}} as qty_c
    from g cross join i
    left join v on v.l_orderkey = g.l_orderkey and v.idx = i.idx
"""


@query("q_pad_none", _PAD_ORACLE.format(val="v.qty_c"))
def q_pad_none(spark, sf_dir):
    """ak.pad_none(target=4, clip=True): fixed-width view with nulls."""
    it = order_items(spark, sf_dir)
    padded = st.pad_none(_qty_c(F.col("items")), 4, clip=True)
    ex = it.select("l_orderkey", F.posexplode_outer(padded).alias("idx", "qty_c"))
    return ex.select("l_orderkey", F.col("idx").cast("long").alias("idx"), "qty_c")


@query("q_fill_none", _PAD_ORACLE.format(val="coalesce(v.qty_c, -1)"))
def q_fill_none(spark, sf_dir):
    """ak.fill_none over a padded list."""
    it = order_items(spark, sf_dir)
    padded = st.pad_none(_qty_c(F.col("items")), 4, clip=True)
    filled = st.fill_none(padded, F.lit(-1).cast("long"))
    ex = it.select("l_orderkey", F.posexplode_outer(filled).alias("idx", "qty_c"))
    return ex.select("l_orderkey", F.col("idx").cast("long").alias("idx"), "qty_c")


@query(
    "q_mask_where",
    f"""
    select l_orderkey,
           cast(coalesce(sum(case when l_returnflag = 'R' then {QC} end), 0) as bigint)
             as masked_sum,
           cast(count(case when l_returnflag = 'R' then 1 end) as bigint) as n_kept,
           cast(sum(case when l_returnflag = 'R' then {QC} else -{QC} end) as bigint)
             as signed_sum
    from lineitem group by l_orderkey
    """,
)
def q_mask_where(spark, sf_dir):
    """ak.mask + ak.drop_none + ak.where + ak.is_none in one pass."""
    it = order_items(spark, sf_dir)
    q = _qty_c(F.col("items"))
    is_r = F.transform(F.col("items").getField("l_returnflag"), lambda r: r == "R")
    masked = st.mask(q, is_r)
    n_kept = st.num(st.drop_none(masked)) - F.aggregate(
        st.is_none(q), F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
    )
    signed = st.where(is_r, q, F.transform(q, lambda x: -x))
    return it.select(
        "l_orderkey",
        red.sum(masked).cast("long").alias("masked_sum"),
        n_kept.alias("n_kept"),
        red.sum(signed).cast("long").alias("signed_sum"),
    )


@query(
    "q_with_field",
    f"""
    select l_orderkey,
           cast(sum({PC} * (100 - {DC})) as bigint) as sum_disc_price_u
    from lineitem group by l_orderkey
    """,
)
def q_with_field(spark, sf_dir):
    """ak.with_field: add a computed field to each record, then reduce it;
    also exercises without_field."""
    it = order_items(spark, sf_dir, fields=['l_linenumber', 'l_extendedprice', 'l_discount', 'l_tax'])
    enriched = st.with_field(
        F.col("items"),
        "disc_price_u",
        lambda s: cents(s["l_extendedprice"]) * (F.lit(100) - cents(s["l_discount"])),
    )
    slim = st.without_field(enriched, "l_tax")
    return it.select(
        "l_orderkey",
        red.sum(fld(slim, "disc_price_u")).cast("long").alias("sum_disc_price_u"),
    )


@query(
    "q_concatenate",
    f"""
    select l_returnflag, cast(count(*) as bigint) as n,
           cast(sum({QC}) as bigint) as sum_qty_c
    from lineitem group by l_returnflag
    """,
)
def q_concatenate(spark, sf_dir):
    """ak.concatenate axis=0: union of two disjoint filtered halves
    recovers the whole (metadata-only union, no shuffle)."""
    li = read(spark, sf_dir, "lineitem")
    cut = F.lit("1998-01-01").cast("timestamp")
    lo = li.filter(F.col("l_shipdate") < cut)
    hi = li.filter(F.col("l_shipdate") >= cut)
    both = st.concatenate([lo, hi])
    return both.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
    )


# ---------------------------------------------------------------------------
# reducers
# ---------------------------------------------------------------------------


@query(
    "q_reduce_sum",
    f"""
    select l_orderkey, cast(sum({QC}) as bigint) as sum_qty_c,
           cast(sum({PC}) as bigint) as sum_price_c,
           cast(round(exp(sum(ln(greatest({DC}, 1))))) as bigint) as prod_disc_c
    from lineitem group by l_orderkey
    """,
)
def q_reduce_sum(spark, sf_dir):
    """ak.sum / ak.prod (axis=1). prod oracle via exp-sum-log of exact
    ints, rounded back to the exact integer product."""
    it = order_items(spark, sf_dir, fields=['l_linenumber', 'l_quantity', 'l_extendedprice', 'l_discount'])
    prod_in = F.transform(_disc_c(F.col("items")), lambda x: F.greatest(x, F.lit(1)))
    return it.select(
        "l_orderkey",
        red.sum(_qty_c(F.col("items"))).cast("long").alias("sum_qty_c"),
        red.sum(_price_c(F.col("items"))).cast("long").alias("sum_price_c"),
        F.round(red.prod(prod_in)).cast("long").alias("prod_disc_c"),
    )


@query(
    "q_reduce_minmax",
    f"""
    select l_orderkey, cast(min({QC}) as bigint) as min_qty_c,
           cast(max({PC}) as bigint) as max_price_c,
           cast(max({QC}) - min({QC}) as bigint) as ptp_qty_c
    from lineitem group by l_orderkey
    """,
)
def q_reduce_minmax(spark, sf_dir):
    """ak.min / ak.max / ak.ptp (axis=1)."""
    it = order_items(spark, sf_dir)
    q = _qty_c(F.col("items"))
    return it.select(
        "l_orderkey",
        red.min(q).cast("long").alias("min_qty_c"),
        red.max(_price_c(F.col("items"))).cast("long").alias("max_price_c"),
        red.ptp(q).cast("long").alias("ptp_qty_c"),
    )


@query(
    "q_reduce_count",
    f"""
    select l_orderkey, cast(count(*) as bigint) as n,
           cast(count(case when {DC} <> 0 then 1 end) as bigint) as n_discounted
    from lineitem group by l_orderkey
    """,
)
def q_reduce_count(spark, sf_dir):
    """ak.count / ak.count_nonzero (axis=1)."""
    it = order_items(spark, sf_dir)
    return it.select(
        "l_orderkey",
        red.count(_qty_c(F.col("items"))).alias("n"),
        red.count_nonzero(_disc_c(F.col("items"))).alias("n_discounted"),
    )


@query(
    "q_reduce_anyall",
    f"""
    select l_orderkey,
           cast(bool_or({DC} > 5) as int) as any_big_disc,
           cast(bool_and({QC} < 4500) as int) as all_small_qty
    from lineitem group by l_orderkey
    """,
)
def q_reduce_anyall(spark, sf_dir):
    """ak.any / ak.all (axis=1)."""
    it = order_items(spark, sf_dir)
    return it.select(
        "l_orderkey",
        red.any(F.transform(_disc_c(F.col("items")), lambda x: x > 5))
        .cast("int")
        .alias("any_big_disc"),
        red.all(F.transform(_qty_c(F.col("items")), lambda x: x < 4500))
        .cast("int")
        .alias("all_small_qty"),
    )


@query(
    "q_reduce_meanstd",
    f"""
    with s as (select l_orderkey,
                      cast(count(*) as double) as n,
                      cast(sum({QC}) as double) as s1,
                      cast(sum({QC}*{QC}) as double) as s2
               from lineitem group by l_orderkey)
    select l_orderkey,
           s1/n/100 as mean_qty,
           (s2 - s1*s1/n)/n/10000 as var_qty,
           sqrt((s2 - s1*s1/n)/n)/100 as std_qty
    from s
    """,
)
def q_reduce_meanstd(spark, sf_dir):
    """ak.mean / ak.var / ak.std (axis=1, population ddof=0 like ak).

    Oracle uses the SAME one-pass formula over exact integer sums, so
    both engines evaluate identical IEEE expressions.
    """
    it = order_items(spark, sf_dir)
    q = _qty_c(F.col("items"))
    return it.select(
        "l_orderkey",
        (red.mean(q) / 100).alias("mean_qty"),
        (red.var(q) / 10000).alias("var_qty"),
        (red.std(q) / 100).alias("std_qty"),
    )


@query(
    "q_reduce_argminmax",
    f"""
    with v as (select l_orderkey,
                      cast(row_number() over (partition by l_orderkey
                                              order by l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus) - 1 as bigint) as idx,
                      {QC} as qc
               from lineitem),
    mn as (select l_orderkey, idx as argmin_qty from v
           qualify row_number() over (partition by l_orderkey order by qc asc, idx asc) = 1),
    mx as (select l_orderkey, idx as argmax_qty from v
           qualify row_number() over (partition by l_orderkey order by qc desc, idx asc) = 1)
    select l_orderkey, argmin_qty, argmax_qty from mn join mx using (l_orderkey)
    """,
)
def q_reduce_argminmax(spark, sf_dir):
    """ak.argmin / ak.argmax (axis=1): first index of the extremum."""
    it = order_items(spark, sf_dir)
    q = _qty_c(F.col("items"))
    return it.select(
        "l_orderkey",
        red.argmin(q).alias("argmin_qty"),
        red.argmax(q).alias("argmax_qty"),
    )


@query(
    "q_moment",
    f"""
    with s as (select l_orderkey,
                      cast(count(*) as double) as n,
                      cast(sum({QC}*{QC}) as double) as s2,
                      cast(sum({QC}*{QC}*{QC}) as double) as s3
               from lineitem group by l_orderkey)
    select l_orderkey,
           s2/n/10000 as m2,
           s3/n/1000000 as m3
    from s
    """,
)
def q_moment(spark, sf_dir):
    """ak.moment (axis=1), n=2 and n=3 (repeated-multiply, not pow —
    exact for integer inputs)."""
    it = order_items(spark, sf_dir)
    q = _qty_c(F.col("items"))
    return it.select(
        "l_orderkey",
        (red.moment(q, 2) / 10000).alias("m2"),
        (red.moment(q, 3) / 1000000).alias("m3"),
    )


@query(
    "q_softmax",
    """
    with v as (select l_orderkey, l_quantity as q,
                      cast(row_number() over (partition by l_orderkey
                                              order by l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus) - 1 as bigint) as idx
               from lineitem),
    m as (select *, max(q) over (partition by l_orderkey) as mx from v),
    e as (select *, exp(q - mx) as ex from m),
    s as (select *, sum(ex) over (partition by l_orderkey) as sm from e)
    select l_orderkey, idx, round(ex/sm, 6) as softmax from s
    """,
)
def q_softmax(spark, sf_dir):
    """ak.softmax (axis=1), numerically-stable form."""
    it = order_items(spark, sf_dir)
    q = fld(F.col("items"), "l_quantity")
    sm = red.softmax(q)
    ex = it.select("l_orderkey", F.posexplode(sm).alias("idx", "v"))
    return ex.select(
        "l_orderkey",
        F.col("idx").cast("long").alias("idx"),
        F.round(F.col("v"), 6).alias("softmax"),
    )


_PAIR_SUMS = f"""
    select l_orderkey,
           cast(count(*) as double) as n,
           cast(sum({QC}) as double) as sx,
           cast(sum({PC}) as double) as sy,
           cast(sum({QC}*{QC}) as double) as sxx,
           cast(sum({PC}*{PC}) as double) as syy,
           cast(sum({QC}*{PC}) as double) as sxy
    from lineitem group by l_orderkey
"""


@query(
    "q_linear_fit",
    f"""
    with s as ({_PAIR_SUMS})
    select l_orderkey,
           (n*sxy - sx*sy) / (n*sxx - sx*sx) as slope,
           (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n as intercept
    from s where n*sxx - sx*sx <> 0
    """,
)
def q_linear_fit(spark, sf_dir):
    """ak.linear_fit (axis=1): least-squares qty_c -> price_c per order."""
    it = order_items(spark, sf_dir)
    fit = red.linear_fit(_qty_c(F.col("items")), _price_c(F.col("items")))
    out = it.select(
        "l_orderkey",
        fit["slope"].alias("slope"),
        fit["intercept"].alias("intercept"),
    )
    return out.filter(F.col("slope").isNotNull())


@query(
    "q_corr_covar",
    f"""
    with s as ({_PAIR_SUMS})
    select l_orderkey,
           sxy/n - (sx/n)*(sy/n) as covar_qp,
           (sxy/n - (sx/n)*(sy/n))
                 / sqrt((sxx/n - (sx/n)*(sx/n)) * (syy/n - (sy/n)*(sy/n))) as corr_qp
    from s
    where n > 0 and (sxx/n - (sx/n)*(sx/n)) * (syy/n - (sy/n)*(sy/n)) > 0
    """,
)
def q_corr_covar(spark, sf_dir):
    """ak.covar / ak.corr (axis=1), population, identical expression
    trees on both sides for bit-exact agreement."""
    it = order_items(spark, sf_dir)
    x, y = _qty_c(F.col("items")), _price_c(F.col("items"))
    out = it.select(
        "l_orderkey",
        red.covar(x, y).alias("covar_qp"),
        red.corr(x, y).alias("corr_qp"),
    )
    return out.filter(F.col("corr_qp").isNotNull())


# ---------------------------------------------------------------------------
# map_partitions
# ---------------------------------------------------------------------------


@query(
    "q_map_partitions",
    f"""
    select l_orderkey, cast(l_linenumber as bigint) as l_linenumber,
           {QC} * 2 + 1 as qty2
    from lineitem
    """,
)
def q_map_partitions(spark, sf_dir):
    """dak.map_partitions ≙ mapInArrow: arbitrary per-partition code,
    Arrow-batched (the one legitimate Python-in-the-path escape hatch)."""
    import pyarrow as pa

    li = read(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")

    def fn(batches):
        for b in batches:
            t = pa.table(
                {
                    "l_orderkey": b.column("l_orderkey"),
                    "l_linenumber": b.column("l_linenumber").cast(pa.int64()),
                    "qty2": pa.compute.add(
                        pa.compute.multiply(
                            pa.compute.round(pa.compute.multiply(b.column("l_quantity"), 100.0))
                            .cast(pa.int64()),
                            2,
                        ),
                        1,
                    ),
                }
            )
            for ob in t.to_batches():
                yield ob

    return li.mapInArrow(fn, "l_orderkey long, l_linenumber long, qty2 long")


@query(
    "q_reduce_axis_none",
    f"""
    select cast(sum({QC}) as bigint) as total_qty_c,
           cast(count(l_quantity) as bigint) as n_vals,
           cast(min({QC}) as bigint) as min_qty_c,
           cast(max({QC}) as bigint) as max_qty_c,
           cast(sum({QC}) as double) / count(l_quantity) as mean_qty_c
    from lineitem
    """,
)
def q_reduce_axis_none(spark, sf_dir):
    """ak.sum/count/min/max/mean(axis=None): whole-collection
    reduction over the nested build — per-list fold map-side, one
    partial per order row into the global agg (never per element)."""
    it = order_items(spark, sf_dir, fields=["l_linenumber", "l_quantity"])
    q = _qty_c(F.col("items"))
    return it.agg(
        red.sum0(q).cast("long").alias("total_qty_c"),
        red.count0(q).cast("long").alias("n_vals"),
        red.min0(q).cast("long").alias("min_qty_c"),
        red.max0(q).cast("long").alias("max_qty_c"),
        red.mean0(q).alias("mean_qty_c"),
    )
