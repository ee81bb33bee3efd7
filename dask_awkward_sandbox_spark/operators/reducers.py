"""Reducers over nested list columns (awkward axis=1) and tables.

Spark-first re-expression of the reference's reducer surface
(``/root/reference/src/dask_awkward/lib/reducers.py``). Per-list
(axis=1) reductions are single-pass ``F.aggregate`` folds — JVM-side,
inside whole-stage codegen, no shuffle. Whole-collection (axis=None /
axis=0) reductions are expressed as relational aggregates so Catalyst
plans map-side partial aggregation.

Missing-value semantics match awkward: null elements are skipped
(option types dropped before reducing); identity values for empty
lists follow ak (sum->0, prod->1, count->0, any->False, all->True,
min/max->null). NaN is a VALUE, not a missing marker: it propagates
through sum/prod/mean/var/moment like numpy, poisons min/max/ptp, and
argmin/argmax return the first NaN index — matching ak/numpy, where
only option types are skipped.

ANSI-safe: no division without a guard, no element_at.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _vals(arr: Column) -> Column:
    """Non-null elements cast to double — the reduction input.

    Drops ONLY nulls (awkward's option-type skipping); NaN stays in
    and propagates through the folds like numpy."""
    return F.filter(F.transform(arr, lambda x: x.cast("double")), lambda x: x.isNotNull())


from dask_awkward_sandbox_spark.operators.structure import let as _let  # noqa: E402


def _nan_poisoned(arr: Column, result: Column) -> Column:
    """numpy semantics for order statistics: any NaN element poisons
    the result (Spark's array_min/array_max instead sort NaN last/
    first, which would silently return a non-NaN extremum)."""
    return F.when(F.exists(arr, F.isnan), F.lit(float("nan"))).otherwise(result)


def count(arr: Column, *, keepdims: bool = False, mask_identity: bool = False) -> Column:
    """ak.count (axis=1): number of non-null elements."""
    out = F.size(F.filter(arr, lambda x: x.isNotNull())).cast("long")
    return _finish(arr, out, keepdims, mask_identity)


def count_nonzero(
    arr: Column, *, keepdims: bool = False, mask_identity: bool = False
) -> Column:
    """ak.count_nonzero (axis=1)."""
    out = F.size(F.filter(arr, lambda x: x.isNotNull() & (x != F.lit(0)))).cast("long")
    return _finish(arr, out, keepdims, mask_identity)


def _typed_seed(arr: Column, value: int) -> Column:
    """A ``value`` literal carrying the WIDER of (element type, bigint):
    coalesce of an element-typed null (out-of-bounds get) with a bigint
    literal lets Catalyst's type coercion pick the accumulator type —
    int8/16/32/64 lists fold in int64 (awkward's reducer promotion),
    float/double/decimal lists fold in their own type. No schema
    knowledge needed at call time."""
    from dask_awkward_sandbox_spark.operators.structure import _null_like

    return F.coalesce(_null_like(arr), F.lit(value).cast("long"))


def _nn(arr: Column) -> Column:
    """Non-null elements in their NATIVE type (awkward's option-type
    skipping); NaN stays in and propagates like numpy."""
    return F.filter(arr, lambda x: x.isNotNull())


def _finish(
    arr: Column, result: Column, keepdims: bool, mask_identity: bool
) -> Column:
    """The reference's two reducer modifiers (reference reducers.py
    keepdims/mask_identity params, parametrized across
    tests/test_reducers.py): ``mask_identity`` makes an EMPTY (after
    option-dropping) list reduce to null instead of the identity;
    ``keepdims`` wraps the result in a length-1 list (the kept axis)."""
    out = result
    if mask_identity:
        out = F.when(F.size(_nn(arr)) > 0, out)
    if keepdims:
        out = F.array(out)
    return out


def sum(  # noqa: A001 - mirrors ak.sum
    arr: Column, *, keepdims: bool = False, mask_identity: bool = False
) -> Column:
    """ak.sum (axis=1); empty list -> 0. Type-preserving: integer
    lists reduce in int64 (exact past 2**53, awkward parity), float /
    double / decimal lists in their own type — the fold's seed is
    :func:`_typed_seed`'s coerced zero, not a double literal."""
    out = _let(
        arr, body=lambda a: F.aggregate(_nn(a), _typed_seed(a, 0), lambda acc, x: acc + x)
    )
    return _finish(arr, out, keepdims, mask_identity)


def prod(arr: Column, *, keepdims: bool = False, mask_identity: bool = False) -> Column:
    """ak.prod (axis=1); empty list -> 1. Type-preserving like
    :func:`sum` (integers fold in int64)."""
    out = _let(
        arr, body=lambda a: F.aggregate(_nn(a), _typed_seed(a, 1), lambda acc, x: acc * x)
    )
    return _finish(arr, out, keepdims, mask_identity)


def min(  # noqa: A001
    arr: Column, *, keepdims: bool = False, mask_identity: bool = True
) -> Column:
    """ak.min (axis=1); empty -> null (ak's mask_identity=True
    default; False yields the +inf identity); NaN element -> NaN."""
    out = _let(_vals(arr), body=lambda v: _nan_poisoned(v, F.array_min(v)))
    if not mask_identity:
        # empty -> identity, but a NULL list stays null (outer option)
        out = F.when(arr.isNotNull(), F.coalesce(out, F.lit(float("inf"))))
    return F.array(out) if keepdims else out


def max(  # noqa: A001
    arr: Column, *, keepdims: bool = False, mask_identity: bool = True
) -> Column:
    """ak.max (axis=1); empty -> null (ak default; mask_identity=False
    yields the -inf identity); NaN element -> NaN."""
    out = _let(_vals(arr), body=lambda v: _nan_poisoned(v, F.array_max(v)))
    if not mask_identity:
        out = F.when(arr.isNotNull(), F.coalesce(out, F.lit(float("-inf"))))
    return F.array(out) if keepdims else out


def ptp(arr: Column) -> Column:
    """ak.ptp (axis=1): max - min; empty -> null; NaN element -> NaN."""
    return _let(
        _vals(arr),
        body=lambda v: _nan_poisoned(v, F.array_max(v) - F.array_min(v)),
    )


def any(  # noqa: A001
    arr: Column, *, keepdims: bool = False, mask_identity: bool = False
) -> Column:
    """ak.any (axis=1); empty -> False."""
    out = F.exists(arr, lambda x: x.isNotNull() & x.cast("boolean"))
    return _finish(arr, out, keepdims, mask_identity)


def all(  # noqa: A001
    arr: Column, *, keepdims: bool = False, mask_identity: bool = False
) -> Column:
    """ak.all (axis=1); empty -> True. Nulls skipped (awkward drops options)."""
    out = F.forall(arr, lambda x: x.isNull() | x.cast("boolean"))
    return _finish(arr, out, keepdims, mask_identity)


def _wmoments(arr: Column, weight: Column) -> Column:
    """One-pass weighted (n, sw, swx, swxx) over parallel lists,
    skipping pairs where value or weight is null (awkward drops
    options)."""
    pairs = F.filter(
        F.zip_with(
            arr,
            weight,
            lambda x, w: F.struct(
                x.cast("double").alias("x"), w.cast("double").alias("w")
            ),
        ),
        lambda p: p["x"].isNotNull() & p["w"].isNotNull(),
    )
    init = F.struct(
        F.lit(0.0).alias("n"),
        F.lit(0.0).alias("sw"),
        F.lit(0.0).alias("swx"),
        F.lit(0.0).alias("swxx"),
    )
    return F.aggregate(
        pairs,
        init,
        lambda a, p: F.struct(
            (a["n"] + 1).alias("n"),
            (a["sw"] + p["w"]).alias("sw"),
            (a["swx"] + p["w"] * p["x"]).alias("swx"),
            (a["swxx"] + p["w"] * p["x"] * p["x"]).alias("swxx"),
        ),
    )


def mean(arr: Column, weight: Column | None = None) -> Column:
    """ak.mean (axis=1); empty -> null. With ``weight`` (a parallel
    list column): sum(w*x)/sum(w) — the weighted form the REFERENCE
    raises DaskAwkwardNotImplemented for (lib/reducers.py:338), per
    awkward's own ak.mean semantics."""
    if weight is not None:
        return _let(
            _wmoments(arr, weight),
            body=lambda m: F.when(m["n"] > 0, m["swx"] / m["sw"]),
        )
    return _let(
        _vals(arr),
        body=lambda v: F.when(
            F.size(v) > 0, F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / F.size(v)
        ),
    )


def _moments(arr: Column) -> Column:
    """One-pass (n, sum, sumsq) accumulator struct."""
    init = F.struct(
        F.lit(0.0).alias("n"), F.lit(0.0).alias("s"), F.lit(0.0).alias("ss")
    )
    return F.aggregate(
        _vals(arr),
        init,
        lambda a, x: F.struct(
            (a["n"] + 1).alias("n"), (a["s"] + x).alias("s"), (a["ss"] + x * x).alias("ss")
        ),
    )


def var(arr: Column, ddof: int = 0, weight: Column | None = None) -> Column:
    """ak.var (axis=1), population by default like awkward (ddof=0).
    With ``weight``: sum(w*(x-mean)^2) / (sum(w) - ddof) — reduces to
    the unweighted form at w=1 (beyond the reference, which raises
    for weight=; awkward semantics)."""
    if weight is not None:

        def wfin(m: Column) -> Column:
            sw, swx, swxx = m["sw"], m["swx"], m["swxx"]
            mu = swx / sw
            return F.when(
                (m["n"] > 0) & (sw > ddof),
                (swxx - sw * mu * mu) / (sw - F.lit(float(ddof))),
            )

        return _let(_wmoments(arr, weight), body=wfin)

    def fin(m: Column) -> Column:
        n, s, ss = m["n"], m["s"], m["ss"]
        return F.when(n > ddof, (ss - s * s / n) / (n - F.lit(float(ddof))))

    return _let(_moments(arr), body=fin)


def std(arr: Column, ddof: int = 0, weight: Column | None = None) -> Column:
    """ak.std (axis=1); weighted form as :func:`var`."""
    return F.sqrt(var(arr, ddof, weight))


def moment(arr: Column, n: int) -> Column:
    """ak.moment (axis=1): mean of x**n."""
    return _let(
        _vals(arr),
        body=lambda v: F.when(
            F.size(v) > 0,
            F.aggregate(v, F.lit(0.0), lambda a, x: a + F.pow(x, F.lit(n))) / F.size(v),
        ),
    )


def _argbest(arr: Column, better) -> Column:
    pairs = F.filter(
        F.transform(
            arr, lambda x, i: F.struct(x.cast("double").alias("v"), i.cast("long").alias("i"))
        ),
        lambda p: p["v"].isNotNull(),
    )
    init = F.lit(None).cast("struct<v:double,i:bigint>")
    # NaN wins over any non-NaN and the FIRST NaN sticks — numpy's
    # argmin/argmax propagation (a NaN accumulator is never replaced)
    best = F.aggregate(
        pairs,
        init,
        lambda a, p: F.when(
            a.isNull()
            | (
                ~F.isnan(a["v"])
                & (F.isnan(p["v"]) | better(p["v"], a["v"]))
            ),
            p,
        ).otherwise(a),
    )
    return best["i"]


def argmin(arr: Column) -> Column:
    """ak.argmin (axis=1); first index of the minimum; empty -> null."""
    return _argbest(arr, lambda new, cur: new < cur)


def argmax(arr: Column) -> Column:
    """ak.argmax (axis=1); first index of the maximum; empty -> null."""
    return _argbest(arr, lambda new, cur: new > cur)


def softmax(arr: Column) -> Column:
    """ak.softmax (axis=1): numerically-stable exp(x-max)/sum.

    Every intermediate is ``_let``-bound: the naive spelling embeds
    ``array_max(v)`` (and then the exps aggregate) inside per-element
    lambdas, which interpreted-HOF evaluation re-computes for EVERY
    element — O(n²) per list. Bound, the whole softmax is two O(n)
    passes."""
    return _let(
        _vals(arr),
        body=lambda v: _let(
            v,
            F.array_max(v),
            body=lambda v2, m: _let(
                F.transform(v2, lambda x: F.exp(x - m)),
                body=lambda exps: _let(
                    exps,
                    F.aggregate(exps, F.lit(0.0), lambda a, x: a + x),
                    body=lambda e2, denom: F.transform(e2, lambda e: e / denom),
                ),
            ),
        ),
    )


def _pair_moments(x: Column, y: Column, weight: Column | None = None) -> Column:
    """One-pass (n, sx, sy, sxx, syy, sxy) over parallel lists, skipping
    pairs where either side (or the weight) is null. With ``weight``,
    ``n`` carries sum(w) and every sum is w-scaled, so the downstream
    formulas are identical in both modes (w=1 recovers the counts)."""
    if weight is None:
        pairs = F.filter(
            F.zip_with(
                x,
                y,
                lambda a, b: F.struct(
                    a.cast("double").alias("x"),
                    b.cast("double").alias("y"),
                    F.lit(1.0).alias("w"),
                ),
            ),
            lambda p: p["x"].isNotNull() & p["y"].isNotNull(),
        )
    else:
        zipped = F.zip_with(
            F.zip_with(
                x,
                y,
                lambda a, b: F.struct(
                    a.cast("double").alias("x"), b.cast("double").alias("y")
                ),
            ),
            weight,
            lambda p, w: F.struct(
                p["x"].alias("x"), p["y"].alias("y"), w.cast("double").alias("w")
            ),
        )
        pairs = F.filter(
            zipped,
            lambda p: p["x"].isNotNull() & p["y"].isNotNull() & p["w"].isNotNull(),
        )
    init = F.struct(
        F.lit(0.0).alias("n"),
        F.lit(0.0).alias("sx"),
        F.lit(0.0).alias("sy"),
        F.lit(0.0).alias("sxx"),
        F.lit(0.0).alias("syy"),
        F.lit(0.0).alias("sxy"),
    )
    return F.aggregate(
        pairs,
        init,
        lambda a, p: F.struct(
            (a["n"] + p["w"]).alias("n"),
            (a["sx"] + p["w"] * p["x"]).alias("sx"),
            (a["sy"] + p["w"] * p["y"]).alias("sy"),
            (a["sxx"] + p["w"] * p["x"] * p["x"]).alias("sxx"),
            (a["syy"] + p["w"] * p["y"] * p["y"]).alias("syy"),
            (a["sxy"] + p["w"] * p["x"] * p["y"]).alias("sxy"),
        ),
    )


def covar(x: Column, y: Column, weight: Column | None = None) -> Column:
    """ak.covar (axis=1), population; optional parallel weight list
    (the reference raises DaskAwkwardNotImplemented even unweighted —
    lib/reducers.py:255)."""

    def fin(m: Column) -> Column:
        n = m["n"]
        return F.when(n > 0, m["sxy"] / n - (m["sx"] / n) * (m["sy"] / n))

    return _let(_pair_moments(x, y, weight), body=fin)


def corr(x: Column, y: Column, weight: Column | None = None) -> Column:
    """ak.corr (axis=1): Pearson correlation; optional weight."""

    def fin(m: Column) -> Column:
        n = m["n"]
        cov = m["sxy"] / n - (m["sx"] / n) * (m["sy"] / n)
        vx = m["sxx"] / n - (m["sx"] / n) * (m["sx"] / n)
        vy = m["syy"] / n - (m["sy"] / n) * (m["sy"] / n)
        denom = F.sqrt(vx * vy)
        return F.when((n > 0) & (denom > 0), cov / denom)

    return _let(_pair_moments(x, y, weight), body=fin)


def linear_fit(x: Column, y: Column, weight: Column | None = None) -> Column:
    """ak.linear_fit (axis=1): least-squares (weighted when ``weight``
    given); returns struct(slope, intercept)."""

    def fin(m: Column) -> Column:
        n = m["n"]
        det = n * m["sxx"] - m["sx"] * m["sx"]
        slope = F.when(det != 0, (n * m["sxy"] - m["sx"] * m["sy"]) / det)
        intercept = F.when(det != 0, (m["sy"] - slope * m["sx"]) / n)
        return F.struct(slope.alias("slope"), intercept.alias("intercept"))

    return _let(_pair_moments(x, y, weight), body=fin)


# ---------------------------------------------------------------------------
# axis=None (whole-collection) reductions: two-level — the per-list
# JVM fold runs map-side inside the scan, then a relational aggregate
# combines one partial per ROW (never one per element). At 100 TB the
# shuffle moves |rows| partials per task, not |elements|; Catalyst
# partial-aggregates those again before the single-exchange combine.
# ---------------------------------------------------------------------------


def sum0(arr: Column) -> Column:
    """ak.sum(axis=None): global sum of every list element."""
    return F.sum(sum(arr))


def count0(arr: Column) -> Column:
    """ak.count(axis=None): global non-null element count."""
    return F.sum(count(arr))


def min0(arr: Column) -> Column:
    """ak.min(axis=None)."""
    return F.min(min(arr))


def max0(arr: Column) -> Column:
    """ak.max(axis=None)."""
    return F.max(max(arr))


def mean0(arr: Column) -> Column:
    """ak.mean(axis=None): exact global sum / count."""
    return F.sum(sum(arr)) / F.sum(count(arr))


# ---------------------------------------------------------------------------
# axis=0 (positional, across rows): result[i] = reduce over rows of
# each row's i-th element — ak.sum(x, axis=0) etc. (reference
# tests/test_reducers.py axis=0 cases; positional argmin/argmax stay
# unsupported at axis=0 exactly like the reference's xfail).
#
# Shape: posexplode -> groupBy(pos). Positions are FEW (max list
# length), and position 0 holds |rows| elements — but Catalyst's
# map-side partial aggregation reduces each partition to one partial
# per position before the exchange, so the shuffle carries
# |partitions| x |positions| rows, never |elements|. The result is a
# one-row DataFrame holding the positional list.
# ---------------------------------------------------------------------------


def _axis0(df, arr: Column, agg: Column, out: str):
    e = df.select(F.posexplode_outer(arr).alias("pos", "_v"))
    g = e.filter(F.col("pos").isNotNull()).groupBy("pos").agg(agg.alias("_a"))
    return g.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "_a"))), lambda s: s["_a"]
        ).alias(out)
    )


def sum_axis0(df, arr: Column):
    """ak.sum(axis=0): positional sums — 1-row DataFrame, one list."""
    return _axis0(df, arr, F.sum("_v"), "sum0")


def count_axis0(df, arr: Column):
    """ak.count(axis=0): non-null count per position."""
    return _axis0(df, arr, F.count("_v").cast("long"), "count0")


def min_axis0(df, arr: Column):
    """ak.min(axis=0); null at positions where every element is null."""
    return _axis0(df, arr, F.min("_v"), "min0")


def max_axis0(df, arr: Column):
    """ak.max(axis=0)."""
    return _axis0(df, arr, F.max("_v"), "max0")


def any_axis0(df, arr: Column):
    """ak.any(axis=0): positional boolean OR (nulls skipped)."""
    return _axis0(df, arr, F.max(F.col("_v").cast("boolean")), "any0")


def all_axis0(df, arr: Column):
    """ak.all(axis=0): positional boolean AND (nulls skipped)."""
    return _axis0(df, arr, F.min(F.col("_v").cast("boolean")), "all0")


def mean_axis0(df, arr: Column):
    """ak.mean(axis=0): exact positional sum / count."""
    return _axis0(df, arr, F.sum("_v") / F.count("_v"), "mean0")


# ---------------------------------------------------------------------------
# awkward keyword-surface compatibility (r6; see operators/akcompat.py)
# ---------------------------------------------------------------------------
from dask_awkward_sandbox_spark.operators.akcompat import apply_surface as _aks  # noqa: E402

_aks(globals(), {
    # reducers: ak signature sum(array, axis=None, keepdims=False,
    # mask_identity=False, highlevel=True, behavior=None, attrs=None).
    # The Column-level forms reduce the deepest list axis (1 / -1);
    # axis=None / axis=0 raise pointing at sum0/sum_axis0 families.
    "sum": {}, "prod": {}, "ptp": {},
    "min": {"fixed": {"initial": None}},
    "max": {"fixed": {"initial": None}},
    "any": {}, "all": {}, "count": {}, "count_nonzero": {},
    # empty lists already reduce to NULL (Spark's 0/0), which IS
    # mask_identity=True — the only supported value
    "mean": {"fixed": {"keepdims": False, "mask_identity": True}},
    "var": {"fixed": {"keepdims": False, "mask_identity": True}},
    "std": {"fixed": {"keepdims": False, "mask_identity": True}},
    "moment": {"fixed": {"keepdims": False, "mask_identity": True}},
    "argmin": {"fixed": {"keepdims": False, "mask_identity": True}},
    "argmax": {"fixed": {"keepdims": False, "mask_identity": True}},
    "softmax": {"axis": (-1, 1), "axis_default": -1},
    "corr": {}, "covar": {}, "linear_fit": {},
})
