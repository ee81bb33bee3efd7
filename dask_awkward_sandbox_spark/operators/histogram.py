"""Fixed-bin histograms over flat and nested (ragged) columns — the
workload dask-awkward's HEP users run on every analysis (the
reference's docs pair it with external hist libraries; here it is a
first-class operator with numpy.histogram edge semantics: half-open
bins [e_i, e_{i+1}) with the LAST bin closed, under/overflow
optionally kept).

Scale shapes:
- flat column: one groupBy(bin) with map-side partial counts — the
  shuffle carries at most ``bins`` rows per task;
- ragged column, per-row: a JVM fold builds each row's count vector
  in place — no explode, no shuffle;
- ragged column, global: per-row count vectors reduce by POSITION in
  one relational aggregate (``bins`` sums computed in a single agg
  pass, map-side combined) — the shuffle carries one ``bins``-wide
  partial per task, never |elements| rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_index(x: Column, bins: int, lo: float, hi: float) -> Column:
    """numpy.histogram bin index for ``x``: floor((x-lo)/width),
    except x == hi lands in the last bin (closed right edge);
    underflow -> -1, overflow -> ``bins``, null -> null."""
    if bins < 1 or not hi > lo:
        raise ValueError(f"need bins >= 1 and hi > lo, got {bins}, [{lo}, {hi})")
    width = (hi - lo) / bins
    xd = x.cast("double")
    raw = F.floor((xd - F.lit(lo)) / F.lit(width)).cast("long")
    # numpy's edge correction: the fast (x-lo)/width index can land one
    # bin off when rounding swallows a value sitting just below/above
    # an edge (e.g. -1e-45 + 8.0 == 8.0 exactly in float); compare
    # against the computed edges and shift back like np.histogram does
    corrected = (
        F.when(xd < F.lit(lo) + raw * F.lit(width), raw - 1)
        .when(xd >= F.lit(lo) + (raw + 1) * F.lit(width), raw + 1)
        .otherwise(raw)
    )
    return (
        F.when(xd.isNull(), F.lit(None).cast("long"))
        .when(xd < lo, F.lit(-1))
        .when(xd == F.lit(float(hi)), F.lit(bins - 1))
        .when(xd > F.lit(float(hi)), F.lit(bins))
        .otherwise(F.greatest(F.least(corrected, F.lit(bins - 1)), F.lit(0)))
    )


def histogram(
    df: DataFrame, col: str, bins: int, lo: float, hi: float, flow: bool = False
) -> DataFrame:
    """Histogram of a FLAT numeric column: (bin, lo_edge, hi_edge, n),
    every bin present (zero-filled), ordered. ``flow=True`` keeps
    underflow/overflow as bins -1 and ``bins`` (null edges)."""
    width = (hi - lo) / bins
    idx = bin_index(F.col(col), bins, lo, hi).alias("bin")
    counts = df.select(idx).filter(F.col("bin").isNotNull())
    if not flow:
        counts = counts.filter((F.col("bin") >= 0) & (F.col("bin") < bins))
    counts = counts.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    lo_b, hi_b = (-1, bins + 1) if flow else (0, bins)
    frame = df.sparkSession.range(lo_b, hi_b).select(F.col("id").alias("bin"))
    edges = frame.select(
        "bin",
        F.when(
            (F.col("bin") >= 0) & (F.col("bin") < bins),
            F.lit(lo) + F.col("bin") * F.lit(width),
        ).alias("lo_edge"),
        F.when(
            (F.col("bin") >= 0) & (F.col("bin") < bins),
            F.lit(lo) + (F.col("bin") + 1) * F.lit(width),
        ).alias("hi_edge"),
    )
    return (
        edges.join(counts, "bin", "left")
        .select("bin", "lo_edge", "hi_edge", F.coalesce("n", F.lit(0)).alias("n"))
        .orderBy("bin")
    )


def histogram_axis1(arr: Column, bins: int, lo: float, hi: float) -> Column:
    """Per-row histogram of a LIST column: an int64 array of ``bins``
    counts (under/overflow and nulls dropped), built by one in-row
    fold — no explode."""
    if bins < 1 or not hi > lo:
        raise ValueError(f"need bins >= 1 and hi > lo, got {bins}, [{lo}, {hi})")
    zero = F.array_repeat(F.lit(0).cast("long"), bins)

    def step(acc: Column, x: Column) -> Column:
        i = bin_index(x, bins, lo, hi)
        return F.when(
            i.isNull() | (i < 0) | (i >= bins), acc
        ).otherwise(
            F.transform(
                acc, lambda c, j: F.when(j.cast("long") == i, c + 1).otherwise(c)
            )
        )

    return F.aggregate(arr, zero, step)


def histogram_global(
    df: DataFrame, arr_col: str, bins: int, lo: float, hi: float
) -> DataFrame:
    """Histogram of every element of a LIST column across all rows:
    per-row count vectors (map-side JVM fold) reduced by position in
    ONE relational aggregate. Output shape = :func:`histogram`."""
    width = (hi - lo) / bins
    vec = histogram_axis1(F.col(arr_col), bins, lo, hi).alias("_h")
    sums = df.select(vec).agg(
        *[F.sum(F.get(F.col("_h"), i)).alias(f"b{i}") for i in range(bins)]
    )
    rows = sums.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("bin"),
                        F.lit(lo + i * width).alias("lo_edge"),
                        F.lit(lo + (i + 1) * width).alias("hi_edge"),
                        F.coalesce(F.col(f"b{i}"), F.lit(0)).alias("n"),
                    )
                    for i in range(bins)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.bin", "r.lo_edge", "r.hi_edge", "r.n").orderBy("bin")


def histogram2d(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bins: tuple[int, int],
    xrange: tuple[float, float],
    yrange: tuple[float, float],
) -> DataFrame:
    """2D histogram of two flat columns: (xbin, ybin, n), in-range
    cells with nonzero counts (dense zero-fill left to the caller —
    at real scale most of a 2D grid is empty). One groupBy on the
    pair, map-side combined."""
    bx, by = bins
    xi = bin_index(F.col(xcol), bx, *xrange).alias("xbin")
    yi = bin_index(F.col(ycol), by, *yrange).alias("ybin")
    return (
        df.select(xi, yi)
        .filter(
            F.col("xbin").isNotNull() & F.col("ybin").isNotNull()
            & (F.col("xbin") >= 0) & (F.col("xbin") < bx)
            & (F.col("ybin") >= 0) & (F.col("ybin") < by)
        )
        .groupBy("xbin", "ybin")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("xbin", "ybin")
    )
