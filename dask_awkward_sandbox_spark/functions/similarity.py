"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and random-hyperplane
LSH bucketing as the scale path. All vector math is JVM-side
(``zip_with`` + ``aggregate`` folds) — no Python in the row path.

Scale design (1e9+ vectors): broadcast the (small) query set and
stream the corpus through a single narrow stage for brute force; for
corpus-vs-corpus, LSH buckets bound the pair explosion and the join
is equi on (plane-signature), shuffling each side once. An IVF
variant (k-means coarse quantizer) drops in by replacing the bucket
key with nearest-centroid id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.functions.text_analysis import MOD


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + left fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Queries broadcast; ranking key is (rounded sim desc, id asc) — a
    total order, so results are engine-independent.
    """
    c = corpus.select(
        F.col(id_col).alias("nb_id"), as_double(F.col(vec_col)).alias("nb_vec")
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("q_vec")
    )
    j = c.join(F.broadcast(q), F.col("nb_id") != F.col("q_id"))
    sim = F.round(cosine(F.col("q_vec"), F.col("nb_vec")), round_digits)
    scored = j.select("q_id", "nb_id", sim.alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("nb_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_digits: int = 6,
) -> DataFrame:
    """All (a < b) pairs with cosine >= threshold (exact, for corpora
    that fit a shuffle; LSH below for the ones that don't)."""
    a = df.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb"))
    j = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = F.round(cosine(F.col("va"), F.col("vb")), round_digits)
    return j.select("id_a", "id_b", sim.alias("sim")).filter(F.col("sim") >= threshold)


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: hash-mixed components in
    [-1, 1] from (plane, dim-index) — reproducible anywhere."""
    comps = []
    for d in range(dim):
        h = (2654435761 * (plane * 1009 + d + 1) + 97) % MOD
        comps.append((h / MOD) * 2.0 - 1.0)
    return comps


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 4,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature buckets, exact
    rank within the query's bucket. Recall grows with fewer planes /
    multiple tables; cost drops ~2**planes vs brute force."""
    def signature(vec: Column) -> Column:
        bits = []
        for p in range(planes):
            plane = _hyperplane(dim, p)
            proj = F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(c) for c in plane]),
                    lambda x, c: x * c,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for bcol in bits[1:]:
            out = out + bcol
        return out

    c = corpus.select(
        F.col(id_col).alias("nb_id"),
        as_double(F.col(vec_col)).alias("nb_vec"),
    ).withColumn("bucket", signature(F.col("nb_vec")))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        as_double(F.col(vec_col)).alias("q_vec"),
    ).withColumn("bucket", signature(F.col("q_vec")))
    j = c.join(F.broadcast(q), (F.col("nb_id") != F.col("q_id")) & (c["bucket"] == q["bucket"]))
    sim = F.round(cosine(F.col("q_vec"), F.col("nb_vec")), 6)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("nb_id"))
    return (
        j.select("q_id", "nb_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
