"""Similarity search over embedding columns (array<float>).

  * brute-force cosine top-k — the exactness baseline: one broadcast of
    the query vector, dot products inside the scan (zip_with/aggregate,
    JVM codegen), then a k-row ORDER BY LIMIT (Spark's TakeOrdered —
    no full sort, no shuffle of the data).
  * IVF-style bucketed ANN — the scale path: vectors are assigned to the
    nearest of C centroids (broadcast); queries probe only the closest
    n_probe buckets, cutting compared rows by ~C/n_probe. Centroids come
    from a deterministic sample (k-means-lite: one assignment pass over a
    sample, then mean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query``."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = sum(x * x for x in query) ** 0.5
    if qn == 0:
        raise ValueError("query vector has zero norm — cosine is undefined")
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    # zero-norm rows give 0/0 = NaN, and Spark sorts NaN ABOVE every
    # double — without the filter, junk vectors would dominate the top-k
    return (
        emb.filter(_norm(F.col(vec_col)) > 0)
        .select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def train_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample: int = 2048,
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic k-means-lite: seed with the first n rows by id, one
    assignment pass over a bounded sample, then per-cluster mean."""
    # ORDER BY a NAMED unique id before LIMIT: an unordered (or
    # arbitrary-first-column) limit is not deterministic across
    # partitionings, and the centroids must be reproducible
    rows = emb.orderBy(id_col).select(vec_col).limit(sample).collect()
    vecs = [list(r[0]) for r in rows]
    if len(vecs) <= n_centroids:
        return vecs
    cents = vecs[:n_centroids]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    for _ in range(3):
        sums = [[0.0] * len(vecs[0]) for _ in range(n_centroids)]
        counts = [0] * n_centroids
        for v in vecs:
            ci = min(range(n_centroids), key=lambda i: d2(v, cents[i]))
            counts[ci] += 1
            for j, x in enumerate(v):
                sums[ci][j] += x
        cents = [
            [s / c for s in sums[i]] if (c := counts[i]) else cents[i]
            for i in range(n_centroids)
        ]
    return cents


def train_centroids_distributed(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
) -> list[list[float]]:
    """Distributed Lloyd's k-means — the 100-TB path: every iteration's
    ASSIGNMENT is a broadcast-centroid map over the full dataset (JVM
    zip_with math inside the scan) and the UPDATE is a
    posexplode -> groupBy(bucket, dim) -> avg whose collected result is
    only C x dim coordinates, never data rows. Seeding is deterministic
    (first C vectors by id). ``train_centroids`` (bounded driver sample)
    remains the cheap variant for small inputs."""
    seed = emb.orderBy(id_col).select(vec_col).limit(n_centroids).collect()
    cents = [[float(x) for x in r[0]] for r in seed]
    if len(cents) < n_centroids:
        return cents
    dim = len(cents[0])
    for _ in range(iters):
        assigned = assign_buckets(emb, cents, id_col=id_col, vec_col=vec_col)
        rows = (
            assigned.select("bucket", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("bucket", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        means = {(r["bucket"], r["pos"]): float(r["m"]) for r in rows}
        cents = [
            [means.get((ci, p), cents[ci][p]) for p in range(dim)]
            for ci in range(len(cents))
        ]
    return cents


def assign_buckets(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid bucket per vector (broadcast centroids, JVM math)."""
    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    dists = F.transform(
        cent_arr,
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        ),
    )
    bucket = F.array_position(dists, F.array_min(dists)) - 1
    return emb.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def ivf_topk(
    emb_bucketed: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing only the n_probe closest buckets. At scale the
    bucket column is a partition key, so pruning skips whole files."""

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    probe = sorted(range(len(centroids)), key=lambda i: d2(query, centroids[i]))[
        :n_probe
    ]
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = sum(x * x for x in query) ** 0.5
    if qn == 0:
        raise ValueError("query vector has zero norm — cosine is undefined")
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    # zero-norm rows -> NaN -> sorted above every real match (see
    # cosine_topk); exclude them before ranking
    return (
        emb_bucketed.filter(F.col("bucket").isin(*[int(p) for p in probe]))
        .filter(_norm(F.col(vec_col)) > 0)
        .select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )
