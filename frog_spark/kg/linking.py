"""Entity linking via blocked MinHash-LSH (SURVEY.md §2.11, K3).

From-scratch DataFrame implementation (no spark.ml dependency so the exact
hash family is visible and reproducible):

  1. distinct entity surface forms -> character 3-shingles (explode)
  2. k independent min-hashes: minhash_i(form) = min over shingles of
     xxhash64(i, shingle)   — all JVM-side built-ins, whole-stage codegen
  3. banding: k = bands x rows_per_band; band key = hash of the band's
     signature slice; forms sharing any band key become candidate pairs
     (self equi-join on the band key — a shuffle hash join on a high-
     cardinality key, the classic LSH blocking step; no O(n^2) compare)
  4. verification: exact Jaccard over shingle sets for candidates only;
     keep pairs >= threshold.

Scale: every step is a groupBy/join on bounded-size keys; the candidate
join is banded so the heaviest key is one LSH bucket, and AQE skew-join
splits pathological buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 12
DEFAULT_BANDS = 4  # 4 bands x 3 rows
DEFAULT_THRESHOLD = 0.5
SHINGLE_SIZE = 3


def _shingles(forms: DataFrame, col: str = "form") -> DataFrame:
    """form -> exploded distinct char 3-shingles of the normalized text."""
    # bind the padded string as an attribute: inlined into the transform
    # lambda, the interpreted HOF re-runs the normalize+concat per
    # shingle element (see operators/dedup.gram_sets)
    norm = F.lower(F.regexp_replace(F.col(col), r"\s+", " "))
    pdf = forms.select(
        col, F.concat(F.lit("^^"), norm, F.lit("$$")).alias("_padded")
    )
    n = F.length("_padded") - (SHINGLE_SIZE - 1)
    return pdf.select(
        col,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                    lambda i: F.col("_padded").substr(i, F.lit(SHINGLE_SIZE)),
                )
            )
        ).alias("shingle"),
    )


def minhash_signatures(
    forms: DataFrame,
    col: str = "form",
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingles: DataFrame | None = None,
) -> DataFrame:
    sh = shingles if shingles is not None else _shingles(forms, col)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(col).agg(*aggs)


def candidate_pairs(
    forms: DataFrame,
    col: str = "form",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """LSH banding -> distinct candidate (a, b) pairs with a < b."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must be divisible by bands={bands} — "
            "trailing minhashes would be computed but silently never banded, "
            "changing the LSH sensitivity curve from the requested one"
        )
    sig = minhash_signatures(forms, col, num_hashes, shingles=shingles)
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("key"))
        )
    buckets = sig.select(
        F.col(col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{col}") < F.col(f"b.{col}")),
        )
        .select(F.col(f"a.{col}").alias("a"), F.col(f"b.{col}").alias("b"))
        .distinct()
    )


def similarity_edges(
    forms: DataFrame,
    col: str = "form",
    threshold: float = DEFAULT_THRESHOLD,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Verified edges (a, b, jaccard >= threshold)."""
    # the shingle relation feeds FOUR consumers (signatures inside the
    # candidate join, both verification sides, sizes) — materialize it
    # once or every consumer re-executes the explode lineage (the branch
    # re-execution hazard documented in BENCH/BASELINE.md). Eager
    # localCheckpoint keeps no lingering cache entry to unpersist.
    sh = _shingles(forms, col).localCheckpoint(eager=True)
    cands = candidate_pairs(forms, col, num_hashes, bands, shingles=sh)
    sizes = sh.groupBy(col).agg(F.count("*").alias("sz"))
    # intersection via join on shingle
    sa = sh.select(F.col(col).alias("a"), "shingle")
    sb = sh.select(F.col(col).alias("b"), "shingle")
    inter = (
        cands.join(sa, "a").join(sb, ["b", "shingle"]).groupBy("a", "b").agg(
            F.count("*").alias("inter")
        )
    )
    za = sizes.select(F.col(col).alias("a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col(col).alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "a")
        .join(zb, "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
