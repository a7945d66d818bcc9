"""Skew-handling join utilities (SURVEY.md §2.11 K6).

AQE's skew-join splitting (on in every session, frog_spark/session.py)
handles runtime skew in sort-merge joins; the explicit salting below is
the complementary technique for the case AQE cannot fix — a broadcast-
ineligible dimension joined on a key whose hot values would pin whole
partitions. The pipeline itself salts by construction (turn-grain
repartition spreads hot conversations, plans/pipeline.py); this helper is
the general relational form for user queries over the KG tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition an UNDER-PARALLEL relation to the session's
    default parallelism; a no-op whenever the source already has that many
    partitions.

    Why it exists: a small parquet file (or a single row group) yields one
    input split, so CPU-heavy row-local stages (gram explosion, MinHash
    signatures) would run on one core no matter how many are free. On a
    real-scale input the scan has thousands of splits, the guard is false,
    and no shuffle is added — so callers can apply this unconditionally
    without paying a full-corpus shuffle at 100 TB."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    # only consult .rdd for FILE-SCAN leaves: on a derived frame (joins/
    # aggregates upstream) .rdd under AQE can materialize query stages
    # eagerly just to count partitions, doubling the upstream work. A
    # derived frame's partitioning is already shuffle-determined, so the
    # guard is a no-op there anyway.
    try:
        files = df.inputFiles()
        # inputFiles() is non-empty for ANY plan containing a file leaf,
        # so additionally require a scan-only plan shape (no joins/aggs/
        # windows upstream) before touching .rdd
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return df
    if not files:
        return df
    if any(op in plan for op in ("Join", "Aggregate", "Window", "Sort", "Deduplicate")):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed on ``key``) with ``small``, spreading every hot
    key over ``salt`` shuffle partitions.

    The big side gets a deterministic pseudo-random salt in [0, salt)
    (xxhash64 of the full row's key + a per-row uniform draw is overkill;
    a hash of key and monotonically varying partition/row position
    suffices — here spark_partition_id + a row-local counter via
    monotonically_increasing_id, both shuffle-free). The small side is
    exploded ``salt`` times so every (key, salt) bucket finds its match.
    Output == plain join, shuffle skew bounded by count(hot_key)/salt.
    """
    if how not in ("inner", "left", "left_semi", "left_anti", "leftsemi", "leftanti"):
        # right/full joins would emit `salt` copies of every unmatched
        # small-side row (each exploded copy null-extends) — refuse
        # rather than return silently wrong results
        raise ValueError(f"salted_join does not support how={how!r}")
    salted_big = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(salt)
        ).cast("int"),
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def md5_bucket(col, mod: int):
    """Deterministic cross-engine bucket in [0, mod): the md5-hex-to-long
    construction DuckDB computes identically
    (('0x'||substr(md5(x::VARCHAR),1,15))::BIGINT % mod). The ONE
    definition shared by split_assign, pack_documents, and any future
    engine-reproducible hashing — keep in sync with the oracle recipe."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long"),
        F.lit(mod),
    )
