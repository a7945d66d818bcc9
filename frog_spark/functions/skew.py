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
