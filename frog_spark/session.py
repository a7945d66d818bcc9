"""SparkSession factory tuned for the frog_spark pipeline.

Scale posture (designed for a 1000-executor cluster, tested on local[N]):
  - AQE on: runtime coalescing of shuffle partitions + skew-join splitting.
  - Arrow on: every pandas UDF stage moves data as Arrow batches.
  - shuffle.partitions sized to cores locally; on a real cluster this is
    set to ~2-3x total executor cores via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "frog_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` only applies when no master is configured externally; on a
    real cluster the master/executor topology comes from spark-submit.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate turns explode(expensive_expr) into a
        # pushed-down Filter(size(expensive_expr)>0 AND isnotnull(...))
        # with the generator input INLINED TWICE at the scan — for the
        # interpreted higher-order-function gram pipelines that filter
        # costs far more than the explode it guards (measured: 76 s of a
        # 90 s query at sf=1.0). The rule is purely an optimization
        # (inferred-redundant predicates), so excluding it cannot change
        # any result. Scale-independent: at any input size the inferred
        # filter re-evaluates the generator input once more per row.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # the MinHash/SimHash signature aggregates are 61-129 flat agg
        # columns; the default maxFields=100 silently drops whole-stage
        # codegen for exactly the stages built to exploit it
        .config("spark.sql.codegen.maxFields", "512")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # size input splits to the tested SF: the small-SF parquet files are
        # single-digit MB, and the default 128 MB split puts an entire scan
        # stage on ONE core; 4 MB keeps local[32] busy while remaining a
        # no-op at cluster scale (files there exceed any split size).
        # Overridable per-session via extra_conf / spark-submit.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("FROG_SPARK_MAX_PARTITION_BYTES", "4194304"),
        )
        .config("spark.driver.memory", os.environ.get("FROG_SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if "SPARK_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_MASTER"])
    else:
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
