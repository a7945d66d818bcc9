"""Input sources (SURVEY.md §2.1 S1, S5).

S1 plain-text scan: spark.read.text -> one transcript turn per line (or per
paragraph), mirroring run_text_engine (/root/reference/src/FrogAPI.cxx:2862-2909).
S5 directory scan with --retry semantics: enumerate input files, skip those
whose output marker already exists (FrogAPI.cxx:1178-1289, retry at
1203-1206) — subsumed at stage level by plans/checkpoint.py; the file-level
variant here supports incremental ingest of raw text drops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_text_as_transcripts(
    spark: SparkSession, path: str, conv_per_file: bool = True
) -> DataFrame:
    """Each file is a conversation; each non-empty line a turn."""
    df = spark.read.text(path).withColumn(
        "file", F.input_file_name()
    )
    df = df.filter(F.length(F.trim("value")) > 0)
    w = Window.partitionBy("file").orderBy(F.monotonically_increasing_id())
    return df.select(
        F.regexp_extract("file", r"([^/]+)$", 1).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("value").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


def pending_files(input_dir: str, output_dir: str, suffix: str = ".txt") -> list[str]:
    """--retry: inputs whose output marker does not exist yet."""
    done = set(os.listdir(output_dir)) if os.path.isdir(output_dir) else set()
    out = []
    for name in sorted(os.listdir(input_dir)):
        if name.endswith(suffix) and f"{name}.done" not in done:
            out.append(os.path.join(input_dir, name))
    return out


def mark_done(output_dir: str, input_path: str) -> None:
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, os.path.basename(input_path) + ".done"), "w") as fh:
        fh.write("ok\n")
