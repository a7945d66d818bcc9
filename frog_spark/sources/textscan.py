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


def read_text_as_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Each file is a conversation; each non-empty line a turn.

    Files are read WHOLE (wholetext) and split line-wise with posexplode:
    per-line reads order lines by monotonically_increasing_id across
    splits, which is only coincidentally correct when a file exceeds one
    input split — wholetext makes line order contractual (transcript
    files are conversation-sized, far below executor memory). conv_id is
    the file's path RELATIVE to the scan root — a bare basename would
    collide same-named files in different directories into one
    conversation with duplicate (conv_id, turn_idx) keys."""
    df = spark.read.text(path, wholetext=True).withColumn(
        "file", F.input_file_name()
    )
    root = path.rstrip("/") + "/"
    conv = F.regexp_replace(
        F.regexp_replace("file", r"^file:/*", "/"), F.lit(root), F.lit("")
    )
    lines = df.select(
        conv.alias("conv_id"),
        F.posexplode(F.split("value", "\n")).alias("line_no", "text"),
    ).filter(F.length(F.trim("text")) > 0)
    w = Window.partitionBy("conv_id").orderBy("line_no")
    return lines.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
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
