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
    # input_file_name() yields a percent-encoded file URI. Decode it
    # (protecting literal '+', which url_decode would turn into a
    # space), then strip the scan root as a PREFIX, not a regex: a root
    # containing regex metacharacters ('+', '(', ...) would throw or
    # silently fail to strip inside regexp_replace.
    fixed = F.url_decode(
        F.regexp_replace(F.regexp_replace("file", r"^file:/*", "/"), r"\+", "%2B")
    )
    conv = F.when(
        fixed.startswith(root), F.substring(fixed, len(root) + 1, 1 << 30)
    ).otherwise(fixed)
    lines = df.select(
        conv.alias("conv_id"),
        # \r?\n: wholetext keeps CRLF line endings that the old per-line
        # reader stripped — splitting on bare \n leaves a trailing \r on
        # every turn of a CRLF file
        F.posexplode(F.split("value", "\r?\n")).alias("line_no", "text"),
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
