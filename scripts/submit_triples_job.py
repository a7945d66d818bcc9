"""spark-submit entry point: transcripts parquet in, triple tables out.

The north rule requires the pipeline to run via
``spark-submit --py-files`` on a multi-executor cluster. This is that
job, runnable unchanged on a cluster or locally:

    python -c "import shutil; shutil.make_archive('/tmp/frog_spark', 'zip',
               '/root/repo', 'frog_spark')"
    FROG_SPARK_RESOURCES=/root/repo/resources \\
    spark-submit --master local[8] --py-files /tmp/frog_spark.zip \\
        scripts/submit_triples_job.py --n-turns 2000 --output /tmp/kg_out

On a real cluster only --master and the executor conf change; model
resources ship either via FROG_SPARK_RESOURCES on a shared mount or by
adding resources/ to --files. The job trains from the committed gold
corpus on the driver, broadcasts the pipeline, annotates with the
one-shuffle plan, extracts triples, and materializes node/edge tables
with stage checkpointing (resumable).
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir of (conv_id, turn_idx, role, text, tool, ts)")
    ap.add_argument("--n-turns", type=int, default=2000, help="synthesize this many turns when no --input")
    ap.add_argument("--output", required=True, help="output dir for triples/nodes/edges parquet")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("frog_spark_triples").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from frog_spark.corpus import transcripts_df_distributed
    from frog_spark.kg.materialize import build_graph

    if args.input:
        tdf = spark.read.parquet(args.input)
    else:
        tdf = transcripts_df_distributed(
            spark, args.n_turns, partitions=spark.sparkContext.defaultParallelism
        )
    # the full checkpointed build: annotate -> triples -> entity spans ->
    # linking -> canonicalization -> node/edge tables, every stage a
    # resumable parquet table with per-partition counters
    run = build_graph(spark, tdf, args.output)
    for name, res in run.results.items():
        print(
            f"STAGE {name} rows={res.rows} partitions={res.partitions} "
            f"elapsed={res.elapsed_sec:.1f}s resumed={res.resumed}",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
