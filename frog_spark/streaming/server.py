"""Streaming annotation (SURVEY.md §2.1 S3 analogue).

The reference's TCP server (run_a_server, /root/reference/src/FrogAPI.cxx:
1301-1355: fork-per-connection, text-until-EOT, reply + READY) is stateless
per request — its Spark-native analogue is Structured Streaming over a
transcript stream: readStream -> the SAME annotation stage chain ->
writeStream. ``foreachBatch`` reuses annotate_transcripts verbatim, so
batch and streaming share one code path (the reference achieves the same
by funnelling both modes into frog_sentence).

A watermark on ts bounds state for any downstream windowed aggregation
(e.g. triples-per-conversation-per-hour); the annotation itself is
stateless per turn so late data needs no special handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from frog_spark.plans.pipeline import FrogPipeline, annotate_transcripts


def annotate_stream(
    spark: SparkSession,
    stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    pipeline: FrogPipeline | None = None,
) -> StreamingQuery:
    """stream: a streaming DataFrame with the transcript schema.
    Writes annotated tokens to parquet partitioned by batch_id.

    Effectively-once semantics: foreachBatch alone is only at-least-once
    (a micro-batch that fails after a partial write is retried), so the
    write is made IDEMPOTENT — each batch dynamically overwrites its own
    batch_id=<id> partition; a retry replaces the partial output instead
    of appending duplicates."""
    pipe = pipeline or FrogPipeline.build()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ann = annotate_transcripts(spark, batch_df, pipe)
        (
            ann.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_path)
        )

    # no watermark here: foreachBatch has no stateful operator to bound
    # (late-data handling lives in windowed_turn_counts, which sets its
    # own watermark); a watermark ahead of foreachBatch would be a no-op
    # that only suggests otherwise
    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def windowed_turn_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming tumbling-window turn counts per conversation with a
    watermark bounding late-data state (SURVEY.md §2.1 S3: 'watermarks +
    windowed aggs for late data'). Works identically on a batch frame
    (same code path, no watermark state)."""
    wm = stream.withWatermark("ts", watermark) if stream.isStreaming else stream
    return (
        wm.groupBy(F.window("ts", window).alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("w").start.alias("window_start"), "conv_id", "n_turns"
        )
    )


def file_stream_source(spark: SparkSession, path: str) -> DataFrame:
    """Micro-batch file source with the transcript schema (the sandbox
    stand-in for a Kafka topic of turns)."""
    from frog_spark.corpus import TRANSCRIPT_SCHEMA

    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )
