"""Graph materialization: the full checkpointed KG-construction run
(SURVEY.md §2.11, K5-K7).

transcripts -> annotate -> triples -> entity forms -> similarity edges
-> canonical ids -> node + edge tables, every stage checkpointed with
per-partition counters (plans/checkpoint.py) so any stage is resumable.

Skew handling (K6): the annotation stage already repartitions by
(conv_id, turn_idx) — the turn-grain key spreads hot conversations
(a conv with 10^6 turns lands on many partitions while each turn stays
whole), which IS the salting strategy at transcript scale; downstream
node/edge writes partition by a hash bucket of the canonical id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frog_spark.kg.canonicalize import canonical_entities
from frog_spark.kg.linking import similarity_edges
from frog_spark.kg.triples import entity_spans, extract_triples
from frog_spark.plans.checkpoint import CheckpointedRun
from frog_spark.plans.pipeline import FrogPipeline, annotate_transcripts


def build_graph(
    spark: SparkSession,
    transcripts: DataFrame,
    base_dir: str,
    pipeline: FrogPipeline | None = None,
    num_partitions: int | None = None,
) -> CheckpointedRun:
    """End-to-end KG build; returns the run (read tables off run.results)."""
    pipe = pipeline or FrogPipeline.build()
    run = CheckpointedRun(spark, base_dir)

    annotated = run.stage(
        "annotated",
        lambda: annotate_transcripts(spark, transcripts, pipe, num_partitions),
    )
    # annotated is parquet-backed here (checkpointed), so no extra persist
    triples = run.stage("triples", lambda: extract_triples(annotated))
    ents = run.stage("entities", lambda: entity_spans(annotated))

    forms = ents.select(F.col("span_text").alias("form")).distinct()
    edges_sim = run.stage("similarity_edges", lambda: similarity_edges(forms))
    canon = run.stage(
        "canonical", lambda: canonical_entities(forms, edges_sim)
    )

    def nodes_fn() -> DataFrame:
        # node category by majority (deterministic: max (count, cat));
        # F.first() without ordering made rerun output nondeterministic
        # for entities whose mentions carry two categories
        cat_counts = (
            ents.join(canon, ents.span_text == canon.form)
            .groupBy("canonical_id", "ner_cat")
            .agg(F.count("*").alias("c"))
            .groupBy("canonical_id")
            .agg(F.max(F.struct("c", "ner_cat")).alias("top"))
            .select("canonical_id", F.col("top.ner_cat").alias("ner_cat"))
        )
        return (
            ents.join(canon, ents.span_text == canon.form)
            .groupBy("canonical_id")
            .agg(
                F.collect_set("span_text").alias("forms"),
                F.count("*").alias("mention_count"),
            )
            .join(cat_counts, "canonical_id")
            .withColumn("bucket", F.pmod(F.xxhash64("canonical_id"), F.lit(16)))
        )

    def edges_fn() -> DataFrame:
        # NO broadcast hint: the canonical table is one row per distinct
        # entity surface, which at the design scale (10^12 turns) far
        # exceeds Spark's broadcast-size cap. A plain equi-join lets AQE
        # choose broadcast when the table is actually small.
        subj_c = canon.select(
            F.col("form").alias("subj"), F.col("canonical_id").alias("subj_id")
        )
        obj_c = canon.select(
            F.col("form").alias("obj"), F.col("canonical_id").alias("obj_id")
        )
        return (
            triples.join(subj_c, "subj", "left")
            .join(obj_c, "obj", "left")
            .withColumn("subj_id", F.coalesce("subj_id", "subj"))
            .withColumn("obj_id", F.coalesce("obj_id", "obj"))
            .select(
                "subj_id", "pred", "obj_id", "subj", "obj",
                "subj_cat", "obj_cat", "source",
                "conv_id", "turn_idx", "sent_idx",
            )
        )

    run.stage("nodes", nodes_fn, partition_by=["bucket"])
    run.stage("edges", edges_fn)
    return run
