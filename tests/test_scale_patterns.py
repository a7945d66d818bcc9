"""Skew handling, language gate, cascade-resume tests (north rule K6/K7/T3)."""

import datetime
import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F


def test_hot_conversation_spreads_across_partitions(spark, pipeline):
    """K6: the turn-grain repartition IS the salt — one conversation with
    90% of the turns must not serialize onto one partition."""
    from frog_spark.corpus import TRANSCRIPT_SCHEMA
    from frog_spark.plans.pipeline import annotate_transcripts

    rows = []
    base = datetime.datetime(2025, 1, 1)
    for t in range(180):  # hot conversation
        rows.append(("conv-hot", t, "user", "De verzekering dekt de schade niet.", None, base))
    for c in range(20):  # long tail
        rows.append((f"conv-{c:03d}", 0, "user", "Anna leest een boek.", None, base))
    tdf = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    ann = annotate_transcripts(spark, tdf, pipeline, num_partitions=8)
    per_part = (
        ann.filter("conv_id = 'conv-hot'")
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    # the hot conv's turns land on (almost) all partitions
    assert len(per_part) >= 6, per_part
    counts = [r["count"] for r in per_part]
    assert max(counts) < sum(counts) * 0.5  # no partition owns half the key


def test_language_gate_tokenize_only(pipeline):
    """T3: a non-Dutch sentence gets tokenize-only rows."""
    ann = pipeline.annotate_sentence(
        ["the", "quick", "brown", "fox", "is", "fast"],
        ["WORD"] * 6,
    )
    assert all(a["pos_tag"] == "" for a in ann)
    # Dutch still annotates
    ann = pipeline.annotate_sentence(
        ["De", "kat", "loopt", "."],
        ["WORD", "WORD", "WORD", "PUNCTUATION"],
    )
    assert ann[1]["pos_tag"].startswith("N(")
    # stopword-free garbage ('unk') annotates too (reference default-lang behavior)
    ann = pipeline.annotate_sentence(["xyzzy", "plugh"], ["WORD", "WORD"])
    assert ann[0]["pos_tag"] != ""


def test_resume_cascade_invalidation(spark, pipeline):
    """K7: deleting one stage's state must recompute it AND every later
    stage (their checkpoints may derive from the stale version)."""
    from frog_spark.corpus import transcripts_df
    from frog_spark.kg.materialize import build_graph

    tdf = transcripts_df(spark, n_turns=24).cache()
    base = tempfile.mkdtemp(prefix="frogspark_cascade_")
    try:
        run1 = build_graph(spark, tdf, base, pipeline)
        assert not any(r.resumed for r in run1.results.values())
        # full resume: nothing recomputes
        run2 = build_graph(spark, tdf, base, pipeline)
        assert all(r.resumed for r in run2.results.values())
        # invalidate the middle stage
        os.remove(os.path.join(base, "triples", "_stage_state.json"))
        run3 = build_graph(spark, tdf, base, pipeline)
        assert run3.results["annotated"].resumed  # earlier stage untouched
        assert not run3.results["triples"].resumed  # recomputed
        assert not run3.results["edges"].resumed  # downstream invalidated
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stage_state_json_shape(spark, pipeline):
    from frog_spark.corpus import transcripts_df
    from frog_spark.plans.checkpoint import CheckpointedRun

    tdf = transcripts_df(spark, n_turns=12)
    base = tempfile.mkdtemp(prefix="frogspark_state_")
    try:
        run = CheckpointedRun(spark, base)
        run.stage("t", lambda: tdf)
        with open(os.path.join(base, "t", "_stage_state.json")) as fh:
            st = json.load(fh)
        assert st["status"] == "complete"
        assert st["rows"] == 12
        assert "per_partition_rows" in st["counters"]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_per_module_timers(spark, pipeline):
    """O4: per-module wall time accumulates through the annotation UDF
    into Spark accumulators (TimerBlock analogue, FrogAPI.cxx:2937-2967)."""
    from frog_spark.corpus import transcripts_df
    from frog_spark.plans.pipeline import (
        TIMER_MODULES,
        PipelineTimers,
        annotate_transcripts,
    )

    timers = PipelineTimers(spark)
    tdf = transcripts_df(spark, n_turns=40)
    ann = annotate_transcripts(spark, tdf, pipeline, timers=timers)
    assert ann.count() > 0
    secs = timers.seconds()
    assert set(secs) == set(TIMER_MODULES)
    # the heavy modules must have recorded real time
    assert secs["tagger"] > 0 and secs["parser"] > 0 and secs["mbma"] > 0
    rows = {r["module"]: r["wall_sec"] for r in timers.table(spark).collect()}
    assert rows == {m: secs[m] for m in TIMER_MODULES}


def test_degenerate_turns_survive(spark, pipeline):
    """Empty / whitespace-only / URL / emoji / very-long turns flow through
    annotation and the fused triple path without Arrow failures (an empty
    pandas batch used to default to float64 columns that Arrow cannot cast
    to the array<string> schema)."""
    from frog_spark.plans.pipeline import annotate_transcripts, triples_from_transcripts

    rows = [
        ("c1", 0, "user", "", None, None),
        ("c1", 1, "user", "   ", None, None),
        ("c1", 2, "user", "check https://example.org/x?a=1 en mail me@x.nl!!", None, None),
        ("c1", 3, "user", "🤖🤖 €5,50 ---- @@@@", None, None),
        ("c1", 4, "user", "a" * 5000, None, None),
    ]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    tdf = spark.createDataFrame(rows, schema)
    ann = annotate_transcripts(spark, tdf, pipeline)
    counts = {r["turn_idx"]: r["count"] for r in ann.groupBy("turn_idx").count().collect()}
    assert 0 not in counts and 1 not in counts  # empty turns emit no rows
    assert counts[2] > 0 and counts[3] > 0 and counts[4] == 1
    assert triples_from_transcripts(spark, tdf, pipeline).count() == 0
    # a batch that is ENTIRELY empty turns
    empty = spark.createDataFrame([("c2", 0, "user", "", None, None)], schema)
    assert annotate_transcripts(spark, empty, pipeline).count() == 0


def test_bucketed_join_avoids_shuffle(spark):
    """Co-located joins via bucketing: two tables bucketed on the join key
    sort-merge-join with NO Exchange on either side — the pre-shuffle
    technique a recurring 100-TB join pipeline would use instead of
    re-shuffling per query."""
    from pyspark.sql import functions as F

    spark.sql("DROP TABLE IF EXISTS bq_orders")
    spark.sql("DROP TABLE IF EXISTS bq_customer")
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_id"), (F.col("id") % 200).alias("custkey"),
        (F.rand(7) * 100).alias("price"),
    )
    customer = spark.range(0, 200).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    (orders.write.bucketBy(8, "custkey").sortBy("custkey")
        .mode("overwrite").saveAsTable("bq_orders"))
    (customer.write.bucketBy(8, "custkey").sortBy("custkey")
        .mode("overwrite").saveAsTable("bq_customer"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bq_orders").join(spark.table("bq_customer"), "custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketed scans are pre-partitioned
        assert j.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bq_orders")
        spark.sql("DROP TABLE IF EXISTS bq_customer")


def test_salted_join_matches_plain_join(spark):
    """K6: the salted join returns exactly the plain join's rows while
    spreading a pathologically hot key across salt buckets."""
    from pyspark.sql import functions as F

    from frog_spark.functions.skew import salted_join

    # 90% of the fact rows hit ONE key
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"x{i}") for i in range(0, 5000, 10)],
        "k string, attr string",
    )
    got = salted_join(big, small, "k", salt=8)
    want = big.join(small, "k")
    assert got.count() == want.count()
    assert (
        got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    )
    # the hot key really spreads: its rows carry >1 distinct salt value
    # (AQE may coalesce this tiny test shuffle back into one partition,
    # so assert on the salt distribution rather than physical partitions)
    from pyspark.sql import functions as FF

    salted = big.filter("k = 'hot'").withColumn(
        "_salt",
        FF.pmod(FF.xxhash64(FF.col("k"), FF.monotonically_increasing_id()), FF.lit(8)),
    )
    assert salted.select("_salt").distinct().count() > 4


def test_ivf_partition_pruning(spark, tmp_path):
    """X7's scale claim, demonstrated physically (VERDICT r3 Next #6):
    with the bucketed embedding table WRITTEN partitioned by bucket,
    ivf_topk's bucket filter becomes a partition filter — the scan reads
    exactly n_probe of the n_buckets directory partitions, skipping the
    rest on disk. Asserted from the executed plan's scan metrics
    (numPartitions) after a real collect, plus the PartitionFilters line
    of the formatted plan."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from frog_spark.operators.similarity import (
        assign_buckets,
        ivf_topk,
        train_centroids_distributed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_buckets, n_probe = 8, 2
    cents = train_centroids_distributed(emb, n_centroids=n_buckets)
    path = str(tmp_path / "emb_by_bucket")
    assign_buckets(emb, cents).write.partitionBy("bucket").mode("overwrite").parquet(path)
    bucketed = spark.read.parquet(path)

    query = [float(x) for x in emb.first()["embedding"]]
    got = ivf_topk(bucketed, cents, query, k=5, n_probe=n_probe)
    rows = got.collect()
    assert 0 < len(rows) <= 5

    # logical evidence: the bucket predicate is a PARTITION filter
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan_txt = buf.getvalue()
    assert "PartitionFilters" in plan_txt
    pf_line = next(l for l in plan_txt.splitlines() if "PartitionFilters" in l)
    assert "bucket" in pf_line and "IN" in pf_line, pf_line

    # physical evidence: the executed scan touched n_probe partitions
    def scan_metrics(node, out):
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            out.append((node.nodeName(), kv._1(), kv._2().value()))
        ch = node.children().iterator()
        while ch.hasNext():
            scan_metrics(ch.next(), out)

    metrics = []
    scan_metrics(got._jdf.queryExecution().executedPlan(), metrics)
    parts = [v for name, k, v in metrics if "Scan" in name and k == "numPartitions"]
    assert parts, metrics
    assert parts[0] == n_probe, f"scan read {parts[0]} partitions, wanted {n_probe}"


def test_x_batch_plans_stay_jvm_side(spark):
    """X21-X26 plan-shape gates (mirrors the BASELINE.md audit rows):
    pure-JVM plans (no Python evaluation nodes), BM25's df side
    broadcast with a TakeOrdered top-k, gopher's ReadSchema pruned."""
    import contextlib
    import io

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    qs = entry.queries()

    def plan(name):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf).explain("formatted")
        return buf.getvalue()

    for name in ("txt_gopher_repetition", "rel_bm25_topk",
                 "doc_stratified_sample", "txt_surprisal",
                 "dedup_exact_substring", "txt_lang_divergence"):
        p = plan(name)
        assert "BatchEvalPython" not in p and "MapInPandas" not in p, name
        assert "ArrowEvalPython" not in p, name

    p = plan("rel_bm25_topk")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p.split("TakeOrderedAndProject")[0]

    p = plan("txt_gopher_repetition")
    schema_line = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "doc_id" in schema_line and "text" in schema_line
    assert "lang" not in schema_line and "source" not in schema_line
