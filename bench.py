"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

The headline number for the north rule is end-to-end triple-extraction
throughput (turns/sec) over a synthetic transcript corpus scaled to the
SF; the relational/dedup/similarity queries run against the driver's
parquet tables. Scaling-efficiency evidence (local[8] vs local[32]) is
produced by scripts/scaling_bench.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from frog_spark.corpus import transcripts_df_distributed
    from frog_spark.plans.pipeline import (
        FrogPipeline,
        PipelineTimers,
        triples_from_transcripts,
    )
    from frog_spark.session import get_spark

    import __spark_entry__ as entry

    os.environ.setdefault("FROG_SPARK_DRIVER_MEM", "48g")
    spark = get_spark("frog_spark_bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # this sandbox VM shows double-digit CPU steal: identical jobs swing
    # 1.5-2x run to run. Per-query MIN over REPS back-to-back executions
    # is the standard steal-robust protocol (same one
    # scripts/scaling_bench.py uses); REPS=2 doubles bench wall time but
    # makes round-over-round numbers comparable.
    # clamp to >=1: reps=0 would skip every loop, leave kg_sec=inf and
    # emit non-standard Infinity in the result JSON
    reps = max(1, int(os.environ.get("FROG_SPARK_BENCH_REPS", "2")))

    queries: dict[str, float] = {}
    t_suite = time.time()

    # --- headline: end-to-end triple extraction throughput ---------------
    # Steal-robust since round 4: min over ``reps`` runs, each on a
    # DIFFERENT seeded corpus of the same size (the scaling bench's
    # per-rep-variant protocol). A repeat of the SAME corpus would hit
    # the executors' per-worker sentence cache (annotate_sentence
    # memoization) and measure warm-cache lookups; distinct seeds keep
    # every rep a full pipeline run while the min still filters the
    # VM's documented 1.5-2x CPU-steal outliers. An untimed warm-up run
    # primes Python workers + the model broadcast first.
    n_turns = max(int(sf * 100_000), 2000)
    pipe = FrogPipeline.build()
    # model-size telemetry (VERDICT r4 #4): the broadcast payload per
    # executor — watch it round over round so model growth that would
    # stress the scaling gate is visible in the bench artifact itself
    import pickle

    model_mb = round(len(pickle.dumps(pipe, protocol=4)) / 1e6, 2)
    warm = transcripts_df_distributed(spark, 2000, partitions=cpus, variants=True, seed=999)
    triples_from_transcripts(spark, warm, pipe, num_partitions=cpus).count()
    kg_sec = float("inf")
    actual_turns = n_triples = 0
    module_sec: dict[str, float] = {}
    for rep in range(reps):
        tdf = transcripts_df_distributed(
            spark, n_turns, partitions=cpus, variants=True, seed=42 + rep
        ).persist()
        turns_rep = tdf.count()  # materialize input outside the timed region
        timers = PipelineTimers(spark)  # O4 per-module wall time
        t0 = time.time()
        triples_rep = triples_from_transcripts(
            spark, tdf, pipe, num_partitions=cpus, timers=timers
        ).count()
        sec = time.time() - t0
        tdf.unpersist()
        if sec < kg_sec:
            kg_sec = sec
            actual_turns, n_triples = turns_rep, triples_rep
            module_sec = {m: round(v, 3) for m, v in timers.seconds().items()}
    queries["kg_triple_extraction"] = round(kg_sec, 3)
    turns_per_sec = actual_turns / kg_sec

    # --- untimed JVM warmup ------------------------------------------------
    # The first execution of the array-function path (split/array_distinct/
    # array_intersect) AFTER the Arrow/pandas stages pays a one-time JIT
    # compile/deopt cost of ~9-15 s on this JVM (measured; a fresh session
    # runs the same query cold in ~2 s). A 100-TB scan amortizes that to
    # zero; a 5000-row bench does not — so warm the path once, untimed, and
    # let the per-query numbers measure steady state.
    from frog_spark.operators.textstats import quality_features

    docs_warm = spark.read.parquet(f"{sf_dir}/documents.parquet")
    quality_features(docs_warm).write.format("noop").mode("overwrite").save()

    # --- driver-table queries --------------------------------------------
    qs = entry.queries()
    for name in [
        "rel_q1_pricing_summary",
        "rel_broadcast_segment_revenue",
        "rel_star_join",
        "rel_sessionize",
        "rel_hourly_window",
        "txt_quality",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash",
        "dedup_simhash",
        "sim_cosine_topk",
    ]:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        queries[name] = round(best, 3)

    total = time.time() - t_suite
    # the headline suite number is the sum of per-query steal-robust
    # minima — comparable across rounds regardless of reps; the raw
    # multi-rep wall time ships alongside for transparency
    suite = sum(queries.values())
    print(
        json.dumps(
            {
                "metric": "e2e_suite_sec",
                "value": round(suite, 3),
                "wall_sec_all_reps": round(total, 3),
                "reps": reps,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "n_turns": actual_turns,
                "n_triples": n_triples,
                "turns_per_sec": round(turns_per_sec, 1),
                "module_sec": module_sec,
                "model_mb": model_mb,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
