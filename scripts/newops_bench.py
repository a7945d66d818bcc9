"""One-off micro-bench for the round-5 non-model operator batches
(X31-X40) at sf0.1 / local[32]: per-query MIN of REPS noop-sink runs,
same steal-robust protocol as bench.py. Prints one JSON line; recorded
as a disclosed row in BENCH/BASELINE.md (NOT part of the driver's
BENCH_r{N} headline, whose query list stays fixed for round-over-round
comparability)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# default batch; pass query names as argv to bench a subset
NAMES = sys.argv[1:] or [
    "conv_session_stats",
    "txt_bigram_surprisal",
    "conv_canned_turns",
    "conv_context_windows",
    "conv_tool_transitions",
    "txt_url_filter",
    "doc_length_profile",
    "kg_degree_profile",
    "kg_pagerank",
    "kg_triangles",
    "kg_merge_triples",
    "kg_fact_windows",
    "kg_facts_asof",
    "kg_khop",
    "kg_cooccur_pmi",
    "kg_scd2_history",
    "kg_merge_components",
    "kg_snapshot_diff",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(1, int(os.environ.get("FROG_SPARK_BENCH_REPS", "2")))

    import __spark_entry__ as entry
    from frog_spark.session import get_spark

    spark = get_spark("newops_bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out: dict[str, float] = {}
    for name in NAMES:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "reps": reps, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
