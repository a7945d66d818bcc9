"""Extra benchmark tooling for the optimization rounds (bench.py is frozen).

Per-query noop-sink isolation timing (guide §1.4) + .explain("formatted")
capture for any subset of the declared queries, at any SF dir.

Usage:
  python bench_extra.py --sf-dir /root/stress/sf1.0 --reps 2 \
      --queries dedup_simhash,dedup_minhash [--explain-dir plans/r06] [--tag before]

Prints one JSON line {"queries": {name: best_sec}, "sf_dir": ..., "reps": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
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
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--explain-dir", default=None, help="write <query>_<tag>.txt explain files here")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from frog_spark.session import get_spark

    import __spark_entry__ as entry

    os.environ.setdefault("FROG_SPARK_DRIVER_MEM", "48g")
    spark = get_spark("frog_spark_bench_extra", cores=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    qs = entry.queries()

    if not args.no_warm:
        # same untimed JVM warmup bench.py does for the array-function path
        from frog_spark.operators.textstats import quality_features

        docs_warm = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        quality_features(docs_warm).write.format("noop").mode("overwrite").save()

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        if args.explain_dir:
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        best = float("inf")
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"#  {name}: {out[name]}s", file=sys.stderr, flush=True)

    print(json.dumps({"queries": out, "sf_dir": args.sf_dir, "reps": args.reps, "cpus": args.cpus, "sum": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
