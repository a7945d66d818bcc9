"""spark-submit entry point (north rule: runs via spark-submit --py-files).

    spark-submit --py-files frog_spark.zip -m frog_spark ...   # cluster
    python -m frog_spark <command> ...                          # local

Commands:
    annotate  --input DIR --output DIR [--partitions N]
    kg        --input DIR --output DIR [--partitions N]   (checkpointed; resumable)
    triples   --input DIR --output DIR [--partitions N]   (one-stage lift)
    demo      [--turns N]                                  (synthetic corpus)

--input reads parquet with the transcript schema
(conv_id, turn_idx, role, text, tool, ts).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="frog_spark", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("annotate", "kg", "triples"):
        p = sub.add_parser(name)
        p.add_argument("--input", required=True)
        p.add_argument("--output", required=True)
        p.add_argument("--partitions", type=int, default=None)
    d = sub.add_parser("demo")
    d.add_argument("--turns", type=int, default=120)
    args = ap.parse_args(argv)

    from frog_spark.plans.pipeline import (
        FrogPipeline,
        annotate_transcripts,
        triples_from_transcripts,
    )
    from frog_spark.session import get_spark

    spark = get_spark(f"frog_spark_{args.cmd}")
    spark.sparkContext.setLogLevel("WARN")
    pipe = FrogPipeline.build()

    if args.cmd == "demo":
        from frog_spark.corpus import transcripts_df

        tdf = transcripts_df(spark, n_turns=args.turns)
        t = triples_from_transcripts(spark, tdf, pipe)
        print(json.dumps({"turns": args.turns, "triples": t.count()}))
        t.show(20, truncate=False)
        return 0

    tdf = spark.read.parquet(args.input)
    if args.cmd == "annotate":
        ann = annotate_transcripts(spark, tdf, pipe, args.partitions)
        ann.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"rows": spark.read.parquet(args.output).count()}))
    elif args.cmd == "triples":
        t = triples_from_transcripts(spark, tdf, pipe, args.partitions)
        t.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"triples": spark.read.parquet(args.output).count()}))
    elif args.cmd == "kg":
        from frog_spark.kg.materialize import build_graph

        run = build_graph(spark, tdf, args.output, pipe, args.partitions)
        print(json.dumps(run.manifest(), indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
