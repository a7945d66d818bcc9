"""spark-submit entry point for the KG analytics/mining/export layer:
relational tables in, graph-analysis + training-export tables out.

Companion to submit_triples_job.py (which covers annotate→triples→
canonicalize→materialize): this job evidences that the X36-X62 layer
runs as a packaged ``spark-submit --py-files`` job too, end to end:

    python -c "import shutil; shutil.make_archive('/tmp/frog_spark', 'zip',
               '/root/repo', 'frog_spark')"
    spark-submit --master local[8] --py-files /tmp/frog_spark.zip \\
        scripts/submit_kg_analytics_job.py \\
        --sf-dir /root/testdata/sf0.01 --output /tmp/kg_analytics_out

Builds the relational KG edge table once, then writes one parquet
table per analysis: degree profile, LPA communities, Adamic-Adar link
predictions, personalized PageRank, weighted distances, and the three
representation-learning exports (neighbor sample, negatives, walks).
On a cluster only --master and the executor conf change.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True, help="dir of TPC-H-ish parquet tables")
    ap.add_argument("--output", required=True, help="output dir for analysis tables")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("frog_spark_kg_analytics").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sys.path.insert(0, "/root/repo")  # __spark_entry__ ships beside this script
    import __spark_entry__ as entry
    from frog_spark.kg.analytics import (
        degree_profile,
        label_propagation,
        personalized_pagerank,
        weighted_distances,
    )
    from frog_spark.kg.mining import link_prediction
    from frog_spark.kg.sampling import negative_samples, neighbor_sample, random_walks

    edges = entry._kg_edges_relational(spark, args.sf_dir).localCheckpoint(eager=True)
    wedges = entry._kg_weighted_edges(spark, args.sf_dir).localCheckpoint(eager=True)
    seeds = edges.filter(
        (F.col("pred") == "buys_from") & F.col("subj").endswith("01")
    ).select("subj")

    out = args.output.rstrip("/")
    jobs = {
        "degree_profile": degree_profile(edges),
        "communities": label_propagation(edges, iters=4),
        "link_predictions": link_prediction(edges, max_neighbor_degree=40, top_k=100),
        "ppr": personalized_pagerank(edges, seeds, iters=5),
        "weighted_distances": weighted_distances(wedges, seeds, k=3),
        "neighbor_sample": neighbor_sample(edges, k=8),
        "negative_samples": negative_samples(edges),
        "random_walks": random_walks(edges, k=4),
    }
    for name, df in jobs.items():
        df.write.mode("overwrite").parquet(f"{out}/{name}")
        n = spark.read.parquet(f"{out}/{name}").count()
        print(f"wrote {name}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
