"""Benchmark distributed model training at e-Lex scale (VERDICT r2 #1).

Trains MBLEM (memory map + suffix-window IGTree) from a synthetic
595k-entry (word, tag, lemma) lexicon — the size of the real e-Lex
training set behind Frog's shipped lemmatizer
(/root/reference/docs/source/advanced.rst:121-136) — entirely as Spark
jobs, and records wall time, driver peak RSS, model size, and a
single-node comparison point at a smaller size (the driver trainer at
595k is the bottleneck this module exists to remove).

Writes BENCH/training_scale.json. Run on an otherwise idle machine:
    FROG_SPARK_DRIVER_MEM=24g python scripts/train_bench.py
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    from frog_spark.models.distributed import (
        mblem_instances,
        synthetic_lexicon,
        train_mblem_distributed,
    )
    from frog_spark.models.igtree import IGTree
    from frog_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("train_bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"cpus": cpus}

    # -- distributed training at e-Lex scale (595k lexicon rows) ----------
    n = 595_000
    lex = synthetic_lexicon(spark, n_rows=n)
    t0 = time.time()
    mblem = train_mblem_distributed(spark, lex)
    wall = time.time() - t0
    out["distributed_595k"] = {
        "lexicon_rows": n,
        "distinct_words": len(mblem.memory),
        "wall_sec": round(wall, 2),
        "driver_peak_rss_mb": round(rss_mb(), 1),
        "tree_nodes": mblem.tree.node_count(),
    }
    print("distributed 595k:", out["distributed_595k"], flush=True)
    # sanity: the model actually works
    lem = mblem.lemmatize("klopte", "WW(pv,verl,ev)")
    assert any(x.endswith("en") for x in lem), lem

    # -- single-node comparison: the full driver-side Mblem.train at the
    # same 595k (collect the lexicon to the driver, Python loop over every
    # row to derive edit classes, single-threaded recursion) — what the
    # round-2 code path would have had to do
    from frog_spark.operators.lemmatizer import Mblem

    t0 = time.time()
    lex_pdf = lex.toPandas()
    triples = list(zip(lex_pdf["word"], lex_pdf["tag"], lex_pdf["lemma"]))
    collect_sec = time.time() - t0
    t0 = time.time()
    single = Mblem.train(triples)
    out["single_node_595k"] = {
        "lexicon_rows": n,
        "collect_sec": round(collect_sec, 2),
        "train_sec": round(time.time() - t0, 2),
        "driver_peak_rss_mb": round(rss_mb(), 1),
        "tree_nodes": single.tree.node_count(),
    }
    print("single-node 595k (full mblem):", out["single_node_595k"], flush=True)

    # tree-build-only cost at 1/8 scale for the per-instance recursion rate
    n_small = 74_375
    pdf = mblem_instances(synthetic_lexicon(spark, n_rows=n_small)).toPandas()
    instances = [list(x) for x in pdf["feats"]]
    classes = list(pdf["cls"])
    order = list(range(len(instances[0]) - 1, -1, -1))
    t0 = time.time()
    IGTree.train(instances, classes, feature_order=order)
    out["single_node_74k_tree_only"] = {
        "instances": len(instances),
        "wall_sec": round(time.time() - t0, 2),
    }
    print("single-node 74k (tree build only):", out["single_node_74k_tree_only"], flush=True)

    # -- MBMA at CELEX scale: ~3.2M char-window instances ------------------
    # (the reference's mbma.igtree trains on 3,179,331 instances,
    # advanced.rst:182-191; ~8.6 chars/word -> ~375k words gets there)
    from frog_spark.models.distributed import train_mbma_distributed

    lex_m = synthetic_lexicon(spark, n_rows=430_000)
    t0 = time.time()
    mbma = train_mbma_distributed(spark, lex_m)
    n_inst = sum(len(v) for v in mbma.memory.values())
    out["mbma_distributed_celex_scale"] = {
        "lexicon_rows": 430_000,
        "memory_words": len(mbma.memory),
        "char_instances": n_inst,
        "wall_sec": round(time.time() - t0, 2),
        "driver_peak_rss_mb": round(rss_mb(), 1),
        "tree_nodes": mbma.tree.node_count(),
    }
    print("mbma distributed (CELEX scale):", out["mbma_distributed_celex_scale"], flush=True)

    # -- MBT (POS tagger) at 1.2M training tokens --------------------------
    # (the reference's tagger corpus is 10.9M tokens, advanced.rst:260-287;
    # 100k 12-word sentences exercise the same extraction + bucketed
    # known/unknown tree builds at 1/9 of that scale in bench-friendly time)
    from frog_spark.models.distributed import (
        synthetic_tagged_corpus,
        train_mbt_distributed,
    )

    corpus = synthetic_tagged_corpus(spark, n_sentences=100_000, vocab_rows=64_000)
    t0 = time.time()
    mbt = train_mbt_distributed(spark, corpus, hash_bucket_groups=256)
    out["mbt_distributed_1m_tokens"] = {
        "sentences": 100_000,
        "tokens": 1_200_000,
        "wall_sec": round(time.time() - t0, 2),
        "driver_peak_rss_mb": round(rss_mb(), 1),
        "lexicon_words": len(mbt.lexicon),
        "known_tree_nodes": mbt.known_tree.node_count(),
        "unknown_tree_nodes": mbt.unknown_tree.node_count(),
    }
    print("mbt distributed (1.2M tokens):", out["mbt_distributed_1m_tokens"], flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BENCH", "training_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
