"""Generate golden-parquet oracles for the annotation-derived kg_* queries.

The per-sentence NLP (MBT tagging, Eisner CKY parsing) is not
SQL-expressible, so these queries cannot have a DuckDB *formula* oracle.
Instead we follow the reference's own test philosophy — golden files
diffed on every run (reference/src/tst.sh:1-4 checks frog output against
tests/*.ok) — lifted to the driver's rows+schema+value-hash machinery:
the expected output is generated ONCE by this script, reviewed, and
committed to resources/golden/<query>.parquet; the oracle SQL is then
simply DuckDB's read_parquet of that file. Any regression in tokenizer,
tagger, lemmatizer, MBMA, NER, MWU, parser, triple lift, linking, or
canonicalization flips the hash.

Inputs are fully deterministic: transcripts_df is a seeded synthetic
corpus, documents.parquet at sf0.01 is driver-written and read-only, and
every model trains deterministically from the committed gold corpus.

Run:  python scripts/make_goldens.py            # writes resources/golden/
      python scripts/make_goldens.py --check    # regenerates and diffs
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_QUERIES = [
    # sim_ivf_topk is approximate by CONSTRUCTION but fully deterministic
    # (seeded distributed k-means; verified hash-identical across
    # processes and parallelism levels), so a golden captures it exactly;
    # its recall vs the exact top-k oracle is separately test-asserted.
    "sim_ivf_topk",
    # mm_media_meta's decode is the documented FAKE codec (real image/
    # audio libraries absent in this environment) — but the Spark
    # machinery around it (binary schema, Arrow batching, frame
    # sampling arithmetic) is real and deterministic, so the golden
    # pins exactly that.
    "mm_media_meta",
    "kg_annotated",
    "kg_entity_spans",
    "kg_triples",
    "kg_canonical_nodes",
    "kg_cooccur_topk",
    "kg_two_hop",
]
SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness-gate scale
GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources", "golden"
)


def main() -> int:
    check = "--check" in sys.argv
    import __spark_entry__ as entry
    from frog_spark.session import get_spark

    spark = get_spark("make_goldens", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    qs = entry.queries()
    rc = 0
    for name in GOLDEN_QUERIES:
        pdf = qs[name](spark, SF_DIR).toPandas()
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        if check:
            want = pd.read_parquet(path)
            same = want.shape == pdf.shape and want.equals(
                pdf.astype(want.dtypes.to_dict())
            )
            print(f"{name}: rows={len(pdf)} match={same}")
            rc |= 0 if same else 1
        else:
            # single plain parquet file (not a Spark part-directory) so the
            # DuckDB oracle is a one-line read_parquet
            pdf.to_parquet(path, index=False)
            print(f"{name}: wrote {len(pdf)} rows -> {path}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
