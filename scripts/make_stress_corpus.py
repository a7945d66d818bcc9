"""Regenerate the sf=1.0 stress corpus used for optimization-round
validation at driver scale (sandbox resets wipe /root/stress, so the
recipe lives here; OPTIMIZATION_r06.md "Measurement setup").

Recipe, statistically matched to the driver's own sf=1.0 generation:

* documents — GENERATED, not replicated: 50,000 docs drawn word-by-word
  from sf0.1's actual vocabulary with sf0.1's length distribution, plus
  5% near-dup clones with " dup" appended (52,500 rows). This matches
  the driver's generator shape: near-zero EXACT duplicates (the driver's
  sf0.1 table is 4,992 distinct normalized texts in 5,000 docs), which
  matters because dedup-operator costs depend on the duplication factor.
  A replica-built documents table (an earlier regeneration of this
  corpus) is 10x exact duplicates — a different workload that makes
  text-grain contraction look far better than the driver's data does;
  see OPTIMIZATION_r06.md "continuation session".
* every other table — 10x key-shifted sf0.1 replicas with join keys
  shifted consistently on both sides (custkey in customer+orders,
  orderkey in orders+lineitem, partkey/suppkey in part/supplier(+
  lineitem), vec_id in embeddings, event/user ids in events);
  dimension tables region/nation stay as-is.

Usage: python scripts/make_stress_corpus.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /root/stress/sf1.0
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10
OFF = 10_000_000  # key shift per replica — far above any sf0.1 key
N_DOCS = 50_000
CLONE_FRACTION = 0.05

# table -> columns that carry entity/join keys to shift per replica
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
PASSTHROUGH = ["region", "nation"]


def replicate(table: pa.Table, keys: list[str]) -> pa.Table:
    parts = []
    for r in range(REPLICAS):
        t = table
        for k in keys:
            shifted = pc.add(t[k], pa.scalar(r * OFF, type=t[k].type))
            t = t.set_column(t.schema.get_field_index(k), k, shifted)
        parts.append(t)
    return pa.concat_tables(parts)


def gen_documents(src: str) -> pa.Table:
    t = pq.read_table(f"{src}/documents.parquet")
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    srcs = t.column("source").to_pylist()
    vocab = sorted({w for s in texts if s for w in s.split()})
    lens = [len(s.split()) for s in texts if s]
    rng = random.Random(4242)
    ids, out_texts, out_langs, out_srcs, ncs = [], [], [], [], []
    for i in range(N_DOCS):
        words = [rng.choice(vocab) for _ in range(rng.choice(lens))]
        s = " ".join(words)
        ids.append(i)
        out_texts.append(s)
        out_langs.append(rng.choice(langs))
        out_srcs.append(rng.choice(srcs))
        ncs.append(len(s))
    for j, i in enumerate(sorted(rng.sample(range(N_DOCS), int(N_DOCS * CLONE_FRACTION)))):
        s = out_texts[i] + " dup"
        ids.append(1_000_000 + j)
        out_texts.append(s)
        out_langs.append(out_langs[i])
        out_srcs.append(out_srcs[i])
        ncs.append(len(s))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": out_texts,
            "lang": out_langs,
            "source": out_srcs,
            "n_chars": pa.array(ncs, pa.int64()),
        }
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/stress/sf1.0"
    os.makedirs(dst, exist_ok=True)

    for name in PASSTHROUGH:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"), f"{dst}/{name}.parquet")
        print(f"{name}: passthrough")

    docs = gen_documents(src)
    pq.write_table(docs, f"{dst}/documents.parquet")
    print(f"documents: generated {docs.num_rows}")

    for name, keys in KEY_COLS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        big = replicate(t, keys)
        pq.write_table(big, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {big.num_rows}")

    open(f"{dst}/_DONE", "w").close()
    print(f"done -> {dst}")


if __name__ == "__main__":
    main()
