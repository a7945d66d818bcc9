"""Regenerate the sf=1.0 stress corpus used for optimization-round
validation at driver scale (sandbox resets wipe /root/stress, so the
recipe lives here; OPTIMIZATION_r06.md "Measurement setup").

Recipe (statistically matched to the driver's sf=1.0 generation): 10x
key-shifted replicas of every sf0.1 table, with join keys shifted
consistently on both sides (custkey in customer+orders, orderkey in
orders+lineitem, partkey/suppkey in part/supplier+lineitem, doc ids in
documents+embeddings); dimension tables region/nation stay as-is.
documents additionally gets 5% near-dup clones with " dup" appended
(52,500 docs total) so the dedup queries see a realistic duplicate rate.

Usage: python scripts/make_stress_corpus.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /root/stress/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10
OFF = 10_000_000  # key shift per replica — far above any sf0.1 key

# table -> columns that carry entity/join keys to shift per replica
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
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


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/stress/sf1.0"
    os.makedirs(dst, exist_ok=True)

    for name in PASSTHROUGH:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"), f"{dst}/{name}.parquet")
        print(f"{name}: passthrough")

    for name, keys in KEY_COLS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        big = replicate(t, keys)
        if name == "documents":
            # 5% near-dup clones: deterministic pick, " dup" appended,
            # fresh ids above every replica's range
            rng = np.random.default_rng(0x57E55)
            idx = rng.choice(big.num_rows, size=big.num_rows // 20, replace=False)
            idx.sort()
            clone = big.take(idx)
            clone = clone.set_column(
                clone.schema.get_field_index("doc_id"),
                "doc_id",
                pc.add(clone["doc_id"], pa.scalar(REPLICAS * OFF, type=pa.int64())),
            )
            duptext = pc.binary_join_element_wise(
                pc.cast(clone["text"], pa.string()), " dup", ""
            )
            clone = clone.set_column(
                clone.schema.get_field_index("text"), "text", duptext
            )
            big = pa.concat_tables([big, clone])
        pq.write_table(big, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {big.num_rows}")

    open(f"{dst}/_DONE", "w").close()
    print(f"done -> {dst}")


if __name__ == "__main__":
    main()
