"""Emulates the driver's correctness gate: runs every __spark_entry__
query on Spark AND its DuckDB oracle at sf0.01, compares row count +
column names + order-insensitive values (sorted columns, sorted rows)."""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from frog_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] or None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            # normalize resolution (Spark: ns, DuckDB: us)
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    spark = get_spark("contract", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        n_run += 1
        t0 = time.time()
        try:
            got = fn(spark, SF).toPandas()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL {name}: spark error {str(ex)[:300]}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(got)} rows ({el:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"FAIL {name}: oracle error {str(ex)[:300]}")
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"schema {list(g.columns)} vs {list(w.columns)}"))
            print(f"FAIL {name}: schema mismatch\n  spark {list(g.columns)}\n  duck  {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} vs {len(w)}"))
            print(f"FAIL {name}: row count {len(g)} vs {len(w)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"ok   {name}: MATCH {len(g)} rows ({el:.1f}s)")
        except AssertionError as ex:
            failures.append((name, "value mismatch"))
            print(f"FAIL {name}: value mismatch\n{str(ex)[:500]}")
            diff = g.compare(w) if g.shape == w.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(5))
    # count only what actually ran: with an ONLY filter the old
    # f"{len(qs)-len(failures)}/{len(qs)}" footer read as a full-suite
    # pass when most queries were skipped
    skipped = len(qs) - n_run
    note = f" ({skipped} skipped by filter)" if skipped else ""
    print(f"\n{n_run - len(failures)}/{n_run} pass{note}")
    if failures:
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
