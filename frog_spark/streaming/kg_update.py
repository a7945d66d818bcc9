"""Continuous KG maintenance (X63): Structured Streaming upkeep of the
accumulated fact table.

A transcript KG at 10^12-turn scale is never rebuilt from scratch —
observation batches arrive continuously and fold into the standing
fact summary. This module runs that fold as a streaming job:
``readStream`` over an observation directory → ``foreachBatch`` →
``merge_triples`` (the Iceberg MERGE INTO emulation, kg/evolve.py)
against a VERSIONED parquet fact table. Because merge_triples combines
summaries associatively (n_obs sums, seen-windows widen via min/max),
the streamed fold equals the batch recompute over all observations —
test-asserted, which is the invariant that makes the maintenance job
trustworthy.

Durability model (the parquet stand-in for Iceberg snapshots, same as
plans/checkpoint.py): each micro-batch writes a NEW immutable version
directory ``v{batch_id}`` and then atomically repoints the ``_CURRENT``
manifest (os.replace) — readers never observe a half-written table,
re-running a failed batch overwrites its own version dir (idempotent
replay, exactly-once per Spark's foreachBatch + checkpoint contract),
and old versions remain for time travel until vacuumed. The streaming
checkpoint (``checkpointLocation``) makes file discovery resumable:
restarting the query processes only unseen observation files.

Scale notes: the per-batch work is summarize_facts (one fact-key
groupBy over the BATCH, not the history) + merge_triples (one
key-aligned full-outer join against the current table — exchange-free
on a cluster where the fact table lives bucketed by the fact key).
Driver state is the _CURRENT pointer string, nothing else.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

OBS_SCHEMA = "subj string, pred string, obj string, ts timestamp"
_SUMMARY_SCHEMA = (
    "subj string, pred string, obj string, n_obs long, "
    "first_seen timestamp, last_seen timestamp"
)


def current_facts(spark: SparkSession, table_dir: str) -> DataFrame:
    """The standing fact summary — the version the _CURRENT manifest
    points at, or an empty summary before the first batch."""
    cur = os.path.join(table_dir, "_CURRENT")
    if not os.path.exists(cur):
        return spark.createDataFrame([], _SUMMARY_SCHEMA)
    with open(cur, encoding="utf-8") as fh:
        version = fh.read().strip()
    return spark.read.parquet(os.path.join(table_dir, version))


def _merge_base(spark: SparkSession, table_dir: str, batch_id: int) -> DataFrame:
    """The fact summary this batch must merge INTO: normally the version
    ``_CURRENT`` points at, but on a REPLAY (crash after the _CURRENT
    repoint, before the streaming checkpoint committed, so foreachBatch
    re-invokes the same batch_id) _CURRENT already points at
    v{batch_id} — merging into that would fold the batch twice and
    silently double n_obs. The guard: whenever _CURRENT's version id is
    >= batch_id, merge into the newest PREDECESSOR version instead
    (vacuum_versions keeps >= 2 versions, so the predecessor of the
    newest batch always survives); with no predecessor the base is
    empty, exactly the first-batch state."""
    cur = os.path.join(table_dir, "_CURRENT")
    if os.path.exists(cur):
        with open(cur, encoding="utf-8") as fh:
            cur_id = int(fh.read().strip().lstrip("v"))
        if cur_id >= batch_id:
            older = [
                int(d.lstrip("v"))
                for d in os.listdir(table_dir)
                if d.startswith("v") and d.lstrip("v").isdigit()
                and int(d.lstrip("v")) < batch_id
            ]
            if not older:
                return spark.createDataFrame([], _SUMMARY_SCHEMA)
            return spark.read.parquet(os.path.join(table_dir, f"v{max(older)}"))
    return current_facts(spark, table_dir)


def apply_obs_batch(
    spark: SparkSession, batch: DataFrame, table_dir: str, batch_id: int
) -> None:
    """Fold one observation micro-batch into the versioned fact table
    (the foreachBatch body; callable directly for batch backfills).
    Idempotent under foreachBatch replay: see _merge_base."""
    from frog_spark.kg.evolve import merge_triples, summarize_facts

    merged = merge_triples(
        _merge_base(spark, table_dir, batch_id), summarize_facts(batch)
    ).drop("change")
    version = f"v{batch_id}"
    # overwrite = idempotent replay of a failed batch
    merged.write.mode("overwrite").parquet(os.path.join(table_dir, version))
    tmp = os.path.join(table_dir, "_CURRENT.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(version)
    os.replace(tmp, os.path.join(table_dir, "_CURRENT"))  # atomic repoint


def run_fact_maintenance(
    spark: SparkSession,
    obs_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Process all currently-available observation files (availableNow
    trigger) into the fact table, one micro-batch per
    ``max_files_per_trigger`` files, then stop. Re-invoking later picks
    up ONLY files the streaming checkpoint has not seen."""
    stream = (
        spark.readStream.schema(OBS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(obs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, bid: apply_obs_batch(spark, batch, table_dir, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def vacuum_versions(table_dir: str, keep_last: int = 2) -> list[str]:
    """Snapshot expiry for the versioned fact table (the Iceberg
    ``expire_snapshots`` emulation): delete all but the newest
    ``keep_last`` version directories, never touching the one
    ``_CURRENT`` points at.

    Versions are ordered by batch id (v{N}), not directory mtime —
    a replayed old batch must not look fresh. Returns the removed
    version names. Driver-side filesystem work only: the listing is
    one directory read, bounded by the version count, and each
    version is immutable so removal needs no coordination with
    readers of other versions.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    cur_file = os.path.join(table_dir, "_CURRENT")
    current = None
    if os.path.exists(cur_file):
        with open(cur_file, encoding="utf-8") as fh:
            current = fh.read().strip()
    versions = sorted(
        (d for d in os.listdir(table_dir)
         if d.startswith("v") and d[1:].isdigit()),
        key=lambda d: int(d[1:]),
    )
    doomed = [d for d in versions[:-keep_last] if d != current]
    for d in doomed:
        shutil.rmtree(os.path.join(table_dir, d))
    return doomed
