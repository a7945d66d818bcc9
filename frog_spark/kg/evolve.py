"""KG evolution over time: incremental fact-table merge (X41) and
temporal validity windows with conflict detection (X42).

A KG built from 10^12 turns of transcripts is never built once — new
batches arrive and facts change. The reference emits triples for one
corpus and stops (src/tst.sh golden); these operators are the
at-scale continuation:

* ``merge_triples`` — the Iceberg MERGE INTO emulation for the
  accumulated fact table (this repo's Iceberg stand-in is parquet +
  manifests, see plans/checkpoint.py): a full-outer join of the base
  and batch fact summaries on the (subj, pred, obj) key, combining
  observation counts and widening the seen-window, with each row
  labeled inserted/updated/unchanged (what a MERGE's matched clauses
  would do). One key shuffle per side; at scale both tables live
  bucketed by the fact key, making the merge exchange-free.
* ``fact_windows`` — collapse raw (subj, pred, obj, ts) observations
  to per-fact validity windows [first_seen, last_seen] and flag
  CONFLICTS: a different obj for the same (subj, pred) whose window
  overlaps. Overlap detection is the sort-based interval scan, not a
  self-join: within each (subj, pred), facts sorted by
  (first_seen, obj) conflict with a predecessor iff the running max
  of predecessor last_seen reaches their first_seen, and with a
  successor iff the next first_seen is within their last_seen —
  any overlapping pair is caught from one of its two sides. Two
  window passes over one (subj, pred) partitioning: one shuffle
  after the per-fact aggregate.
* ``facts_asof`` — the time-travel read over the fact table: facts
  whose window contains the query timestamp, ranked per (subj, pred)
  by evidence so ``pos = 1`` is the deterministic best answer to
  "what was X's pred at time T". The snapshot is a filter plus ONE
  (subj, pred) window over the already-aggregated facts — no join
  against the observation log.
* ``snapshot_diff`` — what changed between two as-of reads: the
  pos=1 (best-evidence) answer per (subj, pred) at T1 full-outer
  joined against the one at T2, labeled added / removed / changed /
  unchanged. One window pass per snapshot over the shared
  (subj, pred) partitioning plus the key-aligned join — at scale the
  two snapshots come from the same bucketed fact table, so the join
  is exchange-free.
* ``scd2_history`` — the warehouse-style type-2 dimension build:
  collapse the (subj, pred) observation stream into consecutive
  same-obj runs, each an effective-dated row [valid_from, valid_to)
  with the open row closed by the SCD2_OPEN_END sentinel (no NULL
  bounds). Run detection is the gaps-and-islands running sum of
  change flags; the change-flag lag, the run-id sum, and the
  valid_to lead all reuse the ONE (subj, pred) exchange, and the
  per-run aggregate's (subj, pred, run_id) grouping is satisfied by
  that same partitioning — one shuffle end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KEY = ["subj", "pred", "obj"]


def merge_triples(base: DataFrame, batch: DataFrame) -> DataFrame:
    """Merge two fact summaries (subj, pred, obj, n_obs, first_seen,
    last_seen) into one, labeling each output row's change status.

    Output: key + merged (n_obs, first_seen, last_seen) +
    change in {'inserted', 'updated', 'unchanged'}.
    """
    b = base.select(
        *_KEY,
        F.col("n_obs").alias("base_n"),
        F.col("first_seen").alias("base_first"),
        F.col("last_seen").alias("base_last"),
    )
    n = batch.select(
        *_KEY,
        F.col("n_obs").alias("batch_n"),
        F.col("first_seen").alias("batch_first"),
        F.col("last_seen").alias("batch_last"),
    )
    joined = b.join(n, _KEY, "full_outer")
    in_base = F.col("base_n").isNotNull()
    in_batch = F.col("batch_n").isNotNull()
    return joined.select(
        *_KEY,
        (F.coalesce("base_n", F.lit(0)) + F.coalesce("batch_n", F.lit(0)))
        .cast("long")
        .alias("n_obs"),
        F.least("base_first", "batch_first").alias("first_seen"),
        F.greatest("base_last", "batch_last").alias("last_seen"),
        F.when(in_base & in_batch, "updated")
        .when(in_batch, "inserted")
        .otherwise("unchanged")
        .alias("change"),
    )


def summarize_facts(obs: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Raw (subj, pred, obj, ts) observations -> one summary row per
    fact: (subj, pred, obj, n_obs, first_seen, last_seen)."""
    return obs.groupBy(*_KEY).agg(
        F.count("*").alias("n_obs"),
        F.min(ts_col).alias("first_seen"),
        F.max(ts_col).alias("last_seen"),
    )


def fact_windows(obs: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Per-fact validity windows with temporal conflict flags.

    Output: (subj, pred, obj, n_obs, first_seen, last_seen,
    is_conflicted) where is_conflicted marks facts whose window
    overlaps a DIFFERENT obj of the same (subj, pred).
    """
    facts = summarize_facts(obs, ts_col)
    w = Window.partitionBy("subj", "pred").orderBy("first_seen", "obj")
    prev_max_last = F.max("last_seen").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_first = F.lead("first_seen").over(w)
    return facts.select(
        *_KEY,
        "n_obs",
        "first_seen",
        "last_seen",
        (
            (prev_max_last >= F.col("first_seen"))
            | (next_first <= F.col("last_seen"))
        ).alias("is_conflicted"),
    ).fillna(False, ["is_conflicted"])


def facts_asof(facts: DataFrame, at) -> DataFrame:
    """Snapshot of a fact summary table (subj, pred, obj, n_obs,
    first_seen, last_seen) at time ``at``: the facts whose validity
    window contains ``at``, each ranked within its (subj, pred) by
    evidence — n_obs desc, then last_seen desc (most recently still
    observed), then obj asc as the deterministic tiebreak. ``pos = 1``
    is the snapshot's best answer for that (subj, pred).

    ``at`` is any expression/literal comparable to the window bounds.
    """
    at = F.lit(at) if not isinstance(at, F.Column) else at
    active = facts.filter(
        (F.col("first_seen") <= at) & (F.col("last_seen") >= at)
    )
    w = Window.partitionBy("subj", "pred").orderBy(
        F.col("n_obs").desc(), F.col("last_seen").desc(), F.col("obj")
    )
    return active.select(
        *_KEY, "n_obs", "first_seen", "last_seen",
        F.row_number().over(w).alias("pos"),
    )


def snapshot_diff(facts: DataFrame, at1, at2) -> DataFrame:
    """Diff the best-evidence answers between two as-of snapshots.

    For each (subj, pred) present in either snapshot's pos=1 row:
    (subj, pred, obj_before, obj_after, change) with change in
    {'added', 'removed', 'changed', 'unchanged'}; absent sides carry
    NULL obj_* (added/removed rows).
    """
    before = (
        facts_asof(facts, at1)
        .filter(F.col("pos") == 1)
        .select("subj", "pred", F.col("obj").alias("obj_before"))
    )
    after = (
        facts_asof(facts, at2)
        .filter(F.col("pos") == 1)
        .select("subj", "pred", F.col("obj").alias("obj_after"))
    )
    j = before.join(after, ["subj", "pred"], "full_outer")
    return j.select(
        "subj",
        "pred",
        "obj_before",
        "obj_after",
        F.when(F.col("obj_before").isNull(), "added")
        .when(F.col("obj_after").isNull(), "removed")
        .when(F.col("obj_before") != F.col("obj_after"), "changed")
        .otherwise("unchanged")
        .alias("change"),
    )


# the open SCD-2 row's valid_to: a sentinel, not NULL — range predicates
# (valid_from <= T < valid_to) then need no null branch. NOT the
# warehouse-traditional 9999-12-31: Arrow/pandas nanosecond timestamps
# top out at 2262-04-11, and the driver's toPandas comparison (like any
# pandas consumer) would overflow converting it
SCD2_OPEN_END = "2262-01-01 00:00:00"


def scd2_history(obs: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Type-2 effective-dated history per (subj, pred): one row per
    consecutive run of the same obj in (ts, obj) observation order.

    Output: (subj, pred, obj, run_id, n_obs, valid_from, valid_to) —
    run_id is 1-based per (subj, pred), valid_from the run's first
    observation, valid_to the next run's valid_from ([from, to) ranges
    chain gaplessly) with the open run closed by SCD2_OPEN_END.

    Exact duplicate observations are collapsed (counted into n_obs)
    BEFORE the run windows, so the (ts, obj) order key is a true key
    and every window pass sees one total order — with duplicates left
    in, a tie between identical rows can be broken differently by the
    lag pass and the running-sum pass (engines that sort each window
    independently provably split runs differently; caught against
    DuckDB), and a same-ts tie between DIFFERENT objs orders by obj.
    All steps — duplicate collapse, both run windows, the per-run
    aggregate, the valid_to lead — reuse the ONE (subj, pred)
    exchange introduced up front.
    """
    uniq = (
        obs.repartition("subj", "pred")
        .groupBy("subj", "pred", "obj", F.col(ts_col).alias("ts"))
        .agg(F.count("*").alias("n_dup"))
    )
    w = Window.partitionBy("subj", "pred").orderBy("ts", "obj")
    prev_obj = F.lag("obj").over(w)
    runs = uniq.select(
        "subj",
        "pred",
        "obj",
        "ts",
        "n_dup",
        F.sum(
            (prev_obj.isNull() | (prev_obj != F.col("obj"))).cast("int")
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_id"),
    )
    hist = runs.groupBy("subj", "pred", "run_id").agg(
        F.min("obj").alias("obj"),  # constant within a run
        F.sum("n_dup").alias("n_obs"),
        F.min("ts").alias("valid_from"),
    )
    nxt = Window.partitionBy("subj", "pred").orderBy("run_id")
    return hist.select(
        "subj",
        "pred",
        "obj",
        "run_id",
        "n_obs",
        "valid_from",
        F.coalesce(
            F.lead("valid_from").over(nxt),
            F.lit(SCD2_OPEN_END).cast("timestamp"),
        ).alias("valid_to"),
    )


def fact_churn(
    obs: DataFrame, ts_col: str = "ts", grain: str = "month"
) -> DataFrame:
    """KG growth monitoring (X54): per (pred, period) counts of facts
    first observed and last observed in that period, plus the net.

    Output: (pred, period, n_new, n_last_seen, net) — period is
    date_trunc(grain, ts). A fact is 'new' in the period of its
    first_seen and 'last seen' in the period of its last_seen (for a
    live stream the trailing periods' n_last_seen are facts still
    active, not retirements — the monitor reads the series, not the
    tail). One fact-keyed groupBy then two tiny (pred, period)
    aggregates full-outer joined: the output is bounded by
    |preds| x |periods|, never the fact count.
    """
    facts = summarize_facts(obs, ts_col)
    new = facts.groupBy(
        "pred", F.date_trunc(grain, "first_seen").alias("period")
    ).agg(F.count("*").alias("n_new"))
    last = facts.groupBy(
        "pred", F.date_trunc(grain, "last_seen").alias("period")
    ).agg(F.count("*").alias("n_last_seen"))
    return (
        new.join(last, ["pred", "period"], "full_outer")
        .fillna(0, ["n_new", "n_last_seen"])
        .withColumn("net", F.col("n_new") - F.col("n_last_seen"))
    )
