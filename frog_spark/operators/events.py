"""Event-stream analytics: ordered conversion funnels (X56).

The reference has no event layer (it annotates text); transcripts at
10^12-turn scale arrive with exactly this shape of telemetry next to
them (tool calls, errors, outcomes), and the first question a pipeline
owner asks of an event stream is the ordered funnel: of the users who
did A, how many then did B, then C — in that order.

Scale notes: stage k is one user-keyed join of the (type-filtered,
pre-aggregated) step-k events against the stage-(k-1) table plus one
min-aggregate — never a window over the whole stream, and the events
are filtered to the step's type BEFORE any shuffle. Each stage table
is one row per surviving user and is localCheckpoint-materialized
because two consumers read it (the next stage and the count row);
without that, stage 1's subtree would re-execute once per later
stage. Timestamps are compared exactly (min of a monotone column) —
no floats, so the DuckDB oracle chains the same CTEs and value-hashes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel over an event stream.

    A user reaches stage k when a ``steps[k-1]`` event exists at or
    after their earliest qualifying stage-(k-1) time (stage 1: their
    earliest ``steps[0]`` event; the earliest-qualifying-time choice is
    the standard greedy one — it dominates every other witness, so a
    user reaches stage k under SOME witness chain iff they reach it
    under this one). Output: (stage_idx, stage, n_users), one row per
    stage — cumulative reached counts, n_users non-increasing.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    stages: list[DataFrame] = []
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("t"))
        .localCheckpoint(eager=True)
    )
    stages.append(cur)
    for step in steps[1:]:
        ev = events.where(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("ts2")
        )
        cur = (
            ev.join(cur, "user")
            .where(F.col("ts2") >= F.col("t"))
            .groupBy("user")
            .agg(F.min("ts2").alias("t"))
            .localCheckpoint(eager=True)
        )
        stages.append(cur)
    out = None
    for i, (st, name) in enumerate(zip(stages, steps), start=1):
        row = st.agg(F.count("*").alias("n_users")).select(
            F.lit(i).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out
