"""Stage checkpoint / lineage / resume framework (SURVEY.md §2.11 K7, §4).

Reference analogue: Frog's ``--retry`` skips files whose output already
exists (/root/reference/src/FrogAPI.cxx:1203-1206). Here every pipeline
stage writes a parquet table plus a ``_stage_state.json`` manifest with
row counts and per-partition counters; a resumed run loads the completed
stage instead of recomputing it. In production the parquet write is an
Iceberg ``writeTo(...).createOrReplace`` and the manifest is an Iceberg
snapshot + a stage-state table — the sandbox has no Iceberg runtime, so
the parquet+manifest pair stands in (documented deviation).

Counters are per written FILE (row counts keyed by the part-file name):
file names are stable provenance — unlike reader spark_partition_id,
which depends on spark.sql.files.maxPartitionBytes and would make the
same table hash to different "partitions" across runs. Computing them
costs one aggregation pass over the just-written table (cheap relative
to the stage that produced it; an Iceberg backend would read the same
numbers from snapshot manifests for free).
"""

from __future__ import annotations

import json
import os
import time
import uuid
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
    # token of the most recently produced/resumed stage in this run —
    # threaded into each manifest as parent_token (chain validation)
    _last_token: str | None = None

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.base_dir, stage)
        return d, os.path.join(d, "_stage_state.json")

    def _read_state(self, stage: str) -> dict | None:
        _, state = self._paths(stage)
        if not os.path.exists(state):
            return None
        try:
            with open(state) as fh:
                st = json.load(fh)
        except (json.JSONDecodeError, OSError):
            # a crash mid-write leaves a truncated manifest — treat as
            # incomplete instead of bricking every future resume
            return None
        return st if st.get("status") == "complete" else None

    def is_complete(self, stage: str) -> bool:
        return self._read_state(stage) is not None

    def stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
        force: bool = False,
    ) -> DataFrame:
        """Run (or resume) one stage. ``fn`` builds the stage DataFrame."""
        data_dir, state_path = self._paths(name)
        st = None if (force or self._dirty) else self._read_state(name)
        # LINEAGE TOKEN: every stage manifest records its own token and
        # the token of the stage that ran immediately before it in this
        # run; on resume the chain must match, or a checkpoint derived
        # from a STALE upstream version (recompute crashed before
        # reaching this stage) would be silently reused by a fresh
        # process whose in-memory _dirty flag reset
        if st is not None and st.get("parent_token") != self._last_token:
            st = None
        if st is not None:
            self.results[name] = StageResult(
                name, data_dir, st["rows"], st["partitions"], st["counters"],
                0.0, resumed=True,
            )
            self._last_token = st.get("token")
            return self.spark.read.parquet(data_dir)

        self._dirty = True
        t0 = time.time()
        df = fn()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        out = self.spark.read.parquet(data_dir)
        # per-FILE lineage counters: part-file names are write-time
        # provenance (reader split ids are NOT — they change with reader
        # config). String keys survive the JSON round-trip unchanged, so
        # fresh and resumed counter dicts compare equal.
        # key = last two path segments: a partitionBy write reuses the
        # same part-file BASENAME across partition directories (one per
        # write task), so 'bucket=3/part-00000-...' is the unique unit
        parts = F.split(F.input_file_name(), "/")
        per_part = (
            out.groupBy(
                F.concat_ws(
                    "/", F.element_at(parts, -2), F.element_at(parts, -1)
                ).alias("file")
            )
            .count()
            .collect()
        )
        counters = {
            "per_partition_rows": {str(r["file"]): r["count"] for r in per_part}
        }
        rows = sum(counters["per_partition_rows"].values())
        elapsed = time.time() - t0
        token = uuid.uuid4().hex
        state = {
            "status": "complete",
            "stage": name,
            "rows": rows,
            "partitions": len(per_part),
            "counters": counters,
            "elapsed_sec": elapsed,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "token": token,
            "parent_token": self._last_token,
        }
        # atomic replace: a crash mid-dump must not leave a truncated
        # manifest that poisons resume
        tmp = state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh, indent=1)
        os.replace(tmp, state_path)
        self._last_token = token
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
