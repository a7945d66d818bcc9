"""Scaling-efficiency evidence (BASELINE.json north rule).

The two-cluster-size criterion (N vs 4N executors, efficiency >= 0.8)
cannot use a real cluster in this sandbox; per driver instruction it is
evidenced by running the SAME job at two parallelism levels (default
local[N] vs local[4N] with N from $SCALING_N, default 2) on the SAME
input and reporting turns/sec at both plus efficiency = (T_N / T_4N) / 4.

Methodology notes (this sandbox):
  * The VM shows double-digit CPU steal and large run-to-run drift, so
    each level runs $SCALING_REPEATS times INTERLEAVED (N, 4N, N, 4N...)
    and the per-level minimum is used — the standard noisy-host protocol.
  * The raw-CPU ceiling of the box itself is measured first (the same
    busy-loop at N and 4N processes); Spark cannot scale better than the
    hardware it runs on, so the ceiling is reported alongside.
  * Each measurement runs in a fresh subprocess (a JVM cannot change its
    core count after start). Results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_TURNS = int(os.environ.get("SCALING_TURNS", "480000"))
SCALING_N = int(os.environ.get("SCALING_N", "2"))
REPEATS = int(os.environ.get("SCALING_REPEATS", "2"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores = int(sys.argv[1]); n_turns = int(sys.argv[2])
from frog_spark.session import get_spark
from frog_spark.corpus import transcripts_df_distributed
from frog_spark.plans.pipeline import FrogPipeline, annotate_transcripts, triples_from_transcripts
import os
os.environ["FROG_SPARK_DRIVER_MEM"] = "24g"
spark = get_spark(f"scaling_{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
pipe = FrogPipeline.build()
tdf = transcripts_df_distributed(spark, n_turns, partitions=cores, variants=True).persist()
actual = tdf.count()
# warm-up pass primes executor Python workers + broadcast, then measure
triples_from_transcripts(spark, tdf.limit(200), pipe, num_partitions=cores).count()
t0 = time.time()
n_triples = triples_from_transcripts(spark, tdf, pipe, num_partitions=cores).count()
sec = time.time() - t0
print(json.dumps({"cores": cores, "turns": actual, "sec": round(sec, 3),
                  "turns_per_sec": round(actual / sec, 1),
                  "n_triples": n_triples}))
spark.stop()
"""


def run(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(N_TURNS)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


_BUSY = (
    "import time\nt0=time.time()\nn=0\nwhile time.time()-t0<6:\n"
    "  for _ in range(100000): n+=1\nprint(n)"
)


def hardware_ceiling(n: int) -> float:
    """Aggregate busy-loop throughput at n vs 4n processes -> efficiency."""
    def agg(procs: int) -> int:
        ps = [
            subprocess.Popen([sys.executable, "-c", _BUSY], stdout=subprocess.PIPE)
            for _ in range(procs)
        ]
        return sum(int(p.communicate()[0]) for p in ps)

    lo, hi = agg(n), agg(4 * n)
    return hi / lo / 4.0


_MEMBW = (
    "import numpy as np, time\n"
    "a = np.ones(64_000_000, dtype=np.float64)\n"  # 512 MB resident
    "t0 = time.time(); n = 0\n"
    "while time.time() - t0 < 6:\n"
    "    s = a.sum(); n += 1\n"
    "print(n)"
)


def memory_ceiling(n: int) -> float:
    """Aggregate array-sum throughput at n vs 4n processes -> efficiency.

    The integer busy-loop ceiling is register-bound and blind to the
    resource that actually binds this pipeline at high core counts:
    memory bandwidth (measured on this VM: 4->16 procs busy-loop 1.03
    but array-sum only 0.87). Both ceilings are reported; the lower one
    is the honest bound for a memory-bound job."""
    def agg(procs: int) -> int:
        ps = [
            subprocess.Popen([sys.executable, "-c", _MEMBW], stdout=subprocess.PIPE)
            for _ in range(procs)
        ]
        return sum(int(p.communicate()[0]) for p in ps)

    lo = agg(n)
    hi = agg(n * 4)
    return hi / lo / 4.0


def main() -> None:
    ceiling = hardware_ceiling(SCALING_N)
    mem_ceiling = memory_ceiling(SCALING_N)
    lo_runs, hi_runs = [], []
    for _ in range(REPEATS):
        lo_runs.append(run(SCALING_N))
        hi_runs.append(run(SCALING_N * 4))
    lo = min(lo_runs, key=lambda r: r["sec"])
    hi = min(hi_runs, key=lambda r: r["sec"])
    speedup = lo["sec"] / hi["sec"]
    efficiency = speedup / 4.0
    result = {
        "n_turns": N_TURNS,
        "n_cores": SCALING_N,
        "hardware_ceiling_efficiency": round(ceiling, 3),
        "memory_bandwidth_ceiling_efficiency": round(mem_ceiling, 3),
        f"local{SCALING_N}": lo,
        f"local{SCALING_N * 4}": hi,
        "all_runs_sec": {
            f"local{SCALING_N}": [r["sec"] for r in lo_runs],
            f"local{SCALING_N * 4}": [r["sec"] for r in hi_runs],
        },
        "speedup_n_to_4n": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "meets_target": efficiency >= 0.8,
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
