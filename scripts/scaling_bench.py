"""Scaling-efficiency evidence (BASELINE.json north rule).

The two-cluster-size criterion (N vs 4N executors, efficiency >= 0.8)
cannot use a real cluster in this sandbox; per driver instruction it is
evidenced by running the SAME job at two parallelism levels (local[8] vs
local[32]) on the SAME input and reporting turns/sec at both plus
efficiency = (T_8 / T_32) / 4.

Each measurement runs in a fresh subprocess (a JVM cannot change its
core count after start). Results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_TURNS = int(os.environ.get("SCALING_TURNS", "12000"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores = int(sys.argv[1]); n_turns = int(sys.argv[2])
from frog_spark.session import get_spark
from frog_spark.corpus import transcripts_df_distributed
from frog_spark.plans.pipeline import FrogPipeline, annotate_transcripts
from frog_spark.kg.triples import extract_triples
spark = get_spark(f"scaling_{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
pipe = FrogPipeline.build()
tdf = transcripts_df_distributed(spark, n_turns, partitions=cores).persist()
actual = tdf.count()
# warm-up pass primes executor Python workers + broadcast, then measure
annotate_transcripts(spark, tdf.limit(200), pipe, num_partitions=cores).count()
t0 = time.time()
ann = annotate_transcripts(spark, tdf, pipe, num_partitions=cores)
n_triples = extract_triples(ann).count()
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


def main() -> None:
    r8 = run(8)
    r32 = run(32)
    speedup = r8["sec"] / r32["sec"]
    efficiency = speedup / 4.0
    result = {
        "n_turns": N_TURNS,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "meets_target": efficiency >= 0.8,
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
