"""Machine-checkable physical-plan audit over every driver-gate query.

Walks __spark_entry__.queries() at sf0.001, captures each query's
EXECUTED plan string, and emits one JSON line with, per query:

  * ``exchanges``      — count of data Exchange operators, split into
                         hash/range/single partitioning (the shuffle
                         budget the BASELINE.md audit table talks about)
  * ``broadcasts``     — BroadcastExchange count (dim-table joins that
                         deliberately DON'T shuffle the fact side)
  * ``python``         — BatchEvalPython / ArrowEvalPython / MapInPandas
                         occurrences (the slow path; the audit expects 0
                         for every X-series op except the documented
                         Arrow-batched ones)
  * ``cartesian``      — CartesianProduct occurrences (audit expects 0)
  * ``codegen_spans``  — WholeStageCodegen regions (JVM-side fused
                         pipelines; more/wider is better)

Iterative operators (pagerank, khop, connected-component merges) show
their FINAL-iteration plan over localCheckpoint scan roots — per-round
shuffle counts for those live in the operator docstrings and the
BASELINE.md rows; this audit still proves they end Python-free.

Run: python scripts/plan_audit.py [out.json]  (~2 min)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("PLAN_AUDIT_SF_DIR", "/root/testdata/sf0.001")


def audit_plan(plan: str) -> dict:
    return {
        "exchanges": {
            "hash": len(re.findall(r"Exchange hashpartitioning", plan)),
            "range": len(re.findall(r"Exchange rangepartitioning", plan)),
            "single": len(re.findall(r"Exchange SinglePartition", plan)),
        },
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "python": (
            len(re.findall(r"BatchEvalPython", plan))
            + len(re.findall(r"ArrowEvalPython", plan))
            + len(re.findall(r"MapInPandas", plan))
            + len(re.findall(r"FlatMapGroupsInPandas", plan))
        ),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    import __spark_entry__ as entry
    from frog_spark.session import get_spark

    spark = get_spark("plan_audit", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = audit_plan(plan)
        except Exception as ex:  # noqa: BLE001 - record, don't abort the sweep
            out[name] = {"error": str(ex)[:200]}
    totals = {
        "queries": len(out),
        "python_free": sum(
            1 for v in out.values() if v.get("python") == 0
        ),
        "cartesian_free": sum(
            1 for v in out.values() if v.get("cartesian") == 0
        ),
        "with_python": sorted(
            k for k, v in out.items() if v.get("python", 0) > 0
        ),
        "errors": sorted(k for k, v in out.items() if "error" in v),
    }
    rec = {"sf_dir": SF, "totals": totals, "per_query": out}
    dest = sys.argv[1] if len(sys.argv) > 1 else None
    line = json.dumps(rec)
    if dest:
        with open(dest, "w") as f:
            f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
