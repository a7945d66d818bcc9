"""One-shot frozen-probe evaluation.

Protocol (BENCH/BASELINE.md "Tuning disclosure"): probe sentences are
authored and annotated AFTER a round's model-selection knobs freeze,
evaluated exactly ONCE with the default pipeline, and the result is
recorded verbatim — the probe is never iterated on. Fixes motivated by
probe errors go through the dev set (heldout_corpus.tsv) the NEXT round
and then need a fresh probe.

Run:  python scripts/probe_eval.py resources/probe_corpus_r5.tsv \
          BENCH/probe_eval_round5.json "protocol note"
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from generalization_eval import _evaluate  # noqa: E402

from frog_spark.plans.pipeline import FrogPipeline  # noqa: E402
from frog_spark.sources.resources import load_gold_corpus  # noqa: E402


def main() -> None:
    probe_path, out_path = sys.argv[1], sys.argv[2]
    note = sys.argv[3] if len(sys.argv) > 3 else ""
    result = _evaluate(FrogPipeline.build(), load_gold_corpus(probe_path))
    result["corpus"] = probe_path
    result["note"] = note
    print(json.dumps(result, indent=1))
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
