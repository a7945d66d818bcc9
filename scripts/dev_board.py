"""Round-5m dev board: one pipeline build, all evaluation corpora.

Used while closing probe gap classes: every corpus here is a DEV set
(the one-shot numbers live in BENCH/probe_eval_round5*.json and are
never re-quoted). Prints triples P/R + heads/pos per corpus so a fix
batch can be measured step by step without re-building per corpus.

Run: python scripts/dev_board.py [corpus ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from generalization_eval import _evaluate  # noqa: E402

from frog_spark.plans.pipeline import FrogPipeline  # noqa: E402
from frog_spark.sources.resources import load_gold_corpus  # noqa: E402

DEFAULT = [
    "heldout_corpus",
    "probe_corpus_r5i",
    "probe_corpus_r5j",
    "probe_corpus_r5k",
    "probe_corpus_r5l",
    "probe_corpus_r5m",
    "probe_corpus_r5n",
    "probe_corpus_r5o",
    "probe_corpus_r5p",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    pipe = FrogPipeline.build()
    for name in names:
        r = _evaluate(pipe, load_gold_corpus(f"resources/{name}.tsv"))
        t, a = r["triples"], r["token_accuracy"]
        print(
            f"{name:22s} P {t['precision']:.4f} R {t['recall']:.4f} "
            f"({t['n_pred']}/{t['n_gold']})  heads {a['head']:.4f} "
            f"pos {a['pos']:.4f} morph {a['morph']:.4f} lemma {a['lemma']:.4f}"
        )


if __name__ == "__main__":
    main()
