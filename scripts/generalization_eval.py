"""Held-out generalization evaluation.

Memory-based learners trivially recall their training data (the golden
tests); this measures what the same models do on sentences they never
saw. Two protocols, both reported in BENCH/generalization_heldout.json:

  internal  — train on gold sentences minus s26-s30, evaluate on those 5
              (the round-1/2 protocol, kept for comparability);
  external  — train the DEFAULT pipeline (the full gold corpus — 78
              sentences as of round 4 — plus the synthetic treebank,
              whose content vocabulary is held-out-disjoint by test),
              evaluate on resources/heldout_corpus.tsv, which is never
              trained on anywhere in the repo (hand-annotated to the
              same conventions; new constructions over the reference
              test-corpus domain plus unseen inflections/nouns/names).

The external number is authored independently of the pipeline's output
and never trained on — but as of round 4 it also served as the
error-analysis loop for model-selection knobs, so treat it as a DEV
set; the untouched one-shot estimate lives in resources/probe_corpus.tsv
(BENCH/probe_eval_round4.json). Counts are emitted in the JSON rather
than hard-coded here.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from frog_spark.kg.gold import gold_sentence_triples, precision_recall  # noqa: E402
from frog_spark.operators.tokenizer import split_sentences, tokenize_text  # noqa: E402
from frog_spark.plans.pipeline import FrogPipeline  # noqa: E402
from frog_spark.sources.resources import load_gold_corpus, load_mwu_lexicon  # noqa: E402

HELD_OUT_INTERNAL = {"s26", "s27", "s28", "s29", "s30"}
HELDOUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "heldout_corpus.tsv",
)


def _evaluate(pipe: FrogPipeline, test) -> dict:
    lex = load_mwu_lexicon()
    counts = {k: [0, 0] for k in ("pos", "lemma", "morph", "ner", "chunk", "head", "rel")}
    pred_triples: set = set()
    gold_triples: set = set()
    for s in test:
        sents = split_sentences(tokenize_text(s.text))
        words = [t.word for t in sents[0]]
        ann = pipe.annotate_sentence(words, [t.token_class for t in sents[0]])
        for a, g in zip(ann, s.tokens):
            for key, got, want in (
                ("pos", a["pos_tag"], g.pos),
                ("lemma", a["lemma"], g.lemma),
                ("morph", a["morph"], g.morph),
                ("ner", a["ner_tag"], g.ner),
                ("chunk", a["chunk_tag"], g.chunk),
            ):
                counts[key][1] += 1
                counts[key][0] += got == want
        unit_parse = {a["unit_idx"]: (a["parse_head"], a["parse_role"]) for a in ann}
        for u, (h, r) in s.deps.items():
            got = unit_parse.get(u, (-1, ""))
            counts["head"][1] += 1
            counts["head"][0] += got[0] == h
            counts["rel"][1] += 1
            counts["rel"][0] += got == (h, r)
        for t in ann[0]["verb_triples"] + ann[0]["pair_triples"]:
            pred_triples.add((t["subj"], t["pred"], t["obj"]))
        gold_triples |= gold_sentence_triples(s, lex)

    acc = {k: round(c / t, 4) if t else None for k, (c, t) in counts.items()}
    p, r = precision_recall(pred_triples, gold_triples)
    return {
        "n_sentences": len(test),
        "n_tokens": counts["pos"][1],
        "token_accuracy": acc,
        "triples": {
            "precision": round(p, 4),
            "recall": round(r, 4),
            "n_pred": len(pred_triples),
            "n_gold": len(gold_triples),
        },
    }


def main() -> None:
    gold = load_gold_corpus()

    # -- internal protocol: train minus s26-s30, eval on them --------------
    train = [s for s in gold if s.sent_id not in HELD_OUT_INTERNAL]
    test_internal = [s for s in gold if s.sent_id in HELD_OUT_INTERNAL]
    with tempfile.NamedTemporaryFile("w", suffix=".tsv", delete=False) as fh:
        for s in train:
            fh.write(f"# sent {s.sent_id} {s.text}\n")
            for t in s.tokens:
                fh.write(
                    f"{t.idx}\t{t.word}\t{t.pos}\t{t.lemma}\t{t.morph}\t{t.ner}\t{t.chunk}\n"
                )
            for u, (h, r) in s.deps.items():
                fh.write(f"# dep {u} {h} {r}\n")
            fh.write("\n")
        train_path = fh.name
    internal = _evaluate(FrogPipeline.build(corpus_path=train_path), test_internal)
    internal["held_out_sentences"] = sorted(HELD_OUT_INTERNAL)

    # -- external protocol: train on all 58, eval on the 28 never-trained --
    external = _evaluate(
        FrogPipeline.build(), load_gold_corpus(HELDOUT_PATH)
    )
    external["corpus"] = "resources/heldout_corpus.tsv"

    out = {"internal_s26_s30": internal, "external_heldout_28": external}
    print(json.dumps(out, indent=1))
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "generalization_heldout.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
