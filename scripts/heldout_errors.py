"""Per-sentence error analysis on the held-out corpus.

Prints, for every held-out sentence, each token's predicted vs gold
(pos, head, rel) with mismatches marked — the iteration loop for closing
the parser-generalization gap (VERDICT r3 Next #1).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from frog_spark.kg.gold import gold_sentence_triples  # noqa: E402
from frog_spark.operators.tokenizer import split_sentences, tokenize_text  # noqa: E402
from frog_spark.plans.pipeline import FrogPipeline  # noqa: E402
from frog_spark.sources.resources import load_gold_corpus, load_mwu_lexicon  # noqa: E402

HELDOUT = "/root/repo/resources/heldout_corpus.tsv"


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--treebank", type=int, default=None,
                    help="override config.treebank_sentences")
    ap.add_argument("--only-bad", action="store_true")
    ap.add_argument("--corpus", default=HELDOUT,
                    help="evaluation corpus TSV (default: held-out 103)")
    args = ap.parse_args()

    kwargs = {}
    if args.treebank is not None:
        from frog_spark.plans.pipeline import PipelineConfig

        kwargs["config"] = PipelineConfig(treebank_sentences=args.treebank)
    pipe = FrogPipeline.build(**kwargs)
    lex = load_mwu_lexicon()
    test = load_gold_corpus(args.corpus)
    tot_h = ok_h = 0
    for s in test:
        sents = split_sentences(tokenize_text(s.text))
        words = [t.word for t in sents[0]]
        ann = pipe.annotate_sentence(words, [t.token_class for t in sents[0]])
        unit_parse = {a["unit_idx"]: (a["parse_head"], a["parse_role"]) for a in ann}
        bad = []
        for a, g in zip(ann, s.tokens):
            u = a["unit_idx"]
            gh, gr = s.deps.get(u, (None, None))
            ph, pr = unit_parse.get(u, (-1, ""))
            pos_bad = a["pos_tag"] != g.pos
            head_bad = gh is not None and (ph, pr) != (gh, gr)
            if gh is not None:
                tot_h += 1
                ok_h += ph == gh
            if pos_bad or head_bad:
                bad.append(
                    f"  {g.idx:>2} {g.word:<14} pos {a['pos_tag']:<28}{'' if not pos_bad else ' != ' + g.pos:<30}"
                    f" head/rel ({ph},{pr})" + ("" if not head_bad else f" != ({gh},{gr})")
                )
        pred_t = {
            (t["subj"], t["pred"], t["obj"])
            for t in ann[0]["verb_triples"] + ann[0]["pair_triples"]
        }
        gold_t = gold_sentence_triples(s, lex)
        if bad or pred_t != gold_t or not args.only_bad:
            print(f"== {s.sent_id}: {s.text}")
            for line in bad:
                print(line)
            if pred_t != gold_t:
                miss = gold_t - pred_t
                extra = pred_t - gold_t
                if miss:
                    print(f"  MISS triples: {sorted(miss)}")
                if extra:
                    print(f"  EXTRA triples: {sorted(extra)}")
    print(f"heads {ok_h}/{tot_h} = {ok_h / tot_h:.4f}")


if __name__ == "__main__":
    main()
