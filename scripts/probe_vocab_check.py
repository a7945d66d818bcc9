"""Complete probe-vocabulary checker for frozen-probe authorship.

The probe protocol (BENCH/probe_eval_round5*.json) requires a fresh
probe's CONTENT vocabulary (N/WW/ADJ/SPEC surfaces) to be disjoint
from every surface any model trains on, so the one-shot numbers
measure generalization rather than recall. Round 5n's authorship
check built that forbidden set by iterating REGULAR_VERBS only and
missed IRREGULAR_VERBS surfaces ('klinkt', 'spant', and the p277 miss
'stalen' — a trained preterite of 'stelen' homographic with the
material adjective); the erratum is disclosed in
BENCH/probe_eval_round5n.json. This script is the complete check:

  * treebank core vocabulary (CONTENT_WORDS) — the POS/NER/chunk/
    parser training stream,
  * the rare-vocabulary pools (nouns/adjs/verbs/participles) that the
    unknown-word tagger trains on,
  * EVERY inflection-lexicon surface (inflection_rows() — regular AND
    irregular verbs, nouns, adjectives, derived rows) — the MBLEM /
    MBMA training stream,
  * the gold corpus (resources/gold_corpus.tsv) — trains everything,
  * every existing evaluation corpus (held-out + all probes), so a new
    probe cannot silently re-measure a spent estimator's vocabulary.

Usage:
    python scripts/probe_vocab_check.py resources/probe_corpus_rXX.tsv \
        [--allow is,wordt,heeft,...]

--allow lists closed-class scaffolding words the probe's protocol note
explicitly exempts; every exemption must be disclosed in the probe's
JSON note. Exit status 1 if any non-exempt content word is trained.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, "/root/repo")

from frog_spark.sources.inflect import inflection_rows  # noqa: E402
from frog_spark.sources.resources import RESOURCE_DIR, load_gold_corpus  # noqa: E402
from frog_spark.sources.treebank import CONTENT_WORDS, _rare_pools  # noqa: E402

CONTENT_POS = ("N(", "WW(", "ADJ(", "SPEC(")


def trained_surface_map() -> dict[str, set[str]]:
    """lowercased surface -> set of source labels that train it."""
    src: dict[str, set[str]] = {}

    def add(word: str, label: str) -> None:
        src.setdefault(word.lower(), set()).add(label)

    for w in CONTENT_WORDS:
        add(w, "treebank-core")
    nouns, adjs, verbs, parts = _rare_pools()
    for sg, pl, _g, lemma, _sm, _pm in nouns:
        for w in (sg, pl, lemma):
            if w:
                add(w, "rare-pool")
    for base, e_form, lemma, _bm, _em in adjs:
        for w in (base, e_form, lemma):
            add(w, "rare-pool")
    for sg3, inf, lemma, _sm, _im in verbs:
        for w in (sg3, inf, lemma):
            add(w, "rare-pool")
    for vd, lemma, _m in parts:
        for w in (vd, lemma):
            add(w, "rare-pool")
    for w, _tag, lemma in inflection_rows():
        add(w, "inflection-lexicon")
        add(lemma, "inflection-lexicon")
    for s in load_gold_corpus():
        for t in s.tokens:
            add(t.word, "gold-corpus")
    return src


def eval_corpus_map(skip: str) -> dict[str, set[str]]:
    """lowercased content surface -> eval corpora it appears in."""
    src: dict[str, set[str]] = {}
    paths = [os.path.join(RESOURCE_DIR, "heldout_corpus.tsv")]
    paths += sorted(glob.glob(os.path.join(RESOURCE_DIR, "probe_corpus*.tsv")))
    for path in paths:
        if os.path.abspath(path) == os.path.abspath(skip):
            continue
        label = os.path.basename(path).replace(".tsv", "")
        for s in load_gold_corpus(path):
            for t in s.tokens:
                if t.pos.startswith(CONTENT_POS):
                    src.setdefault(t.word.lower(), set()).add(label)
    return src


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("probe", help="candidate probe corpus TSV")
    ap.add_argument("--allow", default="",
                    help="comma-separated disclosed scaffolding exemptions")
    args = ap.parse_args()
    allow = {w.strip().lower() for w in args.allow.split(",") if w.strip()}

    content: dict[str, set[str]] = {}
    for s in load_gold_corpus(args.probe):
        for t in s.tokens:
            if t.pos.startswith(CONTENT_POS):
                content.setdefault(t.word.lower(), set()).add(t.pos)

    trained = trained_surface_map()
    in_evals = eval_corpus_map(skip=args.probe)

    bad = []
    for w in sorted(content):
        hits = trained.get(w, set()) | in_evals.get(w, set())
        if not hits:
            continue
        line = f"  {w:20s} <- {', '.join(sorted(hits))}"
        if w in allow:
            print(f"(allowed){line}")
        else:
            bad.append(line)
    if bad:
        print(f"TRAINED/REUSED content vocabulary in {args.probe}:")
        print("\n".join(bad))
        print(f"\n{len(bad)} non-exempt hits — probe is NOT a clean "
              "generalization estimator.")
        return 1
    print(f"clean: {len(content)} content surfaces, no non-exempt overlap "
          "with any trained surface or prior evaluation corpus.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
