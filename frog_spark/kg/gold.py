"""Reference-derived gold triples (FIXTURES.md F3).

Applies the SAME lift specification as kg/triples.py, but in pure Python
over the gold annotation corpus — so the P/R comparison measures the
pipeline, not the lift. (The reference binary is not built in this
sandbox; gold annotations are transcribed/hand-verified from its test
corpus and module semantics, cf. SURVEY.md §5.)
"""

from __future__ import annotations

from frog_spark.kg.triples import lca_pair_triples_py, verb_triples_py
from frog_spark.operators.mwu import resolve_mwus
from frog_spark.sources.resources import GoldSentence, load_mwu_lexicon

Triple = tuple[str, str, str]


def gold_sentence_triples(s: GoldSentence, mwu_lexicon: dict) -> set[Triple]:
    words = [t.word for t in s.tokens]
    tags = [t.pos for t in s.tokens]
    lemmas = [t.lemma for t in s.tokens]
    units = resolve_mwus(words, tags, [1.0] * len(words), lemmas, mwu_lexicon)

    # entity spans from gold BIO
    ents: list[tuple[int, str, str]] = []  # (first_unit, text, cat)
    i = 0
    tok_unit = {}
    for ui, u in enumerate(units):
        for k in range(u.start, u.end + 1):
            tok_unit[k] = ui + 1
    n = len(s.tokens)
    while i < n:
        ner = s.tokens[i].ner
        if ner.startswith("B-"):
            cat = ner[2:]
            j = i
            while j + 1 < n and s.tokens[j + 1].ner == f"I-{cat}":
                j += 1
            ents.append((tok_unit[i], " ".join(words[i : j + 1]), cat))
            i = j + 1
        else:
            i += 1
    triples: set[Triple] = set()
    # the SAME lift implementations the pipeline UDF uses (kg/triples.py
    # verb_triples_py / lca_pair_triples_py), fed the GOLD tree — the
    # harness measures pipeline quality, never lift drift
    unit_rows = [
        (
            ui + 1,
            u.lemma,
            u.tag.split("(", 1)[0],
            s.deps.get(ui + 1, (-1, ""))[0],
            s.deps.get(ui + 1, (-1, ""))[1],
        )
        for ui, u in enumerate(units)
    ]
    for a, p, b, _sc, _oc in verb_triples_py(unit_rows, ents):
        triples.add((a, p, b))
    for a, p, b, _sc, _oc in lca_pair_triples_py(unit_rows, ents):
        triples.add((a, p, b))
    return triples


def gold_triples(gold: list[GoldSentence]) -> dict[str, set[Triple]]:
    """sentence text -> gold triple set."""
    lex = load_mwu_lexicon()
    return {s.text: gold_sentence_triples(s, lex) for s in gold}


def precision_recall(
    predicted: set[Triple], gold: set[Triple]
) -> tuple[float, float]:
    if not predicted and not gold:
        return 1.0, 1.0
    tp = len(predicted & gold)
    p = tp / len(predicted) if predicted else 1.0
    r = tp / len(gold) if gold else 1.0
    return p, r
