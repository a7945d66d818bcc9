"""Reference-derived gold triples (FIXTURES.md F3).

Applies the SAME lift specification as kg/triples.py, but in pure Python
over the gold annotation corpus — so the P/R comparison measures the
pipeline, not the lift. (The reference binary is not built in this
sandbox; gold annotations are transcribed/hand-verified from its test
corpus and module semantics, cf. SURVEY.md §5.)
"""

from __future__ import annotations

from frog_spark.kg.triples import OBJ_ROLES, lca_pair_triples_py
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
    ent_by_unit = {}
    for fu, text, cat in ents:
        ent_by_unit.setdefault(fu, (text, cat))

    def repr_of(u_idx: int) -> str:
        hit = ent_by_unit.get(u_idx)
        return hit[0] if hit else units[u_idx - 1].lemma

    triples: set[Triple] = set()
    # verb triples
    pos_head = {ui + 1: u.tag.split("(", 1)[0] for ui, u in enumerate(units)}
    subs = [(u, r) for u, (h, r) in s.deps.items() if r == "su"]
    for v_idx in range(1, len(units) + 1):
        if pos_head.get(v_idx) != "WW":
            continue
        v_lemma = units[v_idx - 1].lemma
        su = [u for u, (h, r) in s.deps.items() if h == v_idx and r == "su"]
        ob = [u for u, (h, r) in s.deps.items() if h == v_idx and r in OBJ_ROLES]
        for su_u in su:
            for ob_u in ob:
                triples.add((repr_of(su_u), v_lemma, repr_of(ob_u)))
    # entity-pair LCA triples
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
