"""Synthetic-treebank tests (sources/treebank.py): structural validity,
held-out disjointness, determinism, and the external generalization gate
the treebank exists to win (VERDICT r3 Next #1)."""

from __future__ import annotations

import os

import pytest

from frog_spark.operators.mwu import resolve_mwus
from frog_spark.sources.resources import load_gold_corpus, load_mwu_lexicon
from frog_spark.sources.treebank import CONTENT_WORDS, sentence, synthetic_treebank

HELDOUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "heldout_corpus.tsv",
)


def _ancestors(deps, u, limit=100):
    out = []
    while u != 0 and limit:
        u = deps[u][0]
        out.append(u)
        limit -= 1
    return out


def test_treebank_structure_valid():
    """Every generated sentence: dep map covers exactly the post-MWU
    units, one ROOT, no cycles, and the tree is projective (the Eisner
    CKY can only produce projective trees, so non-projective training
    targets would be unlearnable noise)."""
    lex = load_mwu_lexicon()
    for s in synthetic_treebank(2500):
        words = [t.word for t in s.tokens]
        tags = [t.pos for t in s.tokens]
        units = resolve_mwus(words, tags, [1.0] * len(words), [t.lemma for t in s.tokens], lex)
        n = len(units)
        assert set(s.deps.keys()) == set(range(1, n + 1)), s.text
        assert sum(1 for h, _ in s.deps.values() if h == 0) == 1, s.text
        for d, (h, _r) in s.deps.items():
            assert d not in _ancestors(s.deps, d), f"cycle in {s.text}"
            if h == 0:
                continue
            for m in range(min(d, h) + 1, max(d, h)):
                assert h in ([m] + _ancestors(s.deps, m)), f"non-projective {s.text}"


PROBE = os.path.join(os.path.dirname(HELDOUT), "probe_corpus.tsv")
PROBE_R5 = os.path.join(os.path.dirname(HELDOUT), "probe_corpus_r5.tsv")
PROBE_R5B = os.path.join(os.path.dirname(HELDOUT), "probe_corpus_r5b.tsv")
PROBE_R5C = os.path.join(os.path.dirname(HELDOUT), "probe_corpus_r5c.tsv")
PROBE_R5D = os.path.join(os.path.dirname(HELDOUT), "probe_corpus_r5d.tsv")
PROBE_R5E = os.path.join(os.path.dirname(HELDOUT), "probe_corpus_r5e.tsv")
PROBE_R5F = os.path.join(os.path.dirname(HELDOUT), "probe_corpus_r5f.tsv")
# Probes authored after the rare-vocabulary pool froze (its exclusion
# list resources/treebank_pool_exclude.txt covers corpora through r5h).
# 5i/5j are deliberately NOT here: their vocabulary legitimately
# entered the (frozen) pool after their one-shots — they are dev sets
# now — but everything authored after the pool existed was checked
# against CONTENT_WORDS incl. the pool, and must STAY disjoint even as
# the inflection lexicon (which feeds the pool) grows.
PROBES_POST_POOL = [
    os.path.join(os.path.dirname(HELDOUT), f"probe_corpus_r5{x}.tsv")
    for x in "ghklm"
]


def test_treebank_heldout_disjoint():
    """The generator's content vocabulary must not leak held-out-only
    content words — otherwise the external evaluation measures recall,
    not generalization. (Words the GOLD corpus already trains on are
    exempt: they were never held out.) Covers BOTH evaluation corpora:
    the 103-sentence held-out set and the frozen-models probe set."""
    gold_words = {t.word.lower() for s in load_gold_corpus() for t in s.tokens}
    for path in (HELDOUT, PROBE, PROBE_R5, PROBE_R5B, PROBE_R5C, PROBE_R5D,
                 PROBE_R5E, PROBE_R5F, *PROBES_POST_POOL):
        eval_content = {
            t.word.lower()
            for s in load_gold_corpus(path)
            for t in s.tokens
            if t.pos.startswith(("N(", "WW(", "ADJ(", "SPEC("))
        }
        leaked = ({w.lower() for w in CONTENT_WORDS} & eval_content) - gold_words
        assert not leaked, f"treebank vocabulary leaks {path} content words: {sorted(leaked)}"


def test_treebank_deterministic():
    a = [sentence(i) for i in (0, 1, 17, 4321)]
    b = [sentence(i) for i in (0, 1, 17, 4321)]
    for x, y in zip(a, b):
        assert x.text == y.text
        assert [(t.word, t.pos, t.lemma, t.ner) for t in x.tokens] == [
            (t.word, t.pos, t.lemma, t.ner) for t in y.tokens
        ]
        assert x.deps == y.deps


def test_treebank_df_matches_driver(spark):
    """Spark-side generation is row-for-row the driver generator."""
    from frog_spark.sources.treebank import treebank_df

    n = 150

    def canon(words, tags, dep_items):
        return (tuple(words), tuple(tags), tuple(sorted(dep_items)))

    # compare as sorted multisets of the FULL row content (words + tags
    # + deps): keying a dict by word-tuple alone would collide if two
    # generated sentences ever share a word sequence and silently
    # compare the wrong sentence's deps
    got = sorted(
        canon(
            r["words"], r["tags"],
            [(u, (h, rel)) for u, h, rel in zip(r["dep_units"], r["dep_heads"], r["dep_rels"])],
        )
        for r in treebank_df(spark, n).collect()
    )
    want = sorted(
        canon(
            [t.word for t in gs.tokens],
            [t.pos for t in gs.tokens],
            gs.deps.items(),
        )
        for gs in (sentence(i) for i in range(n))
    )
    assert got == want


def test_external_heldout_generalization_gate(pipeline):
    """On the NEVER-trained held-out corpus (103 sentences) the default
    pipeline must reach heads >= 0.96, triple recall >= 0.92 and
    precision >= 0.92. Round-5 models (inflection lexicon + ddfa tagger
    + widened treebank + rare-known-word lexical reclassification +
    head-word-first pairs order + quote/copula/inversion/mid-field-PP
    template arms) measure ~0.984 heads, ~0.987 recall, ~0.973
    precision — the north rule's >=0.95 triple target holds on
    never-trained text; the three residual errors are decomposed in
    BENCH/BASELINE.md (copula-vs-unseen-mv-intransitive, the untrainable
    held-out word 'hele', one thin-node boundary flip)
    (round 4: 0.95/0.78/0.85; round 3 on the easier 28: heads
    0.77 / recall 0.33). The gate leaves noise margin: 74 gold triples
    make one triple ~0.014, and treebank template edits resample the
    generated corpus, flipping boundary sentences. Uses the session
    pipeline, so this also pins that the default config ships with the
    treebank + lexicon on."""
    from frog_spark.kg.gold import gold_sentence_triples, precision_recall
    from frog_spark.operators.tokenizer import split_sentences, tokenize_text

    lex = load_mwu_lexicon()
    ok = tot = 0
    pred_t, gold_t = set(), set()
    for s in load_gold_corpus(HELDOUT):
        sents = split_sentences(tokenize_text(s.text))
        ann = pipeline.annotate_sentence(
            [t.word for t in sents[0]], [t.token_class for t in sents[0]]
        )
        unit_parse = {a["unit_idx"]: a["parse_head"] for a in ann}
        for u, (h, _r) in s.deps.items():
            tot += 1
            ok += unit_parse.get(u, -1) == h
        for t in ann[0]["verb_triples"] + ann[0]["pair_triples"]:
            pred_t.add((t["subj"], t["pred"], t["obj"]))
        gold_t |= gold_sentence_triples(s, lex)
    heads = ok / tot
    p, r = precision_recall(pred_t, gold_t)
    assert heads >= 0.96, f"held-out heads {heads:.4f} < 0.96"
    assert r >= 0.92, f"held-out triple recall {r:.4f} < 0.92"
    assert p >= 0.92, f"held-out triple precision {p:.4f} < 0.92"
