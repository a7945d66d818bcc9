"""Lexical-substitution training augmentation.

The reference's parser/tagger quality comes from multi-million-token
treebanks; a 78-sentence corpus teaches the CONSTRUCTIONS but leaves the
word-identity features of the pair/dir/rel classifiers sparse — on
held-out text the pairs classifier answers "no relation" for word pairs
it never saw (BENCH/BASELINE.md, external held-out protocol). Standard
fix when more treebank is unavailable: augment by swapping tokens with
other corpus tokens that carry the EXACT same fine-grained tag, copying
the donor's word/lemma/morph columns together so every module's training
columns stay mutually consistent. Tag sequences, chunks, and dependency
structure are untouched — for CGN's fine tags, same-tag nouns are
syntactically interchangeable, so the derived trees remain valid gold.

Only plain single-token common nouns (tag N(...), NER O) are swapped:
names, MWU members, and anything carrying entity structure stay fixed.
Deterministic (seeded), training-side only — evaluation corpora are
never augmented.
"""

from __future__ import annotations

import random
from dataclasses import replace

from frog_spark.sources.resources import GoldSentence, GoldToken


def _swappable(tok: GoldToken) -> bool:
    return tok.pos.startswith("N(") and tok.ner == "O" and " " not in tok.word


def augment_gold(
    gold: list[GoldSentence], n_variants: int = 4, seed: int = 0xA46
) -> list[GoldSentence]:
    """Return ``gold`` + ``n_variants`` substitution variants per
    sentence. Swap pool: per exact tag, every (word, lemma, morph)
    triple seen under that tag anywhere in the corpus."""
    pool: dict[str, list[tuple[str, str, str]]] = {}
    for s in gold:
        for t in s.tokens:
            if _swappable(t):
                entry = (t.word, t.lemma, t.morph)
                bucket = pool.setdefault(t.pos, [])
                if entry not in bucket:
                    bucket.append(entry)

    rng = random.Random(seed)
    # originals outweigh variants: when a variant of one sentence
    # produces a classifier instance feature-identical to an ORIGINAL
    # instance of another sentence but with a different class, the
    # original must keep the majority at that trie node or training-set
    # recall (the gold-parity guarantee) breaks. Replicating each
    # original n_variants+1 times makes original evidence strictly
    # dominate variant evidence at every shared node.
    out = [s for s in gold for _ in range(n_variants + 1)]
    for s in gold:
        slots = [i for i, t in enumerate(s.tokens) if _swappable(t) and len(pool[t.pos]) > 1]
        if not slots:
            continue
        for v in range(n_variants):
            toks = []
            changed = False
            for i, t in enumerate(s.tokens):
                if i in slots:
                    w, le, m = rng.choice(pool[t.pos])
                    if w != t.word:
                        changed = True
                    toks.append(replace(t, word=w, lemma=le, morph=m))
                else:
                    toks.append(t)
            if not changed:
                continue
            words = [t.word for t in toks]
            out.append(
                GoldSentence(
                    sent_id=f"{s.sent_id}v{v}",
                    text=_retext(s.text, s.tokens, toks),
                    tokens=toks,
                    deps=dict(s.deps),
                )
            )
    return out


def _retext(text: str, old: list[GoldToken], new: list[GoldToken]) -> str:
    """Rebuild the sentence text with substituted surface forms by
    walking the tokens LEFT-TO-RIGHT with a cursor, so each replacement
    targets the occurrence at that token's position (a first-match
    replace could hit an earlier duplicate of the same word — or a word
    just substituted in — and desynchronize text from tokens)."""
    pos = 0
    for o, n in zip(old, new):
        idx = text.find(o.word, pos)
        if idx == -1:
            continue
        if o.word != n.word:
            text = text[:idx] + n.word + text[idx + len(o.word):]
        pos = idx + len(n.word)
    return text
