"""MBMA morphological analyzer (SURVEY.md §2.5, M1-M8).

Reference semantics: /root/reference/src/mbma_mod.cxx —
  make_instances (299-336): one instance per character, 6 left + focus +
  6 right, '_' padded; IGTree classify (1129-1162); rule assembly
  (src/mbma_rule.cxx:317-483): morpheme-boundary classes segment the word;
  head-tag filter (565-648); pass-through for LET/SPEC/ABBREVIATION
  (1009-1050); compound typing over the bracket structure
  (src/mbma_brackets.cxx:560-720).

Simplification (documented): the reference's 2708 CELEX classes collapse to
a boundary alphabet {P(refix), S(uffix), I(nflection), X(stem), 0(inside)};
segmentation + compound typing are derived from it. Known words hit the
instance-base memory exactly (Timbl exact-match shortcut) which also serves
non-surface analyses like ``is -> [zijn]``; unseen words are segmented by
the char-window IGTree.
"""

from __future__ import annotations

import re

from frog_spark.models.igtree import IGTree

CONTEXT = 6  # LEFT/RIGHT=6, /root/reference/src/mbma_mod.cxx:57-58
PAD = "_"

PREFIXES = {"be", "ver", "ge", "ont", "her", "op", "uit", "aan", "in", "na"}
SUFFIXES = {"ing", "er", "isch", "end", "baar", "bar", "heid", "lijk", "te", "sel"}
INFLECTIONS = {"e", "en", "t", "n", "an", "s", "den"}

_SEG_RE = re.compile(r"\[([^\]]*)\]")


def parse_segmentation(morph: str) -> list[str]:
    return _SEG_RE.findall(morph)


def _segment_classes(word_lower: str, segs: list[str]) -> list[str] | None:
    """Per-char boundary classes for an aligned surface segmentation."""
    if "".join(segs) != word_lower:
        return None
    classes = ["0"] * len(word_lower)
    pos = 0
    for i, seg in enumerate(segs):
        if i == 0 and seg in PREFIXES and len(segs) > 1:
            cls = "P"
        elif i == len(segs) - 1 and seg in INFLECTIONS and len(segs) > 1:
            cls = "I"
        elif i > 0 and seg in SUFFIXES:
            cls = "S"
        else:
            cls = "X"
        classes[pos] = cls
        pos += len(seg)
    return classes


def _instances(word_lower: str) -> list[list[str]]:
    padded = PAD * CONTEXT + word_lower + PAD * CONTEXT
    return [
        list(padded[i : i + 2 * CONTEXT + 1]) for i in range(len(word_lower))
    ]


class Mbma:
    def __init__(self, tree: IGTree, memory: dict[str, str]):
        self.tree = tree
        self.memory = memory  # word(as written) -> morph string

    @classmethod
    def train(cls, pairs: list[tuple[str, str]]) -> "Mbma":
        """pairs: (word, morph_string like ``[ver][zeker][ing]``)."""
        memory: dict[str, str] = {}
        instances: list[list[str]] = []
        classes: list[str] = []
        for word, morph in pairs:
            memory[word] = morph
            wl = word.lower()
            segs = parse_segmentation(morph)
            char_classes = _segment_classes(wl, segs)
            if char_classes is None:
                continue  # non-surface analysis: memory-only (e.g. is->[zijn])
            for inst, c in zip(_instances(wl), char_classes):
                instances.append(inst)
                classes.append(c)
        # focus char first, then nearest context outward — mirrors the
        # information-gain ordering MBMA's instance base converges to
        order = [CONTEXT]
        for d in range(1, CONTEXT + 1):
            order += [CONTEXT - d, CONTEXT + d]
        tree = IGTree.train(instances, classes, feature_order=order)
        return cls(tree, memory)

    def analyze(
        self, word: str, cgn_head: str, token_class: str = "WORD"
    ) -> tuple[str, str]:
        """Return (morph_string, compound_string).

        compound_string: '0' or e.g. 'NN' when >=2 stem segments
        (speculateCompoundType, /root/reference/src/mbma_brackets.cxx:560-720).
        """
        # M8 pass-through: LET/SPEC heads & abbreviations are one morpheme
        if token_class == "ABBREVIATION" or cgn_head in ("LET", "SPEC", "TW"):
            return f"[{word}]", "0"

        from frog_spark.operators.tagger import unifilter

        word = unifilter(word)  # P2 char filter before classification
        hit = self.memory.get(word) or self.memory.get(word.lower())
        if hit is not None:
            segs = parse_segmentation(hit)
        else:
            wl = word.lower()
            if not wl:
                return "[]", "0"
            labels, _ = self.tree.classify_batch(_instances(wl))
            # first char always starts a morpheme (class '0' -> 'X',
            # cf. mbma_mod.cxx:1158-1160)
            if labels[0] == "0":
                labels[0] = "X"
            segs = []
            cur = wl[0]
            for ch, lab in zip(wl[1:], labels[1:]):
                if lab != "0":
                    segs.append(cur)
                    cur = ch
                else:
                    cur += ch
            segs.append(cur)
        morph = "".join(f"[{s}]" for s in segs)
        compound = self._compound_type(segs, cgn_head)
        return morph, compound

    @staticmethod
    def _compound_type(segs: list[str], cgn_head: str) -> str:
        stems = [
            s
            for i, s in enumerate(segs)
            if len(s) >= 3
            and s not in SUFFIXES
            and not (i == 0 and s in PREFIXES)
            and s not in INFLECTIONS
        ]
        if len(stems) < 2:
            return "0"
        letter = {"N": "N", "WW": "V", "ADJ": "A", "BW": "B"}.get(cgn_head)
        if letter is None:
            return "0"
        return letter * min(len(stems), 3)
