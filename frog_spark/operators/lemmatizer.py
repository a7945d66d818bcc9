"""MBLEM lemmatizer (SURVEY.md §2.4, L1-L6).

Reference semantics: /root/reference/src/mblem_mod.cxx —
  make_instance (267-294): last-20-char right-aligned '='-padded window;
  classify (552-567) over an IGTree whose classes encode tagged edit rules
  ``TAG1+Ddel+Iins|TAG2+...``; edit decode (571-690); tag filter (296-352:
  exact match else fuzzy head match); dedup (362-380); special cases
  (404-479: ABBREVIATION -> word, SPEC keeps case, lowercase otherwise,
  empty result -> the word itself).

Training reproduces Timbl's behavior: the instance base memorizes every
training word (exact-match shortcut) and the IGTree over suffix characters
generalizes edits to unseen words. The trained object is broadcast.
"""

from __future__ import annotations

from collections import defaultdict

from frog_spark.models.igtree import IGTree

WINDOW = 20  # /root/reference/src/mblem_mod.cxx:267-294
PAD = "="


def _instance(word: str) -> list[str]:
    chars = list(word[-WINDOW:])
    return [PAD] * (WINDOW - len(chars)) + chars


def _edit_class(word: str, tag: str, lemma: str) -> str:
    w = word.lower()
    pref = 0
    while pref < len(w) and pref < len(lemma) and w[pref] == lemma[pref]:
        pref += 1
    dele, ins = w[pref:], lemma[pref:]
    cls = tag
    if dele:
        cls += f"+D{dele}"
    if ins:
        cls += f"+I{ins}"
    return cls


def _head(tag: str) -> str:
    return tag.split("(", 1)[0]


class Mblem:
    def __init__(self, tree: IGTree, memory: dict[str, str]):
        self.tree = tree
        self.memory = memory  # word -> class string (exact-match shortcut)

    @classmethod
    def train(cls, triples: list[tuple[str, str, str]]) -> "Mblem":
        """triples: (word, cgn_tag, lemma) — e-Lex-style
        (/root/reference/docs/source/advanced.rst:121-136)."""
        by_word: dict[str, list[str]] = defaultdict(list)
        for word, tag, lemma in triples:
            ec = _edit_class(word, tag, lemma)
            if ec not in by_word[word]:
                by_word[word].append(ec)
        memory = {w: "|".join(alts) for w, alts in by_word.items()}
        instances = [_instance(w) for w in by_word]
        classes = [memory[w] for w in by_word]
        # right-aligned window: the final characters carry the signal, so
        # fix feature order last-to-first instead of re-deriving by gain
        order = list(range(WINDOW - 1, -1, -1))
        return cls(IGTree.train(instances, classes, feature_order=order), memory)

    # -- L3: edit decode ----------------------------------------------------

    @staticmethod
    def _apply(word_lower: str, cls: str) -> tuple[str, str] | None:
        parts = cls.split("+")
        tag = parts[0]
        lemma = word_lower
        for op in parts[1:]:
            if op.startswith("D"):
                suf = op[1:]
                if not lemma.endswith(suf):
                    return None  # deletion must match actual chars
                lemma = lemma[: len(lemma) - len(suf)]
            elif op.startswith("I"):
                lemma = lemma + op[1:]
            elif op.startswith("P"):
                pref = op[1:]
                if lemma.startswith(pref):
                    lemma = lemma[len(pref) :]
        return tag, lemma

    # -- L4: tag filter -------------------------------------------------------

    @staticmethod
    def _tag_matches(cand_tag: str, cgn_tag: str) -> int:
        """2 = exact, 1 = fuzzy (same head), 0 = no
        (cf. filterTag /root/reference/src/mblem_mod.cxx:296-352)."""
        if cand_tag == cgn_tag:
            return 2
        if _head(cand_tag) == _head(cgn_tag):
            return 1
        return 0

    def lemmatize(
        self, word: str, cgn_tag: str, token_class: str = "WORD"
    ) -> list[str]:
        """Return lemma alternatives, best first (L1-L6)."""
        # L6 short-circuits (cheap-case gates run before the model)
        if token_class == "ABBREVIATION":
            return [word]
        head = _head(cgn_tag)
        if head in ("SPEC", "LET", "TW"):
            return [word]

        from frog_spark.operators.tagger import unifilter

        word = unifilter(word)  # P2 char filter before classification
        cls_str = self.memory.get(word) or self.memory.get(word.lower())
        if cls_str is None:
            cls_str, _conf = self.tree.classify(_instance(word.lower()))
        wl = word.lower()
        decoded: list[tuple[int, str]] = []
        for cand in cls_str.split("|"):
            applied = self._apply(wl, cand)
            if applied is None:
                continue
            tag, lemma = applied
            score = self._tag_matches(tag, cgn_tag)
            if score:
                decoded.append((score, lemma))
        if not decoded:
            return [wl]
        best = max(s for s, _ in decoded)
        # L5 dedup: sort by lemma, unique (makeUnique, mblem_mod.cxx:362-380)
        uniq = sorted({lemma for s, lemma in decoded if s == best})
        return uniq
