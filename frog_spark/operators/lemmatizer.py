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

import re
from collections import defaultdict

from frog_spark.models.igtree import IGTree

WINDOW = 20  # /root/reference/src/mblem_mod.cxx:267-294
PAD = "="


def _instance(word: str) -> list[str]:
    chars = list(word[-WINDOW:])
    return [PAD] * (WINDOW - len(chars)) + chars


def _suffix_edits(w: str, lemma: str) -> tuple[str, str]:
    pref = 0
    while pref < len(w) and pref < len(lemma) and w[pref] == lemma[pref]:
        pref += 1
    return w[pref:], lemma[pref:]


def _edit_class(word: str, tag: str, lemma: str) -> str:
    """Tagged edit-rule class ``TAG[+Ppref][+Ddel][+Iins]`` (L2/L3).

    When the word carries a ``ge-`` prefix the lemma lacks (participles:
    gemaakt -> maken), a P(refix)-strip edit is emitted first and the
    suffix edits align the stripped form — far shorter edits than the
    whole-word replacement plain alignment would produce, and the shape
    that generalizes to unseen participles."""
    w = word.lower()
    dele, ins = _suffix_edits(w, lemma)
    cls_ops: list[str] = []
    if w.startswith("ge") and not lemma.startswith("ge"):
        d2, i2 = _suffix_edits(w[2:], lemma)
        if len(d2) + len(i2) < len(dele) - 2 + len(ins):
            cls_ops.append("Pge")
            dele, ins = d2, i2
    if dele:
        cls_ops.append(f"D{dele}")
    if ins:
        cls_ops.append(f"I{ins}")
    return "+".join([tag] + cls_ops)


def _head(tag: str) -> str:
    return tag.split("(", 1)[0]


def _split_tag(tag: str) -> list[str]:
    """split_at_first_of(tag, "(,)") — head + feature parts."""
    return re.split(r"[(),]", tag)


class Mblem:
    def __init__(
        self,
        tree: IGTree,
        memory: dict[str, str],
        token_strip: dict[str, dict[str, int]] | None = None,
        one_one_tags: set[str] | None = None,
        keep_case: bool = False,
    ):
        from frog_spark.sources.resources import load_one_one_tags, load_token_strip

        self.tree = tree
        self.memory = memory  # word -> class string (exact-match shortcut)
        self.token_strip = (
            token_strip if token_strip is not None else load_token_strip()
        )
        self.one_one_tags = (
            one_one_tags if one_one_tags is not None else load_one_one_tags()
        )
        self.keep_case = keep_case  # config 'keep_case' (mblem_mod.cxx:61)

    @classmethod
    def train(cls, triples: list[tuple[str, str, str]]) -> "Mblem":
        """triples: (word, cgn_tag, lemma) — e-Lex-style
        (/root/reference/docs/source/advanced.rst:121-136)."""
        by_word: dict[str, list[str]] = defaultdict(list)
        for word, tag, lemma in triples:
            # classification lowercases (mblem_mod.cxx:404-479, the
            # default !keep_case path), so training must too: a
            # capitalized training surface ('Hangende', gold s23) would
            # otherwise key the memory shortcut and the char-window
            # instance on a form the classify path never presents — the
            # exact-match leaf is then unreachable and the walk falls
            # into whatever the neighbouring suffix cells hold (the
            # round-5g present-participle lexicon rows flipped exactly
            # that cell, measured).
            word = word.lower()
            ec = _edit_class(word, tag, lemma)
            if ec not in by_word[word]:
                by_word[word].append(ec)
        # sorted alternatives: identical to train_mblem_distributed's
        # array_sort(collect_set(...)) so driver- and Spark-trained
        # models carry byte-identical class strings (first-seen order
        # does not exist in a distributed input)
        memory = {w: "|".join(sorted(alts)) for w, alts in by_word.items()}
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
                if not lemma.startswith(pref):
                    return None  # prefix strip must match actual chars
                lemma = lemma[len(pref) :]
        return tag, lemma

    # -- L4: tag filter -------------------------------------------------------

    @staticmethod
    def _tag_matches(cand_tag: str, cgn_tag: str) -> bool:
        """Literal port of filterTag
        (/root/reference/src/mblem_mod.cxx:296-352): exact match, else a
        fuzzy branch that requires equal heads AND that NO lemmatizer tag
        part appears in the POS tag's parts. Since the head itself is
        always shared when heads are equal, the fuzzy branch can never
        succeed — a reference quirk (the comment there describes the
        opposite test), replicated bug-for-bug so the candidate sets
        match."""
        if cand_tag == cgn_tag:
            return True
        pos_parts = [p for p in _split_tag(cgn_tag) if p]
        tag_parts = [p for p in _split_tag(cand_tag) if p]
        if pos_parts and tag_parts and pos_parts[0] == tag_parts[0]:
            found = True
            for pit in tag_parts:
                if pit in pos_parts:
                    found = False
                    break
            return found
        return False

    _MEMO_MAX = 200_000  # bounded per-executor memo (see lemmatize)

    def __getstate__(self):
        # drop the memo so broadcast size stays deterministic (model_mb
        # is a recorded metric) and executors start cold
        state = dict(self.__dict__)
        state.pop("_memo", None)
        state.pop("_bk_idx", None)
        return state

    def _backoff_index(
        self, tree_dist: dict[str, float]
    ) -> dict[str, list[tuple[float, str, str]]]:
        """Per-stop-node index for the distribution backoff: tag head ->
        [(mass, label, candidate)] sorted by mass DESC. _tag_matches can
        only pass when the candidate's head equals the POS tag's head
        (exact match or the equal-heads fuzzy branch), so scanning just
        the matching-head bucket is behavior-identical — and a shallow
        stop node's distribution holds ~1000 labels, which the unsorted
        full scan walked per unseen surface (profiled ~1M _apply calls
        per bench corpus). Cached per distribution dict (one per node,
        shared via norm_dist); the dict ref in the value keeps ids
        stable. Dropped from pickle like _memo."""
        cache = getattr(self, "_bk_idx", None)
        if cache is None:
            cache = self._bk_idx = {}
        ent = cache.get(id(tree_dist))
        if ent is not None and ent[0] is tree_dist:
            return ent[1]
        by_head: dict[str, list[tuple[float, str, str]]] = {}
        for label, mass in tree_dist.items():
            for cand in label.split("|"):
                h = cand.split("+", 1)[0].split("(", 1)[0]
                by_head.setdefault(h, []).append((mass, label, cand))
        for lst in by_head.values():
            lst.sort(key=lambda t: -t[0])
        cache[id(tree_dist)] = (tree_dist, by_head)
        return by_head

    def lemmatize(
        self, word: str, cgn_tag: str, token_class: str = "WORD"
    ) -> list[str]:
        """Memoized per (word, tag, token_class) — pure function of those
        args and the frozen model; one-token sentence variants miss the
        sentence cache but hit here. Callers must treat the returned list
        as immutable (every in-repo consumer only reads / copies it)."""
        key = (word, cgn_tag, token_class)
        memo = getattr(self, "_memo", None)
        if memo is None:
            memo = self._memo = {}
        hit = memo.get(key)
        if hit is not None:
            return hit
        out = self._lemmatize_uncached(word, cgn_tag, token_class)
        if len(memo) >= self._MEMO_MAX:
            memo.clear()
        memo[key] = out
        return out

    def _lemmatize_uncached(
        self, word: str, cgn_tag: str, token_class: str = "WORD"
    ) -> list[str]:
        """Return lemma alternatives (Classify,
        /root/reference/src/mblem_mod.cxx:404-479): ABBREVIATION -> word;
        token-strip rules -> strip N chars; one-one tags -> word as-is;
        else lowercase (unless keep_case), classify, filterTag,
        makeUnique; empty -> the (lowercased) word itself."""
        from frog_spark.operators.tagger import unifilter

        word = unifilter(word)  # P2 char filter before classification
        if token_class == "ABBREVIATION":
            return [word]
        strip = self.token_strip.get(cgn_tag)
        if strip is not None:
            n = strip.get(token_class)
            if n is not None:
                stripped = word[: len(word) - n] if n < len(word) else word
                return [stripped if stripped else word]
        if cgn_tag in self.one_one_tags:
            return [word]
        # legacy guard for tags outside the one-one list whose lemma is
        # conventionally the surface form (SPEC/LET subtags not listed)
        if _head(cgn_tag) in ("SPEC", "LET"):
            return [word]
        if not self.keep_case:
            word = word.lower()
        cls_str = self.memory.get(word) or self.memory.get(word.lower())
        from_tree = cls_str is None
        tree_dist: dict[str, float] | None = None
        if from_tree:
            # one trie walk serves both the label and the distribution
            # the filter-miss backoff below may need
            cls_str, tree_dist = self.tree.classify_with_dist(
                _instance(word.lower())
            )
        # keep_case decodes on the original-case surface (the edits act
        # on the lowercase tail either way); the default path lowercased
        # ``word`` above, so behavior there is unchanged
        decode_base = word if self.keep_case else word.lower()
        # cost = edit-script length (chars deleted + inserted + prefix
        # stripped): the primary sort key below. When two lemma
        # candidates survive the tag filter ('plant' WW -> planten via
        # +Ien vs plannen via +Dt+Innen), the minimal edit is the
        # systematically better prior — homograph surfaces are almost
        # always closer to their own paradigm's lemma than to the
        # competing one (round-5c probe p69 class).
        decoded: dict[str, int] = {}
        for cand in cls_str.split("|"):
            applied = self._apply(decode_base, cand)
            if applied is None:
                continue
            tag, lemma = applied
            if self._tag_matches(tag, cgn_tag):
                cost = sum(len(op) - 1 for op in cand.split("+")[1:])
                if lemma not in decoded or cost < decoded[lemma]:
                    decoded[lemma] = cost
        if not decoded:
            if from_tree and tree_dist is not None:
                # Distribution backoff for UNSEEN surfaces only: the
                # leaf's majority class carried no tag-matching reading
                # (e.g. an unseen '-ooien' noun in a suffix neighborhood
                # the lexicon's verbs dominate: the label is the verb
                # reading, but the node's minority mass still holds
                # N+Den from 'toernooien'). The reference never hits
                # this shape because e-Lex's 595k entries blanket the
                # suffix space (mblem_mod.cxx:404-479 just falls back to
                # the surface); with a generated lexicon the minority
                # mass at the same node is real evidence, so scan it by
                # mass before giving up. Memory (trained-surface) paths
                # never reach here — gold behavior is untouched.
                best: tuple[tuple, str] | None = None
                # only the matching-tag-head bucket can pass the filter
                # (see _backoff_index); entries come sorted by mass
                # DESC, and the winning key's primary term is -mass, so
                # once any candidate decodes, no strictly-lower-mass
                # entry can beat it (mass ties still resolve by
                # cost/lemma exactly as before — the key tuple, not
                # scan order, picks the winner)
                entries = self._backoff_index(tree_dist).get(
                    _head(cgn_tag), ()
                )
                for mass, label, cand in entries:
                    if best is not None and mass < -best[0][0]:
                        break
                    if label == cls_str:
                        continue
                    applied = self._apply(decode_base, cand)
                    if applied is None:
                        continue
                    tag, lemma = applied
                    if not self._tag_matches(tag, cgn_tag):
                        continue
                    cost = sum(len(op) - 1 for op in cand.split("+")[1:])
                    key = (-mass, cost == 0, cost, lemma)
                    if best is None or key < best[0]:
                        best = (key, lemma)
                if best is not None:
                    return [best[1]]
            return [word]
        # L5 dedup + unique (makeUnique, mblem_mod.cxx:362-380); sorted
        # by (identity-last, edit cost, lemma): among real analyses the
        # minimal edit wins, but a zero-edit identity class never beats
        # a non-identity alternative ('Hangende' -> hangen, not
        # hangende — gold s23)
        return sorted(
            decoded, key=lambda lem: (decoded[lem] == 0, decoded[lem], lem)
        )
