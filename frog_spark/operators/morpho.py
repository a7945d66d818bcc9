"""MBMA morphological analyzer (SURVEY.md §2.5, M1-M8).

Reference semantics: /root/reference/src/mbma_mod.cxx —
  make_instances (299-336): one instance per character, 6 left + focus +
  6 right, '_' padded; IGTree classify (1129-1162, incl. the first-char
  0->X fix at 1158-1160); the full rule machinery (M3-M6: alternative
  expansion, delete/insert/hide/replace edits with char validation,
  inflection resolution, CELEX head-tag filter with the 1.0/0.8/0.5
  confidence ladder, subtag top-k + longest-segmentation preference) lives
  in mbma_rules.py; pass-through for LET/SPEC/ABBREVIATION (1009-1050);
  compound typing over the bracket structure
  (src/mbma_brackets.cxx:560-773).

Training-class synthesis (documented deviation): the reference's IGTree is
trained on CELEX (3.2M instances, 2708 classes); no such lexicon ships
here, so per-char CELEX-style classes are SYNTHESIZED from the gold
corpus's segmentations + POS tags — stems get their CELEX tag, trailing
inflections get bare inflection codes, derivational suffixes get rewrite
classes like ``N_V*``, and non-surface analyses (is -> [zijn]) get
replace-edit classes like ``V+Rzijn>is``. The synthesized classes are
round-trip-verified through the rule engine at train time; words that do
not reproduce their gold analysis fall back to an exceptions table.
"""

from __future__ import annotations

import re

from frog_spark.models.igtree import IGTree
from frog_spark.operators import mbma_rules as mr

CONTEXT = 6  # LEFT/RIGHT=6, /root/reference/src/mbma_mod.cxx:57-58
PAD = "_"

_SEG_RE = re.compile(r"\[([^\]]*)\]")

# verbal particles: BracketLeaf gives these PARTICLE/PARTICIPLE status
# (mbma_brackets.cxx:268-273); her/ont added as plain V-stems
_PARTICLES = {"be", "ge", "ver", "ex", "her", "ont"}
# prepositional prefixes of separable compounds -> CELEX P
_P_PREFIXES = {
    "aan", "op", "uit", "in", "na", "bij", "voor", "om", "over",
    "tegen", "onder", "achter", "af", "mee", "toe",
}

# trailing inflection segments per CELEX tag -> inflection code
_INFLECT_SEGS = {
    "V": {"t": "t", "en": "i", "an": "i", "n": "i", "te": "v", "de": "v",
          "den": "v", "d": "p", "end": "p", "e": "E"},
    "N": {"en": "m", "n": "m", "s": "m", "je": "d", "tje": "d"},
    "A": {"e": "E", "er": "C", "st": "S"},
}

# derivational suffixes: seg -> (result tag, base tag); synthesized as the
# rewrite class ``{result}_{base}*``
_DERIV_SUFFIXES = {
    "ing": ("N", "V"), "er": ("N", "V"), "heid": ("N", "A"),
    "sel": ("N", "V"), "isch": ("A", "N"), "lijk": ("A", "N"),
    "baar": ("A", "V"), "bar": ("A", "V"), "end": ("A", "V"),
    "ig": ("A", "N"), "elijk": ("A", "N"), "aar": ("N", "V"),
}


def parse_segmentation(morph: str) -> list[str]:
    return _SEG_RE.findall(morph)


def _instances(word: str) -> list[list[str]]:
    padded = PAD * CONTEXT + word + PAD * CONTEXT
    return [list(padded[i : i + 2 * CONTEXT + 1]) for i in range(len(word))]


def synthesize_classes(base: str, segs: list[str], celex_tag: str) -> list[str]:
    """Per-char CELEX-style classes for a surface-aligned segmentation.

    Walks the segments right-to-left: trailing inflections first, then the
    derivational chain (tracking the expected base tag), then stems —
    rightmost stem gets the expected tag, leading particles stay verbal,
    leading prepositions become P.
    """
    assert "".join(segs) == base
    kinds: list[str] = [""] * len(segs)
    expected = celex_tag
    i = len(segs) - 1
    infl_table = _INFLECT_SEGS.get(expected, {})
    while i > 0 and segs[i] in infl_table:
        kinds[i] = infl_table[segs[i]]
        i -= 1
    while (
        i > 0
        and segs[i] in _DERIV_SUFFIXES
        and _DERIV_SUFFIXES[segs[i]][0] == expected
    ):
        res, base_tag = _DERIV_SUFFIXES[segs[i]]
        kinds[i] = f"{res}_{base_tag}*"
        expected = base_tag
        i -= 1
    for j in range(i, -1, -1):
        seg = segs[j]
        if j == 0 and i > 0 and seg in _PARTICLES:
            kinds[j] = "V"
        elif j == 0 and i > 0 and seg in _P_PREFIXES:
            kinds[j] = "P"
        else:
            kinds[j] = expected
    classes = ["0"] * len(base)
    pos = 0
    for seg, cls in zip(segs, kinds):
        classes[pos] = cls
        pos += len(seg)
    return classes


class Mbma:
    def __init__(
        self,
        tree: IGTree,
        memory: dict[str, list[str]],
        exceptions: dict[str, tuple[str, str]],
    ):
        self.tree = tree
        self.memory = memory  # clean word -> per-char class list
        self.exceptions = exceptions  # clean word -> (morph, compound)

    @classmethod
    def train(cls, triples: list[tuple[str, str, str]]) -> "Mbma":
        """triples: (word, cgn_tag, morph_string like ``[ver][zeker][ing]``).

        Every trained word is round-trip-verified through the rule engine;
        words whose synthesized classes do not reproduce the gold morph
        string exactly go to the exceptions table instead (guaranteeing
        gold parity regardless of engine corner cases).
        """
        groups: dict[str, list[tuple[str, str, str, object]]] = {}
        order: list[str] = []
        for word, tag, morph in triples:
            row = cls.train_word_row(word, tag, morph, set())
            if row is None:
                continue
            kind, key, payload = row
            if key not in groups:
                groups[key] = []
                order.append(key)
            groups[key].append((kind, tag, morph, payload))
        memory: dict[str, list[str]] = {}
        exceptions: dict[str, tuple[str, str]] = {}
        instances: list[list[str]] = []
        classes_out: list[str] = []
        for key in order:
            kind, payload = cls.resolve_key_rows(key, groups[key])
            if kind == "exc":
                exceptions[key] = (payload, "0")
                exceptions[key.lower()] = (payload, "0")
                continue
            memory[key] = payload
            for inst, c in zip(_instances(key.lower()), payload):
                instances.append(inst)
                classes_out.append(c)
        tree = IGTree.train(
            instances, classes_out, feature_order=cls.feature_order()
        )
        return cls(tree, memory, exceptions)

    @classmethod
    def resolve_key_rows(
        cls, key: str, rows: list[tuple[str, str, str, object]]
    ) -> tuple[str, object]:
        """Resolve all training rows of ONE cleaned surface — ordered
        (kind, tag, morph, payload) tuples — to the surface's final
        (kind, payload). The first row wins as in every prior round
        (corpus convention anchors precede lexicon rows); additional
        'mem' readings with other tags merge into per-char alternative
        classes when the merge round-trips (homographs: 'zagen' is
        zien's past plural AND zaag's plural — the head-tag filter then
        picks the right reading per token). Shared by the driver and
        distributed trainers so both stay byte-identical."""
        kind0, _t0, _m0, p0 = rows[0]
        if kind0 == "exc":
            return ("exc", p0)
        ents: list[tuple[str, str, list[str]]] = []
        seen: set[tuple[str, str]] = set()
        for kind, tag, morph, payload in rows:
            if kind != "mem" or (tag, morph) in seen:
                continue
            seen.add((tag, morph))
            ents.append((tag, morph, list(payload)))
        if len(ents) > 1:
            merged = cls.merge_homograph_rows(key, sorted(ents))
            if merged is not None:
                return ("mem", merged)
        return ("mem", list(p0))

    @classmethod
    def merge_homograph_rows(
        cls, base: str, entries: list[tuple[str, str, list[str]]]
    ) -> list[str] | None:
        """Merge 'mem' rows (tag, morph, classes) that share one cleaned
        surface into per-char classes with '|' alternatives — the same
        ambiguity CELEX carries and the reference resolves through
        alternative expansion (M3, mbma_rules.execute) + the head-tag
        filter (mbma_mod.cxx:1009-1050). Entries must arrive in a
        deterministic order (callers sort); the merge stands only if the
        merged payload round-trips EVERY entry's morph under its own
        tag, else None and the caller keeps its single-row fallback."""
        if len({len(e[2]) for e in entries}) != 1:
            return None
        merged = []
        for i in range(len(entries[0][2])):
            alts: list[str] = []
            for _t, _m, classes in entries:
                for a in classes[i].split("|"):
                    if a not in alts:
                        alts.append(a)
            merged.append("|".join(alts))
        for tag, morph, _classes in entries:
            head = tag.split("(", 1)[0]
            feats_str = tag.split("(", 1)[1].rstrip(")") if "(" in tag else ""
            feats = [f for f in feats_str.split(",") if f]
            got, _ = cls._run_engine(base, merged, head, feats, "")
            if got != morph:
                return None
        return merged

    @staticmethod
    def feature_order() -> list[int]:
        """Center-out fixed order for the 6+1+6 char window."""
        order = [CONTEXT]
        for d in range(1, CONTEXT + 1):
            order += [CONTEXT - d, CONTEXT + d]
        return order

    @classmethod
    def train_word_row(
        cls, word: str, tag: str, morph: str, seen: set[str]
    ) -> tuple[str, str, object] | None:
        """One lexicon row -> ("mem", base, char_classes) for a
        round-trip-verified analysis, ("exc", w, morph) for the
        exceptions table, or None (skipped). The SINGLE per-word
        training rule, shared by the driver trainer above and the
        distributed trainer (models/distributed.train_mbma_distributed)
        so both produce identical memory/instances."""
        from frog_spark.operators.tagger import unifilter

        head = tag.split("(", 1)[0]
        if head in ("LET", "SPEC"):
            return None  # pass-through at inference (M8)
        w = unifilter("".join(word.split()))
        if w in seen:
            return None
        seen.add(w)
        celex = mr.TAG_MAIN.get(head)
        if celex is None or celex in ("SPEC", "LET"):
            return None
        segs = parse_segmentation(morph)
        joined = "".join(segs)
        if joined == w:
            base = w
            char_classes = synthesize_classes(base, segs, celex)
        elif joined == w.lower():
            base = w.lower()
            char_classes = synthesize_classes(base, segs, celex)
        elif len(segs) == 1 and w:
            # non-surface analysis (is -> [zijn]): one replace edit
            base = w.lower()
            char_classes = ["0"] * len(base)
            char_classes[0] = f"{celex}+R{segs[0]}>{base}"
        else:
            return ("exc", w, morph)
        # round-trip verification through the engine
        feats_str = tag.split("(", 1)[1].rstrip(")") if "(" in tag else ""
        feats = [f for f in feats_str.split(",") if f]
        got, _ = cls._run_engine(base, char_classes, head, feats, "")
        if got != morph:
            return ("exc", w, morph)
        return ("mem", base, char_classes)

    @staticmethod
    def _run_engine(
        base: str,
        char_classes: list[str],
        head: str,
        feats: list[str],
        next_tag: str,
    ) -> tuple[str, str]:
        """classes -> rules -> head/subtag filters -> best analysis.
        Mirrors Mbma::Classify (mbma_mod.cxx:1009-1050) after tokenization.
        """
        char_classes = list(char_classes)
        if char_classes and char_classes[0] == "0":
            char_classes[0] = "X"  # first char starts a morpheme (1158-1160)
        analyses = mr.execute(base, next_tag, char_classes)
        analyses = mr.filter_head_tag(analyses, head)
        analyses = mr.filter_sub_tags(analyses, feats)
        if not analyses:
            return f"[{base}]", "0"  # storeResult fallback (973-1007)
        best = analyses[0]
        best.compound = best.brackets.speculate_compound_type()
        morph = mr.flatten(best.pretty_string())
        compound = "0" if best.compound == mr.NONE else best.compound
        return morph, compound

    _MEMO_MAX = 200_000  # bounded per-executor memo (see analyze)

    def __getstate__(self):
        # drop the memo so broadcast size stays deterministic (model_mb
        # is a recorded metric) and executors start cold
        state = dict(self.__dict__)
        state.pop("_memo", None)
        state.pop("_cvocab", None)
        return state

    def analyze(
        self,
        word: str,
        cgn_tag: str,
        token_class: str = "WORD",
        next_tag: str = "",
        lemma: str | None = None,
    ) -> tuple[str, str]:
        """Return (morph_string, compound_string).

        ``next_tag`` is the POS tag of the following word (P3), consumed by
        the V2I inflection cleanup (check_next + getCleanInflect,
        mbma_mod.cxx:446-510).

        Memoized per (word, tag, token_class, next_tag): the analysis is a
        pure function of those four args and the frozen model, and corpora
        repeat tokens heavily even when whole sentences differ (the
        sentence-level cache in plans/pipeline.py misses on any one-token
        variant; this memo converts those misses into per-token hits —
        MBMA was ~26% of the uncached annotate profile)."""
        key = (word, cgn_tag, token_class, next_tag, lemma)
        memo = getattr(self, "_memo", None)
        if memo is None:
            memo = self._memo = {}
        hit = memo.get(key)
        if hit is not None:
            return hit
        out = self._analyze_uncached(word, cgn_tag, token_class, next_tag, lemma)
        if len(memo) >= self._MEMO_MAX:
            memo.clear()
        memo[key] = out
        return out

    def _analyze_uncached(
        self,
        word: str,
        cgn_tag: str,
        token_class: str = "WORD",
        next_tag: str = "",
        lemma: str | None = None,
    ) -> tuple[str, str]:
        head = cgn_tag.split("(", 1)[0]
        # M8 pass-through: LET/SPEC heads & abbreviations are one morpheme
        if token_class == "ABBREVIATION" or head in ("LET", "SPEC"):
            return f"[{word}]", "0"

        from frog_spark.operators.tagger import unifilter

        w = unifilter("".join(word.split()))  # P2 filter + whitespace HACK
        hit = self.exceptions.get(w) or self.exceptions.get(w.lower())
        if hit is not None:
            return hit
        base = w if w in self.memory else w.lower()
        char_classes = self.memory.get(base)
        trained = char_classes is not None
        if char_classes is None:
            base = w.lower()
            if not base:
                return "[]", "0"
            char_classes, _ = self.tree.classify_batch(_instances(base))
        feats_str = cgn_tag.split("(", 1)[1].rstrip(")") if "(" in cgn_tag else ""
        feats = [f for f in feats_str.split(",") if f]
        morph, compound = self._run_engine(base, char_classes, head, feats, next_tag)
        if trained:
            # never rewrite a TRAINED word's analysis (gold parity):
            # the compound fallback exists for words MBMA never saw
            return morph, compound
        if morph == f"[{base}]" and base.isalpha():
            sfx = self._suffix_fallback(base, head, feats, lemma)
            if sfx is not None:
                # an INFLECTED compound keeps the compound split its
                # uninflected form would get ('overtochten' ->
                # [over][tocht][en], the [tuin][mann][en] convention):
                # try the compound split on the suffix split's stem
                if head in ("N", "ADJ") and "][" in sfx:
                    seg_end = sfx.index("][")
                    stem0 = sfx[1:seg_end]
                    if len(stem0) >= 6 and stem0.isalpha():
                        cs = self._compound_split(stem0)
                        if cs is not None:
                            return (
                                cs + sfx[seg_end + 1:],
                                "NN" if head == "N" else "NA",
                            )
                return sfx, "0"
        if (
            morph == f"[{base}]"
            and head in ("N", "ADJ")
            and len(base) >= 6
            and base.isalpha()
        ):
            # compound fallback (the reference's MBMA learns compound
            # boundaries from CELEX's 3.2M analyses; the char-window
            # tree alone cannot segment a compound of two KNOWN words
            # it never saw concatenated — 'kaasboer', round-5d probe).
            # Split only when both halves are independently attested in
            # the training vocabulary; the right (head) half contributes
            # its own segmentation ('tuinmannen' -> [tuin][mann][en]),
            # linking -s/-en stays in the left segment ([rechts][zaak],
            # [zieken][huis] conventions).
            split = self._compound_split(base)
            if split is not None:
                return split, ("NN" if head == "N" else "NA")
        elif head in ("N", "ADJ") and morph.startswith("[") and "][" in morph:
            # the engine may segment a SUFFIX off an unanalyzed compound
            # stem ('touwslager' -> [touwslag][er]): try the compound
            # split on the FIRST segment, with the right half required
            # as a whole vocabulary word
            seg_end = morph.index("][")
            seg0 = morph[1:seg_end]
            if len(seg0) >= 6 and seg0.isalpha():
                vocab = self._compound_vocab()
                for i in range(len(seg0) - 3, 2, -1):
                    left, right = seg0[:i], seg0[i:]
                    if right in vocab and (
                        left in vocab
                        or (left.endswith("s") and left[:-1] in vocab)
                        or (left.endswith("en") and left[:-2] in vocab)
                    ):
                        morph = f"[{left}][{right}]" + morph[seg_end + 1 :]
                        compound = "NN" if head == "N" else "NA"
                        break
        return morph, compound

    def _compound_vocab(self) -> dict:
        """surface -> morph for open-class training vocabulary (gold
        corpus first — the convention anchor — then the inflection
        lexicon). Built lazily per process and excluded from pickling
        (__getstate__), so the broadcast stays small; the build is a
        deterministic pure function of committed resources."""
        vocab = getattr(self, "_cvocab", None)
        if vocab is None:
            from frog_spark.sources.inflect import inflection_morph_rows
            from frog_spark.sources.resources import load_gold_corpus

            vocab = {}
            for s in load_gold_corpus():
                for t in s.tokens:
                    w = t.word.lower()
                    if (
                        t.pos.startswith(("N(", "ADJ(", "WW("))
                        and w.isalpha()
                        and len(w) >= 3
                    ):
                        vocab.setdefault(w, t.morph)
            for w, tag, m in inflection_morph_rows():
                if (
                    tag.startswith(("N(", "ADJ(", "WW("))
                    and w.isalpha()
                    and len(w) >= 3
                ):
                    vocab.setdefault(w.lower(), m)
            # treebank generator vocabulary last (round 5j): its morph
            # table covers surfaces neither gold nor the inflection
            # lexicon lists ('tocht', 'kant'), so compounds built on
            # them ('overtocht', 'overkant') become splittable
            from frog_spark.sources.treebank import _morph_table

            for w, m in _morph_table().items():
                if w.isalpha() and len(w) >= 3 and w[:1].islower():
                    vocab.setdefault(w.lower(), m)
            self._cvocab = vocab
        return vocab

    #: prepositional left members of Dutch compounds ('overtocht',
    #: 'voorstel', 'bijgebouw' — the gold corpus's own [aan][pak]
    #: convention splits them); closed set, morph = the member itself
    _PREP_COMPOUND_LEFT = frozenset({
        "over", "voor", "achter", "onder", "boven", "tussen", "tegen",
        "bij", "om", "na", "aan", "uit", "in", "op",
    })

    def _suffix_fallback(
        self, base: str, head: str, feats: list[str], lemma: str | None
    ) -> str | None:
        """Tag-driven productive-suffix split for UNSEEN surfaces the
        char-window tree left monomorphemic (round 5j: the 5i probe's
        'wespen'/'aast'/'legen' read [wespen]/[aast]/[legen]). The CGN
        tag names the inflection the surface must carry, so the split
        is deterministic — the only ambiguous case is pv,tgw,met-t on
        a stem-final -t verb ('smacht' is smacht+0, 'aast' is aas+t),
        which the LEMMA resolves via the real stem-derivation rules
        (inflect.verb_stem). Trained surfaces never reach this path
        (gold parity), and a None return falls through unchanged."""
        if head == "N" and "mv" in feats:
            if "dim" in feats:
                if base.endswith("jes"):
                    return f"[{base[:-3]}][je][s]"
                return None
            if base.endswith("ën"):
                return f"[{base[:-2]}][ën]"
            if base.endswith("en") and len(base) > 4:
                return f"[{base[:-2]}][en]"
            if base.endswith("s") and len(base) > 3:
                return f"[{base[:-1]}][s]"
            return None
        if head != "WW":
            return None
        stem = None
        if lemma and lemma.endswith("en"):
            from frog_spark.sources.inflect import verb_stem

            try:
                stem = verb_stem(lemma)
            except Exception:
                stem = None
        if "vd" in feats and base.startswith("ge") and len(base) > 5:
            if (
                stem
                and lemma.startswith("ge")
                and base in (stem + "d", stem + "t")
            ):
                # ge-INITIAL-STEM verbs (gebeuren, geloven) take no
                # participle prefix: 'gebeurd' is gebeur+d
                return f"[{base[:-1]}][{base[-1]}]"
            if base.endswith("en"):
                # strong participles keep the -en fused ([ge][sloten],
                # the treebank/inflect convention)
                return f"[ge][{base[2:]}]"
            if base.endswith(("d", "t")):
                return f"[ge][{base[2:-1]}][{base[-1]}]"
            return None
        if "pv" in feats and "verl" in feats:
            # the LEMMA must confirm a weak preterite: '-den'/'-ten'
            # alone cannot tell 'tuurden' (tuur+den) from the strong
            # 'hielden', and strong preterites stay monomorphemic
            if stem is None:
                return None
            if base.endswith(("den", "ten")) and base == stem + base[-3:]:
                return f"[{base[:-3]}][{base[-3:]}]"
            if base.endswith(("de", "te")) and base == stem + base[-2:]:
                return f"[{base[:-2]}][{base[-2:]}]"
            return None
        if ("inf" in feats or ("pv" in feats and "mv" in feats)) and \
                base.endswith("en") and len(base) > 4:
            return f"[{base[:-2]}][en]"
        if "pv" in feats and "tgw" in feats and "met-t" in feats and \
                base.endswith("t"):
            if stem == base:
                return None  # wacht-class: the -t IS the stem
            if stem and base == stem + "t":
                return f"[{stem}][t]"
            if not base.endswith(("dt", "tt")) and len(base) > 3:
                return f"[{base[:-1]}][t]"
        return None

    def _compound_split(self, base: str) -> str | None:
        vocab = self._compound_vocab()
        n = len(base)
        # left members may be 2-char prepositions ('op', 'in'); the
        # right-half vocabulary gate keeps short lefts from producing
        # junk splits
        for i in range(n - 3, 1, -1):  # longest LEFT first
            right = base[i:]
            rm = vocab.get(right)
            if rm is None:
                continue
            left = base[:i]
            if (
                left in vocab
                or left in self._PREP_COMPOUND_LEFT
                or (left.endswith("s") and left[:-1] in vocab)
                or (left.endswith("en") and left[:-2] in vocab)
            ):
                return f"[{left}]" + rm
        return None
