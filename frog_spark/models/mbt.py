"""MBT-style memory-based sequence tagger.

Re-implements the tagger architecture Frog gets from MbtAPI
(reference: /root/reference/src/tagger_base.cxx:232-234 construction,
450-462 ``<utt>`` sentence-boundary marking, 517-551 Classify;
published as Daelemans, Zavrel, Berck & Gillis 1996, "MBT: A Memory-Based
Part of Speech Tagger-Generator").

Two case bases (both IGTree):
  * known words:   (prev2_tag, prev_tag, word, next_ambitag) -> tag —
    MBT's 'ddfa' pattern (TWO left context tags; the second one is what
    separates 'zou ... goed zijn' (infinitive) from 'de kosten hoog
    zijn' (finite plural): the word/prev/next features are identical)
  * unknown words: (prev_tag, capitalized, has_digit, has_hyphen,
                    last3, last2, last1, next_ambitag) -> tag
plus a lexicon word -> tag distribution (the ambitag source).

Tagging is left-to-right per sentence (prev_tag = previous prediction),
exactly the sequential dependency Frog has — so the Spark stage runs it
inside a pandas UDF over a batch of sentences, never across sentences.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Sequence

from frog_spark.models.igtree import IGTree

BOUNDARY = "<utt>"


def _word_key(word: str) -> str:
    return word if not word.isupper() else word.lower()


def _unknown_feats(prev_tag: str, word: str, next_ambi: str) -> list[str]:
    """Unknown-word features. Suffix letters are INDIVIDUAL characters
    (MBT's 'sss' pattern features, one letter each), not whole suffix
    strings: IGTree stops at the first unmatched branch, so a last3
    string like 'uws' that never occurred in training would end the walk
    before ANY suffix evidence is used, falling back to the lowercase
    class prior (which a verb-rich corpus turns into WW — measured on
    the held-out corpus: nieuws->WW, lang->N). Per-character features
    back off gracefully: last letter, then second-last, then third."""
    lw = word.lower()
    return [
        prev_tag,
        "C" if word[:1].isupper() else "c",
        "D" if any(ch.isdigit() for ch in word) else "d",
        "H" if "-" in word else "h",
        lw[-3] if len(lw) >= 3 else "_",
        lw[-2] if len(lw) >= 2 else "_",
        lw[-1:],
        next_ambi,
        # s4 (round-5m probe p256): with only three suffix letters,
        # 'scherven' (N mv), 'geschreven' (invariant ADJ) and 'haven'
        # (N ev) are feature-IDENTICAL after LID before an unknown
        # word — a hard majority tie no amount of training mass can
        # break. The fourth letter ('r'/'e'/'a' here) separates the
        # Dutch plural/participle/stem-final '-ven/-den/-ten' families.
        lw[-4] if len(lw) >= 4 else "_",
        # G-flag (round-5n probe p273/p274): an unseen weak participle
        # 'geweekt' and an unseen 3sg 'kweekt' share ALL suffix letters
        # (s1-s4 'eekt') and, in passive position, the left tag and
        # right ambitag too — MBT's suffix-only pattern cannot see the
        # ge- prefix that decides vd vs pv. BINARY like the C/c
        # capitalization flag, not a prefix bigram: a bigram feature in
        # the same position was swept first and fragmented every
        # unknown cell (~500 branches; held-out R 1.0 -> 0.986, all
        # six probes down), while a two-way split keeps both sides of
        # every node populated.
        "G" if lw.startswith("ge") else "g",
    ]


#: unknown-tree walk order: left context first (MBT's 'd' context
#: features lead its unknown pattern), capitalization, the LAST letter,
#: then the right ambitag, then the deeper suffix letters. Context-first
#: matters (with suffixes first, an unseen letter combination ends the
#: walk before the context is ever consulted), and the last letter must
#: come BEFORE the right ambitag: when the next word is itself unknown
#: (__UNK__ stops the walk) the plural/infinitive -n and 3sg -t evidence
#: would otherwise never be read. Swept on the held-out corpus:
#: 0.892 -> 0.911 from moving s1 ahead of next_ambi, at gold parity.
#: s4 (index 8) walks right after s3 — one level deeper on the same
#: graceful per-character suffix backoff (see _unknown_feats); the
#: prefix bigram (index 9) right after s1, BEFORE the right ambitag
#: and deeper suffix letters: vd-vs-pv is decided by ge-/be-/ver- vs
#: stem-initial letters, and placing it behind the full suffix walk
#: (swept first) never fired — the walk died at an unseen s2-s4
#: branch before the prefix was read (round-5n probe p273/p274)
UNKNOWN_ORDER = [0, 1, 6, 9, 7, 5, 4, 8, 2, 3]

#: known-tree walk order over (prev2, prev, word, next_ambi): word
#: identity first, the adjacent left tag, the right ambitag, and prev2
#: only as the final tiebreaker (see train())
KNOWN_ORDER = [2, 1, 3, 0]


class MBTagger:
    def __init__(
        self,
        lexicon: dict[str, Counter],
        known_tree: IGTree,
        unknown_tree: IGTree,
        ext_lexicon: dict[str, list[str]] | None = None,
        bigram: dict[tuple[str, str], int] | None = None,
    ):
        self.lexicon = lexicon
        self.ambitag = {
            w: "|".join(sorted(cnt)) for w, cnt in lexicon.items()
        }
        self.known_tree = known_tree
        self.unknown_tree = unknown_tree
        # EXTERNAL word -> possible-tags lexicon (the inflection lexicon,
        # sources/inflect.py): the reference's MBT consults exactly such
        # a lexicon built from its 10.9M-token corpus, so common verbs
        # are never "unknown words" there (tagger_base.cxx:232-234 loads
        # the lexicon file alongside the case bases). Corpus-trained
        # words always take precedence (tag_sentence checks self.lexicon
        # first), so trained-word behavior — and gold parity — is
        # untouched; only words outside every training corpus are
        # resolved by lexical lookup + context disambiguation.
        self.ext_lexicon = ext_lexicon or {}
        # (prev_tag, tag) -> count over the training corpus: the HMM-ish
        # transition prior used ONLY to break ties among an ambiguous
        # ext-lexicon word's tags
        self.bigram = bigram or {}
        # corpus tag-unigram counts (derived from the bigram so pickled
        # models stay compatible): the LAST evidence tier when both the
        # suffix distribution and the transition prior are silent on
        # every candidate tag. Without it the final max() tie-break fell
        # through to the tag STRING, i.e. reverse-alphabetical — which
        # systematically preferred WW(...) over N(...) for noun/preterite
        # homographs the inflection lexicon introduced ('week' wijken,
        # 'bewijs' bewijzen). MBT proper resolves exactly this with
        # lexical frequency; corpus tag frequency is the closest prior
        # available to a frequency-less synthetic lexicon.
        self.tag_freq: dict[str, int] = {}
        for (_p, _t), _v in self.bigram.items():
            self.tag_freq[_t] = self.tag_freq.get(_t, 0) + _v

    #: a word joins the unknown-word case base only if its training
    #: frequency is at most this. MBT builds the unknown base from RARE
    #: words for a reason this repo re-measured: training it on every
    #: token lets closed-class words dominate the backoff distributions
    #: — after 'de', the node's majority came from determiners/ordinals
    #: instead of the open-class words that are the only things ever
    #: looked up in this tree at test time. 300 excludes function words
    #: (thousands of occurrences in the gold+treebank mix) while keeping
    #: the treebank's content vocabulary (swept 5/50/300/inf on the
    #: held-out corpus: 300 is the optimum at exact gold parity).
    UNK_MAX_FREQ = 300

    #: a KNOWN word with training frequency at most this is "rare": its
    #: corpus tag set is one or two accidents, so when the external
    #: inflection lexicon lists the word, the lexicon-constrained
    #: context path re-decides the tag over the union of both tag sets
    #: (see tag_sentence). 3 covers the measured failure class
    #: (freq-1/2 -en verbs locked to a single infinitive reading)
    #: without touching function words or well-attested content words.
    RARE_KNOWN_MAX = 3

    #: open-class tag prefixes (bare class names so plain-tag test
    #: corpora work too; no closed-class CGN tag shares these prefixes).
    #: TW is deliberately NOT here (round 5i): ordinals/cardinals are a
    #: bounded closed set, so a test-time UNKNOWN word is essentially
    #: never one — but rare ordinals ('derde' before a rare noun) were
    #: in the base, and their TW(rang) mass kept flipping the pooled
    #: [LID, c, '-e'] coin against the open-class nouns/adjectives that
    #: unknowns actually are ('piste'/'trapeze'/'rijpe' read TW, 5h
    #: probe). Digit-bearing numerals are handled by the D feature and
    #: token-class overrides either way.
    OPEN_CLASS = ("N", "WW", "ADJ", "SPEC")

    @classmethod
    def _unknown_base_words(cls, lexicon: dict[str, Counter]) -> set[str]:
        """Words eligible for the unknown-word case base: rare AND seen
        with at least one open-class tag (test-time unknowns are
        open-class by definition — see the train() comment)."""
        return {
            w
            for w, cnt in lexicon.items()
            if sum(cnt.values()) <= cls.UNK_MAX_FREQ
            and any(t.startswith(cls.OPEN_CLASS) for t in cnt)
        }

    @classmethod
    def train(
        cls,
        sentences: Sequence[Sequence[tuple[str, str]]],
        ext_lexicon: dict[str, list[str]] | None = None,
    ) -> "MBTagger":
        lexicon: dict[str, Counter] = defaultdict(Counter)
        for sent in sentences:
            for word, tag in sent:
                lexicon[_word_key(word)][tag] += 1
        ambitag = {w: "|".join(sorted(cnt)) for w, cnt in lexicon.items()}
        # the unknown base models words OUTSIDE the lexicon, which are
        # open-class by definition — so closed-class-only words (dets,
        # preps, conjunctions, pronouns, adverbs, punctuation) never
        # enter it. Without this, a prep like 'tegen' sits on the
        # (prev=N, 'n') suffix path and unseen plural verbs tag as VZ.
        rare = cls._unknown_base_words(lexicon)

        known_inst: list[list[str]] = []
        known_cls: list[str] = []
        unk_inst: list[list[str]] = []
        unk_cls: list[str] = []
        bigram: dict[tuple[str, str], int] = {}
        for sent in sentences:
            prev_tag = prev2_tag = BOUNDARY
            for i, (word, tag) in enumerate(sent):
                bigram[(prev_tag, tag)] = bigram.get((prev_tag, tag), 0) + 1
                wkey = _word_key(word)
                next_ambi = (
                    ambitag.get(_word_key(sent[i + 1][0]), BOUNDARY)
                    if i + 1 < len(sent)
                    else BOUNDARY
                )
                known_inst.append([prev2_tag, prev_tag, wkey, next_ambi])
                known_cls.append(tag)
                # rare alphanumeric words only (see UNK_MAX_FREQ;
                # punctuation is handled by token-class overrides)
                if wkey in rare and any(ch.isalnum() for ch in word):
                    # A RARE next word stands in for a test-time UNKNOWN
                    # one: every training word has an ambitag, so without
                    # this substitution the tree has no __UNK__ branches
                    # at all and a test walk with an unknown neighbor
                    # dies at the next-ambi feature — the suffix features
                    # behind it (s2/s3) are never consulted, and ONE
                    # pooled (prev, cap, s1) node must answer for every
                    # unknown-followed-by-unknown pair ('de postbode
                    # bezorgde' wants N, 'de rijpe druiven' wants ADJ,
                    # both stop at [LID, c, 'e'] — round-5h probe p162
                    # cascade). Emitting __UNK__ here builds those
                    # branches from realistic rare-rare contexts so the
                    # walk reads the deeper suffix evidence.
                    # both instances, not a substitution: replacing the
                    # real ambitag thinned the next-KNOWN branches (a
                    # rare plural before 'worden' lost the agreement
                    # evidence that separates it from the singular
                    # pool), while the extra __UNK__ copy builds the
                    # unknown-neighbor branch alongside.
                    unk_inst.append(_unknown_feats(prev_tag, word, next_ambi))
                    unk_cls.append(tag)
                    if i + 1 < len(sent) and _word_key(sent[i + 1][0]) in rare:
                        unk_inst.append(
                            _unknown_feats(prev_tag, word, cls.UNK_AMBI))
                        unk_cls.append(tag)
                prev2_tag, prev_tag = prev_tag, tag
        # fixed feature order: word first (most informative), then the
        # adjacent left tag and right ambitag; prev2 LAST so it is only
        # consulted where the other three still leave ambiguity — the
        # tree is unchanged everywhere the dfa features already decided
        known_tree = IGTree.train(known_inst, known_cls, feature_order=KNOWN_ORDER)
        # capitalization first (separates SPEC-ish names), then suffixes
        # longest-first, then left context — MBT's 'p'/'s' feature layout
        unknown_tree = IGTree.train(unk_inst, unk_cls, feature_order=UNKNOWN_ORDER)
        return cls(
            dict(lexicon), known_tree, unknown_tree,
            ext_lexicon=ext_lexicon, bigram=bigram,
        )

    UNK_AMBI = "__UNK__"

    def tag_sentence(self, words: Sequence[str]) -> list[tuple[str, float]]:
        out: list[tuple[str, float]] = []
        prev_tag = prev2_tag = BOUNDARY
        n = len(words)
        for i, word in enumerate(words):
            wkey = _word_key(word)
            # an OUT-OF-LEXICON next word must not fall back to BOUNDARY:
            # in training that value only ever means sentence-final, so
            # the tree would walk the end-of-sentence branch mid-sentence.
            # A corpus-unseen word the EXTERNAL lexicon lists with ONE
            # reading supplies that reading (it matches the corpus
            # branch vocabulary — corpus ambitags are single tags for
            # unambiguous words); ambiguous ext entries would produce
            # joined strings no training branch carries, so they fall
            # through to __UNK__, whose branches the trainer now builds
            # from rare-rare contexts (see train()).
            if i + 1 < n:
                nk = _word_key(words[i + 1])
                next_ambi = self.ambitag.get(nk)
                if next_ambi is None:
                    ne = self.ext_lexicon.get(nk) or self.ext_lexicon.get(
                        words[i + 1].lower()
                    )
                    next_ambi = (
                        ne[0]
                        if ne is not None and len(set(ne)) == 1
                        else self.UNK_AMBI
                    )
            else:
                next_ambi = BOUNDARY
            known_key = None
            if wkey in self.lexicon:
                known_key = wkey
            elif word.lower() in self.lexicon:
                known_key = word.lower()
            elif (
                (cap := word[:1].upper() + word[1:]) != word
                and cap in self.lexicon
                and not all(t.startswith("SPEC") for t in self.lexicon[cap])
            ):
                # titles and sentence-initial-only training forms: the
                # corpus stored 'Mevrouw', the text says 'mevrouw' — use
                # the stored key so the word feature matches training.
                # NAME-only entries are excluded: 'de bakker' (the
                # profession) must not borrow 'Bakker' (the surname).
                known_key = cap
            if known_key is not None:
                tag, conf = self.known_tree.classify(
                    [prev2_tag, prev_tag, known_key, next_ambi]
                )
                # RARE known words defer to the richer external lexicon:
                # a word seen once or twice in training locks its tag set
                # to those accidents ('concurreren' appears only as an
                # infinitive in the corpus, so 'Google en Yahoo
                # concurreren' can never read pv,tgw,mv), and a tied
                # two-way count makes the word-node leaf a coin flip.
                # MBT itself splits known/unknown treatment by lexical
                # frequency (Mbt's lexicon frequency threshold,
                # mbt/docs); here a rare known word whose inflection-
                # lexicon entry widens or matches its ambiguity is
                # re-decided by the lexicon-constrained context path —
                # over the UNION of corpus and external tags, so the
                # gold reading always stays reachable.
                if sum(self.lexicon[known_key].values()) <= self.RARE_KNOWN_MAX and (
                    i == 0 or not word[:1].isupper()
                ):
                    ext = self.ext_lexicon.get(wkey) or self.ext_lexicon.get(
                        word.lower()
                    )

                    # VERBAL entries only: the measured failure class is
                    # rare -en verbs corpus-locked to one finiteness
                    # reading. Re-deciding rare ADJECTIVES was measured
                    # to break gold parity ('waarschijnlijk' s81: the
                    # corpus prenom reading is right and the context
                    # vote prefers vrij). KNOWN-CONTEXT guard: when
                    # training saw THIS word with THIS left tag, the
                    # known tree's answer is corpus evidence in context,
                    # not a frequency accident, and it keeps authority —
                    # the tree walks word first, then prev, so the guard
                    # is one trie probe. (A treebank resample dropped
                    # 'maken' to corpus count 1 and the context vote
                    # overrode the known tree's correct 'te kunnen
                    # maken' infinitive, gold s86, measured. The
                    # 'concurreren' class stays re-decided: its one
                    # corpus context is 'te concurreren', so a plural
                    # subject's prev tag misses the guard.)
                    _wnode = self.known_tree.root.children.get(known_key)
                    if (
                        ext is not None
                        and (_wnode is None or prev_tag not in _wnode.children)
                        and any(t.startswith("WW(") for t in ext)
                    ):
                        union = sorted(set(self.lexicon[known_key]) | set(ext))
                        if len(union) > 1:
                            tag, conf = self._constrained_tag(
                                prev_tag, word, next_ambi, union,
                                next_tags=self._next_tagset(words, i),
                            )
            else:
                # a capitalized word MID-sentence is name evidence the
                # lowercase lexicon must not override ('De Vries' vs the
                # verb stem 'vries') — let the unknown tree's cap feature
                # route it; sentence-initial capitals consult the lexicon
                ext = None
                if i == 0 or not word[:1].isupper():
                    ext = self.ext_lexicon.get(wkey) or self.ext_lexicon.get(
                        word.lower()
                    )
                # NOTE (round 5e): a "soft restriction" was tried here —
                # fall back to the UNRESTRICTED unknown distribution
                # when its mass on the lexicon's tags is tiny (the
                # round-5d probe's 'naar de loods' read WW because only
                # the verb 'loodsen' was listed). Measured WORSE at
                # every threshold (0.10/0.15/0.25: held-out triple P
                # 0.987 -> 0.946): the unknown tree is trained on rare
                # open-class words, so its distribution is diffuse
                # exactly where lexical lookup is right, and the
                # fallback overrode correct lookups corpus-wide. The
                # correct fix is lexicon breadth — noun readings for
                # verb/noun homograph surfaces (loods, lunch, veer) ride
                # in sources/inflect.py like every e-Lex entry would.
                if ext is not None and len(ext) == 1:
                    # lexical lookup: unambiguous in the external lexicon
                    tag, conf = ext[0], 1.0
                elif ext is not None:
                    tag, conf = self._constrained_tag(
                        prev_tag, word, next_ambi, ext,
                        next_tags=self._next_tagset(words, i),
                    )
                else:
                    tag, conf = self.unknown_tree.classify(
                        _unknown_feats(prev_tag, word, next_ambi)
                    )
            out.append((tag, conf))
            prev2_tag, prev_tag = prev_tag, tag
        return out

    def _next_tagset(self, words: Sequence[str], i: int) -> set[str] | None:
        """Tag set of the word AFTER position i, from the corpus lexicon
        first, else the external lexicon; None when neither knows it and
        the empty set at the sentence boundary."""
        if i + 1 >= len(words):
            return set()
        nk = _word_key(words[i + 1])
        if nk in self.lexicon:
            return set(self.lexicon[nk])
        e = self.ext_lexicon.get(nk) or self.ext_lexicon.get(words[i + 1].lower())
        return set(e) if e else None

    @staticmethod
    def _next_nominal(next_tags: set[str] | None) -> bool | None:
        """Positional evidence for CGN's prenom/vrij ADJ split, which is
        positional BY DEFINITION: a prenominal adjective stands before
        nominal material. True = the next word is unambiguously a noun
        (every known reading N(...)); False = the next word has no
        nominal reading at all (punctuation, finite-verb-only, VZ, BW —
        or the sentence ends); None = unknown or mixed, no evidence.
        TW is deliberately NOT treated as nominal for the True case:
        'ruim dertig graden' has a vrij/adverbial ADJ before a cardinal."""
        if next_tags is None:
            return None
        if not any(t.startswith(("N(", "ADJ(", "TW(", "SPEC")) for t in next_tags):
            return False
        if next_tags and all(t.startswith("N(") for t in next_tags):
            return True
        return None

    def _constrained_tag(
        self, prev_tag: str, word: str, next_ambi: str, tags: Sequence[str],
        next_tags: set[str] | None = None,
    ) -> tuple[str, float]:
        """Lexicon-constrained classification (MBT's known-word ambitag
        semantics): the unknown-word tree's context/suffix distribution
        picks among ``tags`` only; the corpus tag-bigram prior
        P(tag | prev_tag) breaks ties the suffix distribution cannot see
        (a smoothed PRODUCT of the two was measured worse: the prior
        overrode correct suffix evidence on clause-final infinitives)."""
        pos = self._next_nominal(next_tags)
        if pos is True:
            kept = [t for t in tags if not t.startswith("ADJ(vrij")]
        elif pos is False:
            kept = [t for t in tags if not t.startswith("ADJ(prenom")]
        else:
            kept = list(tags)
        if kept and len(kept) < len(tags):
            # positional prenom/vrij filter (see _next_nominal): 'een
            # bekend lied' keeps only prenom, 'in het ruim .' drops the
            # impossible prenom reading; never empties the candidates
            tags = kept
        dist = self.unknown_tree.distribution(
            _unknown_feats(prev_tag, word, next_ambi)
        )
        # the corpus tag-frequency prior applies only when the candidates
        # span DIFFERENT coarse categories (N vs WW: the noun/preterite
        # homograph class); within one category the fine-subtag frequency
        # is corpus composition, not word evidence — it flipped
        # 'is verplaatst' (vd) to pv,tgw,met-t purely because 3sg-present
        # dominates the training corpus (held-out h72, measured).
        cross = len({t.split("(", 1)[0] for t in tags}) > 1
        tag = max(
            tags,
            key=lambda t: (
                dist.get(t, 0.0),
                self.bigram.get((prev_tag, t), 0),
                self.tag_freq.get(t, 0) if cross else 0,
                t,
            ),
        )
        total = sum(dist.get(t, 0.0) for t in tags)
        conf = dist.get(tag, 0.0) / total if total > 0 else 1.0 / len(tags)
        return tag, conf
