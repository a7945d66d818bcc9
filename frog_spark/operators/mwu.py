"""MWU (multi-word unit) resolver (SURVEY.md §2.8, W1-W3).

Reference: /root/reference/src/mwu_chunker_mod.cxx —
  lexicon ``word1_word2_... tag`` (127-160); glue-tag runs: consecutive
  SPEC(deeleigen) tokens become dynamic MWUs (209-215, 311-323); leftmost
  longest match with sentence-initial decapitalization fallback (296-419);
  record merge joins member words with ``_`` and multiplies POS confidences
  (/root/reference/src/FrogData.cxx:142-183).

Deviation (documented): merged glue-run units keep tag SPEC(deeleigen) and
lexicon units take the lexicon tag, instead of '_'-joining member tags —
the parser consumes the head tag either way.
"""

from __future__ import annotations

from dataclasses import dataclass

GLUE_TAG = "SPEC(deeleigen)"  # config 'gluetag', mwu_chunker_mod.cxx:209-215


@dataclass
class Unit:
    start: int  # 0-based token index
    end: int  # inclusive
    word: str
    tag: str
    conf: float
    lemma: str
    is_mwu: bool
    # member POS tags of an MWU (the parser '_'-joins their heads/mods,
    # prepareParse /root/reference/src/Parser.cxx:955-980); None for
    # single-token units
    member_tags: list[str] | None = None


def resolve_mwus(
    words: list[str],
    tags: list[str],
    confs: list[float],
    lemmas: list[str],
    lexicon: dict[str, list[tuple[list[str], str]]],
) -> list[Unit]:
    """Longest-match scan (W3) + glue-tag runs (W2) -> post-MWU units."""
    n = len(words)
    units: list[Unit] = []
    i = 0
    while i < n:
        # W3: lexicon longest match, leftmost wins. Member words compare
        # EXACTLY (mwu_chunker_mod.cxx Classify: match[j] !=
        # mWords[i+j+1]->getWord()); the decapitalized first word is
        # tried only when the exact-case lookup finds NOTHING at
        # sentence start (331-339) — both rules bug-for-bug with the
        # reference (a lowercased compare would accept 'ad HOC').
        cands = list(lexicon.get(words[i], []))
        if not cands and i == 0 and words[i][:1].isupper():
            cands = list(lexicon.get(words[i][0].lower() + words[i][1:], []))
            decap = True
        else:
            decap = False
        best_lex = 0
        best_tag = ""
        for seq, tag in cands:  # already longest-first
            L = len(seq)
            if i + L <= n and all(
                words[i + k] == seq[k]
                or (decap and k == 0 and words[i][0].lower() + words[i][1:] == seq[0])
                for k in range(L)
            ):
                best_lex, best_tag = L, tag
                break
        # W2: glue-tag run length starting here — the reference inserts
        # glue runs into the SAME MWU table and keeps the longest of
        # both (Classify 311-323 + longest-match scan), so a 3-token
        # name run must beat a 2-token lexicon entry
        glue_end = i
        if tags[i] == GLUE_TAG:
            while glue_end + 1 < n and tags[glue_end + 1] == GLUE_TAG:
                glue_end += 1
        glue_len = glue_end - i + 1 if glue_end > i else 0

        if best_lex > 1 and best_lex >= glue_len:
            L, tag = best_lex, best_tag
            conf = 1.0
            for c in confs[i : i + L]:
                conf *= c
            units.append(
                Unit(
                    i,
                    i + L - 1,
                    "_".join(words[i : i + L]),
                    tag,
                    conf,
                    "_".join(lemmas[i : i + L]),
                    True,
                    member_tags=tags[i : i + L],
                )
            )
            i += L
            continue
        if glue_len > 1:
            j = glue_end
            conf = 1.0
            for c in confs[i : j + 1]:
                conf *= c
            units.append(
                Unit(
                    i,
                    j,
                    "_".join(words[i : j + 1]),
                    GLUE_TAG,
                    conf,
                    "_".join(lemmas[i : j + 1]),
                    True,
                    member_tags=tags[i : j + 1],
                )
            )
            i = j + 1
            continue
        units.append(Unit(i, i, words[i], tags[i], confs[i], lemmas[i], False))
        i += 1
    return units
