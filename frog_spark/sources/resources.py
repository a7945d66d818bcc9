"""Config/model/fixture scan (SURVEY.md §2.1 S9).

Reference analogue: Frog's driver-side load of config, Timbl instance bases,
gazetteers and lexicons (/root/reference/src/FrogAPI.cxx:281-891 and the
per-module ``init()``s). Here everything is parsed once on the driver and
later broadcast to executors.

The gold corpus (resources/gold_corpus.tsv) is the single training +
evaluation fixture: memory-based learners reproduce their training material,
which is exactly the reference's golden-corpus testing philosophy
(/root/reference/src/tst.sh, tests/tst.ok).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

RESOURCE_DIR = os.environ.get(
    "FROG_SPARK_RESOURCES",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "resources"),
)


@dataclass
class GoldToken:
    idx: int  # 1-based within sentence
    word: str
    pos: str
    lemma: str
    morph: str
    ner: str
    chunk: str


@dataclass
class GoldSentence:
    sent_id: str
    text: str
    tokens: list[GoldToken] = field(default_factory=list)
    # post-MWU unit deps: unit_idx (1-based) -> (head_unit_idx, rel)
    deps: dict[int, tuple[int, str]] = field(default_factory=dict)


def load_gold_corpus(path: str | None = None) -> list[GoldSentence]:
    path = path or os.path.join(RESOURCE_DIR, "gold_corpus.tsv")
    sentences: list[GoldSentence] = []
    cur: GoldSentence | None = None
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            if line.startswith("# sent "):
                rest = line[len("# sent ") :]
                sid, _, text = rest.partition(" ")
                cur = GoldSentence(sid, text)
                sentences.append(cur)
            elif line.startswith("# dep "):
                assert cur is not None
                parts = line[len("# dep ") :].split()
                cur.deps[int(parts[0])] = (int(parts[1]), parts[2])
            elif line.startswith("#"):
                continue
            else:
                assert cur is not None
                cols = line.split("\t")
                cur.tokens.append(
                    GoldToken(
                        int(cols[0]), cols[1], cols[2], cols[3], cols[4], cols[5], cols[6]
                    )
                )
    for s in sentences:
        s.tokens.sort(key=lambda t: t.idx)
    return sentences


def load_gazetteer(path: str | None = None) -> dict[str, set[str]]:
    """category -> set of names (multi-word allowed); cf.
    /root/reference/src/ner_tagger_mod.cxx:105-231 (read_gazets)."""
    path = path or os.path.join(RESOURCE_DIR, "gazetteer.tsv")
    out: dict[str, set[str]] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            cat, name = line.split("\t", 1)
            out.setdefault(cat, set()).add(name)
    return out


def load_mwu_lexicon(path: str | None = None) -> dict[str, list[tuple[list[str], str]]]:
    """first_word -> [(all_words, tag)], longest-first; cf.
    /root/reference/src/mwu_chunker_mod.cxx:127-160 (read_mwus)."""
    path = path or os.path.join(RESOURCE_DIR, "mwu_lexicon.tsv")
    out: dict[str, list[tuple[list[str], str]]] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            joined, tag = line.split("\t", 1)
            words = joined.split("_")
            out.setdefault(words[0], []).append((words, tag))
    for lst in out.values():
        lst.sort(key=lambda wt: -len(wt[0]))  # longest match first (W3)
    return out


def load_token_strip(path: str | None = None) -> dict[str, dict[str, int]]:
    """pos_tag -> {token_class: n_chars_to_strip}; cf. fill_ts_map
    (/root/reference/src/mblem_mod.cxx:75-116)."""
    path = path or os.path.join(RESOURCE_DIR, "token_strip.tsv")
    out: dict[str, dict[str, int]] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            tag, cls, n = line.split("\t")
            out.setdefault(tag, {})[cls] = int(n)
    return out


def load_one_one_tags(path: str | None = None) -> set[str]:
    """Tags whose lemma is the word itself, case preserved; cf.
    /root/reference/src/mblem_mod.cxx:207-214."""
    path = path or os.path.join(RESOURCE_DIR, "one_one_tags.txt")
    out: set[str] = set()
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if line and not line.startswith("#"):
                out.add(line)
    return out


def load_token_trans(path: str | None = None) -> dict[str, str]:
    """token_class -> forced POS tag; cf.
    /root/reference/src/tagger_base.cxx:79-108 (fill map) and
    /root/reference/src/cgn_tagger_mod.cxx:246-288 (addTag override)."""
    path = path or os.path.join(RESOURCE_DIR, "token_trans.tsv")
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            cls, tag = line.split("\t", 1)
            out[cls] = tag
    return out


# --- derived training material --------------------------------------------


def pos_training(gold: list[GoldSentence]) -> list[list[tuple[str, str]]]:
    return [[(t.word, t.pos) for t in s.tokens] for s in gold]


def lemma_training(gold: list[GoldSentence]) -> list[tuple[str, str, str]]:
    seen = set()
    out = []
    for s in gold:
        for t in s.tokens:
            key = (t.word, t.pos, t.lemma)
            if key not in seen:
                seen.add(key)
                out.append(key)
    return out


def morph_training(gold: list[GoldSentence]) -> list[tuple[str, str, str]]:
    """(word, cgn_tag, morph) triples; the tag drives the CELEX-style
    training-class synthesis (operators/morpho.py)."""
    seen = set()
    out = []
    for s in gold:
        for t in s.tokens:
            if t.word not in seen:
                seen.add(t.word)
                out.append((t.word, t.pos, t.morph))
    return out


def ner_training(
    gold: list[GoldSentence],
) -> list[list[tuple[str, str, str]]]:
    """[(word, pos, bio_tag)] per sentence."""
    return [[(t.word, t.pos, t.ner) for t in s.tokens] for s in gold]


def chunk_training(
    gold: list[GoldSentence],
) -> list[list[tuple[str, str, str]]]:
    return [[(t.word, t.pos, t.chunk) for t in s.tokens] for s in gold]
