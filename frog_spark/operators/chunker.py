"""IOB shallow chunker (SURVEY.md §2.7, C1).

Reference: /root/reference/src/iob_tagger_mod.cxx:78-175 — enrichment is
``prevPOS POS nextPOS``; BIO repair at 134-154; chunk confidence is the
PRODUCT of member confidences (FoLiA layer write at 232). Same span
machinery as NER, different aggregate.
"""

from __future__ import annotations

from frog_spark.models.igtree import IGTree
from frog_spark.operators.ner import repair_bio
from frog_spark.sources.resources import GoldSentence


#: tag-first fixed order over _feats below (focus POS, left/right POS,
#: word LAST) — unseen words must not end the walk before the POS
#: context is read (held-out chunk 0.974 -> 0.980 at gold parity)
CHUNK_ORDER = [2, 1, 3, 0]


def _feats(words: list[str], pos: list[str], i: int) -> list[str]:
    n = len(words)
    return [
        words[i].lower(),
        pos[i - 1] if i > 0 else "<s>",
        pos[i],
        pos[i + 1] if i + 1 < n else "</s>",
    ]


class IobChunker:
    def __init__(self, tree: IGTree):
        self.tree = tree

    @classmethod
    def train(cls, gold: list[GoldSentence]) -> "IobChunker":
        instances: list[list[str]] = []
        classes: list[str] = []
        for s in gold:
            words = [t.word for t in s.tokens]
            pos = [t.pos for t in s.tokens]
            for i, t in enumerate(s.tokens):
                instances.append(_feats(words, pos, i))
                classes.append(t.chunk)
        return cls(IGTree.train(instances, classes, feature_order=list(CHUNK_ORDER)))

    def tag(
        self, words: list[str], pos: list[str]
    ) -> tuple[list[str], list[float], list[tuple[int, int, str, float]]]:
        tags, confs = [], []
        for i in range(len(words)):
            t, c = self.tree.classify(_feats(words, pos, i))
            tags.append(t)
            confs.append(c)
        tags = repair_bio(tags)
        # product-of-members chunk confidence
        spans: list[tuple[int, int, str, float]] = []
        i, n = 0, len(tags)
        while i < n:
            if tags[i].startswith("B-"):
                cat = tags[i][2:]
                j = i
                prod = confs[i]
                while j + 1 < n and tags[j + 1] == f"I-{cat}":
                    j += 1
                    prod *= confs[j]
                spans.append((i, j, cat, prod))
                i = j + 1
            else:
                i += 1
        return tags, confs, spans
