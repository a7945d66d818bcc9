"""CGN POS tagger stage (SURVEY.md §2.3, P1-P5).

Reference: /root/reference/src/tagger_base.cxx:517-551 (Classify via MbtAPI),
/root/reference/src/cgn_tagger_mod.cxx:231-288 (post_process/addTag:
token-class overrides, SPEC confidence forcing, next_tag windowing).

Per-sentence sequential tagging (prev tag feeds the next decision) — runs
inside the pandas-UDF annotation pass, one sentence at a time over an Arrow
batch. The trained MBTagger is broadcast once per application.
"""

from __future__ import annotations

from frog_spark.models.mbt import MBTagger
from frog_spark.sources.resources import (
    GoldSentence,
    load_token_trans,
    pos_training,
)


# P2: per-module UniFilter char translation (/root/reference/src/
# tagger_base.cxx:410-419, 491-496): normalize typographic characters
# before classification so the instance base's ASCII forms match. The
# reference's problems.txt explicitly exercises unicode apostrophes.
UNIFILTER = str.maketrans(
    {
        "’": "'", "‘": "'", "‚": "'",
        "“": '"', "”": '"', "„": '"',
        "–": "-", "—": "-",
        " ": " ",
    }
)


def unifilter(word: str) -> str:
    return word.translate(UNIFILTER)


class PosTagger:
    def __init__(self, mbt: MBTagger, token_trans: dict[str, str]):
        self.mbt = mbt
        self.token_trans = token_trans

    @classmethod
    def train(
        cls,
        gold: list[GoldSentence],
        token_trans: dict[str, str] | None = None,
        ext_lexicon: dict[str, list[str]] | None = None,
    ) -> "PosTagger":
        return cls(
            MBTagger.train(pos_training(gold), ext_lexicon=ext_lexicon),
            token_trans if token_trans is not None else load_token_trans(),
        )

    def tag(
        self, words: list[str], token_classes: list[str]
    ) -> list[tuple[str, float]]:
        """Full-sentence MBT pass, then token-class overrides (P4).

        Overrides happen after tagging, mirroring CGNTagger::post_process
        (/root/reference/src/cgn_tagger_mod.cxx:246-288): the forced tag
        gets confidence 1.0; any SPEC(...) tag is forced to 1.0.
        """
        tagged = self.mbt.tag_sentence([unifilter(w) for w in words])
        out: list[tuple[str, float]] = []
        for (tag, conf), cls in zip(tagged, token_classes):
            forced = self.token_trans.get(cls)
            if forced is not None:
                out.append((forced, 1.0))
            elif tag.startswith("SPEC("):
                out.append((tag, 1.0))
            else:
                out.append((tag, conf))
        return out

    @staticmethod
    def next_tags(tags: list[str]) -> list[str]:
        """P3: each token's following tag (consumed by MBMA V2I handling);
        relational equivalent: F.lead(tag) over the sentence window."""
        return [tags[i + 1] if i + 1 < len(tags) else "" for i in range(len(tags))]
