"""Pipeline orchestration (SURVEY.md §2.10, O1-O3).

Reference: frog_sentence (/root/reference/src/FrogAPI.cxx:2031-2211) runs
tag -> (mbma || mblem) -> (NER || IOB) -> MWU -> parse per sentence, with
OpenMP sections for the parallel parts. Here the whole chain is a pure
function over one sentence; the Spark stage applies it over Arrow batches.

Scale design:
  * ONE shuffle for the whole annotation pipeline: repartition by
    (conv_id, turn_idx) — the salt-friendly key: hot conversations spread
    across partitions while each turn stays whole — then
    sortWithinPartitions for the stable (conv_id, turn_idx) ordering the
    north rule requires.
  * All models live in a single broadcast variable; pandas UDFs read
    ``broadcast.value`` once per executor (module-level cache in the
    Python worker).
  * mapInPandas (not applyInPandas) so there is no per-group invocation
    overhead: one Python call per Arrow batch, with a carry buffer for the
    turn that spans a batch boundary.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from frog_spark.operators.chunker import IobChunker
from frog_spark.operators.lemmatizer import Mblem
from frog_spark.operators.morpho import Mbma
from frog_spark.operators.mwu import resolve_mwus
from frog_spark.operators.ner import Gazetteer, NerTagger
from frog_spark.operators.parser import MAX_PARSER_TOKENS, DepParser
from frog_spark.operators.tagger import PosTagger
from frog_spark.sources.resources import (
    lemma_training,
    load_gazetteer,
    load_gold_corpus,
    load_mwu_lexicon,
    morph_training,
)


@dataclass
class PipelineConfig:
    """Module skip flags (--skip=[tlacmnpg], /root/reference/src/FrogAPI.cxx:470-533).
    Dependency rule enforced: the parser needs MWU."""

    do_lemma: bool = True
    do_morph: bool = True
    do_ner: bool = True
    do_iob: bool = True
    do_mwu: bool = True
    do_parse: bool = True
    language: str = "nl"  # T3 gate

    def __post_init__(self) -> None:
        if self.do_parse and not self.do_mwu:
            self.do_parse = False  # parser requires MWU (FrogAPI.cxx:470-533)


class FrogPipeline:
    """All trained models + lexicons; picklable, broadcast once."""

    def __init__(
        self,
        tagger: PosTagger,
        mblem: Mblem,
        mbma: Mbma,
        ner: NerTagger,
        chunker: IobChunker,
        mwu_lexicon: dict,
        parser: DepParser,
        config: PipelineConfig | None = None,
    ):
        self.tagger = tagger
        self.mblem = mblem
        self.mbma = mbma
        self.ner = ner
        self.chunker = chunker
        self.mwu_lexicon = mwu_lexicon
        self.parser = parser
        self.config = config or PipelineConfig()

    @classmethod
    def build(cls, config: PipelineConfig | None = None) -> "FrogPipeline":
        """Driver-side model training/loading (run_api, FrogAPI.cxx:893-1050)."""
        gold = load_gold_corpus()
        gaz = Gazetteer(load_gazetteer())
        return cls(
            tagger=PosTagger.train(gold),
            mblem=Mblem.train(lemma_training(gold)),
            mbma=Mbma.train(morph_training(gold)),
            ner=NerTagger.train(gold, gaz),
            chunker=IobChunker.train(gold),
            mwu_lexicon=load_mwu_lexicon(),
            parser=DepParser.train(gold),
            config=config,
        )

    # -- the per-sentence pipeline (frog_sentence) ---------------------------

    _CACHE_MAX = 65536

    def annotate_sentence(
        self, words: list[str], token_classes: list[str], lang: str = "nl"
    ) -> list[dict]:
        """Cached wrapper: transcript corpora repeat sentences heavily
        (greetings, tool banners, quoted turns), so identical sentences
        are annotated once per executor. Bounded FIFO cache."""
        key = (tuple(words), tuple(token_classes), lang)
        cache = getattr(self, "_sent_cache", None)
        if cache is None:
            cache = self._sent_cache = {}
        hit = cache.get(key)
        if hit is not None:
            return [dict(r) for r in hit]
        rows = self._annotate_sentence_uncached(words, token_classes, lang)
        if len(cache) >= self._CACHE_MAX:
            cache.clear()
        cache[key] = rows
        return [dict(r) for r in rows]

    def _annotate_sentence_uncached(
        self, words: list[str], token_classes: list[str], lang: str = "nl"
    ) -> list[dict]:
        cfg = self.config
        n = len(words)
        rows = [
            {
                "word": w,
                "token_class": tc,
                "pos_tag": "",
                "pos_conf": 0.0,
                "lemma": "",
                "lemmas": [],
                "morph": "",
                "compound": "0",
                "ner_tag": "O",
                "ner_conf": 0.0,
                "chunk_tag": "O",
                "chunk_conf": 0.0,
                "unit_idx": i + 1,
                "mwu_start": i,
                "mwu_end": i,
                "parse_head": -1,
                "parse_role": "",
            }
            for i, (w, tc) in enumerate(zip(words, token_classes))
        ]
        if lang != cfg.language:  # T3: tokenize-only rows
            return rows

        tagged = self.tagger.tag(words, token_classes)
        tags = [t for t, _ in tagged]
        confs = [c for _, c in tagged]
        for r, tag, conf in zip(rows, tags, confs):
            r["pos_tag"], r["pos_conf"] = tag, conf

        # mbma || mblem per word (OpenMP sections, FrogAPI.cxx:2096-2134)
        for i, r in enumerate(rows):
            head = tags[i].split("(", 1)[0]
            if cfg.do_lemma:
                lemmas = self.mblem.lemmatize(words[i], tags[i], token_classes[i])
                r["lemmas"] = lemmas
                r["lemma"] = lemmas[0]
            if cfg.do_morph:
                morph, compound = self.mbma.analyze(words[i], head, token_classes[i])
                r["morph"], r["compound"] = morph, compound

        # NER || IOB per sentence (FrogAPI.cxx:2140-2174)
        if cfg.do_ner:
            ner_tags, ner_confs, _spans = self.ner.tag(words, tags)
            for r, t, c in zip(rows, ner_tags, ner_confs):
                r["ner_tag"], r["ner_conf"] = t, c
        if cfg.do_iob:
            ch_tags, ch_confs, _cspans = self.chunker.tag(words, tags)
            for r, t, c in zip(rows, ch_tags, ch_confs):
                r["chunk_tag"], r["chunk_conf"] = t, c

        if cfg.do_mwu:
            lemmas_col = [r["lemma"] or w for r, w in zip(rows, words)]
            units = resolve_mwus(words, tags, confs, lemmas_col, self.mwu_lexicon)
            for ui, u in enumerate(units):
                for k in range(u.start, u.end + 1):
                    rows[k]["unit_idx"] = ui + 1
                    rows[k]["mwu_start"] = u.start
                    rows[k]["mwu_end"] = u.end
            if cfg.do_parse and n <= MAX_PARSER_TOKENS:
                parsed = self.parser.parse_units([(u.word, u.tag) for u in units])
                for u, (head, rel) in zip(units, parsed):
                    for k in range(u.start, u.end + 1):
                        rows[k]["parse_head"] = head
                        rows[k]["parse_role"] = rel
        return rows


ANNOTATED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("token_idx", IntegerType(), False),
        StructField("word", StringType(), False),
        StructField("token_class", StringType(), False),
        StructField("no_space", BooleanType(), False),
        StructField("pos_tag", StringType(), False),
        StructField("pos_conf", DoubleType(), False),
        StructField("lemma", StringType(), False),
        StructField("lemmas", ArrayType(StringType()), False),
        StructField("morph", StringType(), False),
        StructField("compound", StringType(), False),
        StructField("ner_tag", StringType(), False),
        StructField("ner_conf", DoubleType(), False),
        StructField("chunk_tag", StringType(), False),
        StructField("chunk_conf", DoubleType(), False),
        StructField("unit_idx", IntegerType(), False),
        StructField("mwu_start", IntegerType(), False),
        StructField("mwu_end", IntegerType(), False),
        StructField("parse_head", IntegerType(), False),
        StructField("parse_role", StringType(), False),
    ]
)

_OUT_COLS = [f.name for f in ANNOTATED_SCHEMA.fields]


def annotate_tokens(
    spark: SparkSession,
    tokens: DataFrame,
    pipeline: FrogPipeline,
    num_partitions: int | None = None,
) -> DataFrame:
    """Token rows -> fully annotated token rows. One shuffle total."""
    bc = spark.sparkContext.broadcast(pipeline)
    parts = num_partitions or spark.sparkContext.defaultParallelism

    shuffled = (
        tokens.repartition(parts, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx", "sent_idx", "token_idx")
    )

    _IN_COLS = [
        "conv_id", "turn_idx", "sent_idx", "token_idx",
        "word", "token_class", "no_space", "lang",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pipe: FrogPipeline = bc.value
        carry: list[tuple] | None = None  # rows of the possibly-split tail turn

        def process_sentences(rows: list[tuple]) -> list[tuple]:
            """rows: _IN_COLS tuples of one or more whole turns, sorted."""
            out: list[tuple] = []
            i, n = 0, len(rows)
            while i < n:
                # one sentence = contiguous (conv, turn, sent)
                j = i
                key = rows[i][:3]
                while j < n and rows[j][:3] == key:
                    j += 1
                sent = rows[i:j]
                words = [r[4] for r in sent]
                tcs = [r[5] for r in sent]
                ann = pipe.annotate_sentence(words, tcs, sent[0][7] or "nl")
                for r, a in zip(sent, ann):
                    out.append(
                        (
                            r[0], int(r[1]), int(r[2]), int(r[3]),
                            a["word"], a["token_class"], bool(r[6]),
                            a["pos_tag"], float(a["pos_conf"]),
                            a["lemma"], a["lemmas"], a["morph"], a["compound"],
                            a["ner_tag"], float(a["ner_conf"]),
                            a["chunk_tag"], float(a["chunk_conf"]),
                            a["unit_idx"], a["mwu_start"], a["mwu_end"],
                            a["parse_head"], a["parse_role"],
                        )
                    )
                i = j
            return out

        for b in batches:
            if b.empty:
                continue
            rows = list(zip(*(b[c] for c in _IN_COLS)))
            if carry:
                rows = carry + rows
                carry = None
            # hold back the trailing (conv, turn) — it may continue in the
            # next Arrow batch of this partition
            last_key = rows[-1][:2]
            cut = len(rows)
            while cut > 0 and rows[cut - 1][:2] == last_key:
                cut -= 1
            carry = rows[cut:]
            head = rows[:cut]
            if head:
                yield pd.DataFrame(process_sentences(head), columns=_OUT_COLS)
        if carry:
            yield pd.DataFrame(process_sentences(carry), columns=_OUT_COLS)

    return shuffled.mapInPandas(run, schema=ANNOTATED_SCHEMA)


def annotate_transcripts(
    spark: SparkSession,
    transcripts: DataFrame,
    pipeline: FrogPipeline | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """transcripts (conv_id, turn_idx, role, text, tool, ts) -> annotated tokens."""
    from frog_spark.operators.tokenizer import tokenize_turns

    pipe = pipeline or FrogPipeline.build()
    return annotate_tokens(spark, tokenize_turns(transcripts), pipe, num_partitions)
