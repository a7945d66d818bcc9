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

import time
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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
    # N5: second gazetteer whose tags FORCE the NER output
    # (/root/reference/src/ner_tagger_mod.cxx:542-617). None disables;
    # "default" loads resources/ner_override.tsv.
    ner_override_path: str | None = "default"
    ner_override_unconditional: bool = True
    ner_override_only_n_spec: bool = False
    # lexical-substitution training augmentation (sources/augment.py),
    # OFF by default: measured on the external held-out protocol it
    # trades recall for precision (original-replication needed for
    # training-set parity deepens the pairs classifier's "no relation"
    # majority; BENCH/BASELINE.md) — kept as an opt-in lever for larger
    # corpora where parity-by-replication is unnecessary.
    augment_variants: int = 0
    # grammar-based synthetic treebank (sources/treebank.py) mixed into
    # tagger/NER/parser training — the stand-in for the multi-million-
    # word treebank the reference's models are trained on
    # (advanced.rst). 8000 took never-trained held-out heads
    # 0.77->0.93 in round 4; 12000 (round 5) stabilizes the rarer
    # template combinations (MWU-fronted ordinal objects, duration
    # NPs) whose pairs-tree branches were sampling-noise-thin at 8000.
    # 18000 (round 5d): the round-5d template arms (possessive 'zijn',
    # preterite pc/separable verbs, temporal PPs, fronted 'volgens')
    # re-divided the same sample and marginal cells flipped retrain to
    # retrain; at 18000 the same template set measures held-out triple
    # R 1.0 / heads 0.986 and probe-r5c heads 0.965 (scratch/ab7.txt).
    # Gold-corpus parity stays intact (goldens + tst.ok byte-identical).
    # 0 disables (pure gold training, the round-3 behavior).
    treebank_sentences: int = 18000
    # systematic Dutch inflection lexicon (sources/inflect.py) folded
    # into MBLEM/MBMA training — the stand-in for e-Lex / CELEX
    # (advanced.rst:121-191). Surfaces already present in the gold +
    # treebank training rows are dropped first, so trained-word behavior
    # (goldens, tst.ok) is byte-identical and only never-trained words
    # gain lemma/morph coverage. False restores round-4 training.
    inflection_lexicon: bool = True

    def __post_init__(self) -> None:
        if self.do_parse and not self.do_mwu:
            self.do_parse = False  # parser requires MWU (FrogAPI.cxx:470-533)


from frog_spark.functions.langmarkers import (
    EN_SENTENCE_ONLY,
    NL_MARKERS,
    NL_SENTENCE_EXTRA,
)

# sentence-gate variants of the shared marker table (see langmarkers.py
# for why the sentence gate uses a wider NL set and a narrower EN set)
_NL_STOP = set(NL_MARKERS) | set(NL_SENTENCE_EXTRA)
_EN_STOP = set(EN_SENTENCE_ONLY)


def _detect_lang(words: list[str]) -> str:
    """Tiny stopword-vote language id (same heuristic as
    operators/textstats.lang_id, in pure Python for the sentence gate)."""
    lw = {w.lower() for w in words}
    nl, en = len(lw & _NL_STOP), len(lw & _EN_STOP)
    if nl == 0 and en == 0:
        return "unk"
    return "nl" if nl >= en else "en"


def ext_tag_lexicon_from_inflect(
    cfg: "PipelineConfig",
) -> dict[str, list[str]] | None:
    """word -> sorted possible-tags map for the tagger's lexical-lookup
    fallback (models/mbt.py ext_lexicon); corpus-trained words take
    precedence at tag time, so no exclusion is needed. None when the
    inflection lexicon is disabled."""
    if not cfg.inflection_lexicon:
        return None
    from frog_spark.sources.inflect import inflection_rows

    ext: dict[str, list[str]] = {}
    for w, t, _l in inflection_rows():
        tags = ext.setdefault(w, [])
        if t not in tags:
            tags.append(t)
    for tags in ext.values():
        tags.sort()
    return ext


def training_rows(
    cfg: "PipelineConfig", syn: list
) -> tuple[list, list, dict[str, list[str]] | None]:
    """(lemma_rows, morph_rows, ext_tag_lexicon) for training MBLEM /
    MBMA / the tagger's lexical-lookup fallback under ``cfg`` — the
    single source of truth shared by the driver trainers in
    FrogPipeline.build and callers that feed the SAME rows to the
    distributed trainers (tests/test_train_distributed.py full-chain
    parity)."""
    lemma_rows = lemma_training(syn)
    morph_rows = morph_training(syn)
    if cfg.inflection_lexicon:
        from frog_spark.sources.inflect import (
            inflection_morph_rows,
            inflection_rows,
        )

        # corpus-trained surfaces stay canonical (byte-identical
        # goldens); the lexicon only adds never-trained words
        trained = {w.lower() for w, _t, _l in lemma_rows}
        lemma_rows = lemma_rows + [
            r for r in inflection_rows() if r[0].lower() not in trained
        ]
        # corpus-trained (surface, head) pairs stay canonical; a lexicon
        # reading under ANOTHER head may still join as a homograph
        # alternate (Mbma.resolve_key_rows merges it only when the
        # corpus reading round-trips unchanged — 'fietsen' keeps the
        # corpus [fiets][en] N analysis AND gains the WW reading)
        trained_m: dict[str, set[str]] = {}
        for w, t, _m in morph_rows:
            trained_m.setdefault(w.lower(), set()).add(t.split("(", 1)[0])
        morph_rows = morph_rows + [
            r
            for r in inflection_morph_rows()
            if r[1].split("(", 1)[0] not in trained_m.get(r[0].lower(), ())
        ]
    return lemma_rows, morph_rows, ext_tag_lexicon_from_inflect(cfg)


def _pdf(rows, columns):
    """pandas DataFrame that stays Arrow-convertible when EMPTY: a frame
    built from no rows defaults every column to float64, which Arrow
    cannot cast to array/string fields — force object dtype instead."""
    if len(rows) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in columns})
    return pd.DataFrame(rows, columns=columns)


TIMER_MODULES = ("tagger", "mblem", "mbma", "ner", "iob", "mwu", "parser")


class PipelineTimers:
    """O4 per-module timers — the Spark analogue of the reference's
    TimerBlocks (/root/reference/src/FrogAPI.cxx:2937-2967): one
    DoubleAccumulator per module, fed from inside the annotation UDF after
    every Arrow batch. ``seconds()`` reads them on the driver after an
    action; ``table()`` materializes the metrics table the north rule's
    lineage/counter requirement asks for."""

    def __init__(self, spark: SparkSession):
        self.acc = {
            m: spark.sparkContext.accumulator(0.0) for m in TIMER_MODULES
        }

    def seconds(self) -> dict[str, float]:
        return {m: a.value for m, a in self.acc.items()}

    def table(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [(m, float(v)) for m, v in sorted(self.seconds().items())],
            "module string, wall_sec double",
        )


def _drain_timers(pipe: "FrogPipeline", timers: PipelineTimers | None) -> None:
    """Move executor-local stage timings into the Spark accumulators.

    With no accumulators attached the local dict is CLEARED anyway —
    leftover timings from a timer-less job would otherwise be drained
    into the NEXT job's accumulators on a reused Python worker and
    inflate its module numbers."""
    local = getattr(pipe, "_local_timers", None)
    if not local:
        return
    if timers is None:
        local.clear()
        return
    for k in list(local):
        timers.acc[k].add(local.pop(k, 0.0))


class FrogPipeline:
    """All trained models + lexicons; picklable, broadcast once.

    Mutating any model attribute after first use (e.g. swapping in a
    retrained parser) automatically invalidates the cached broadcast
    handle (``_bc``) and the driver-side sentence cache, so annotation
    never silently continues with stale executor-side models; call
    ``release()`` when discarding a long-lived pipeline to free the
    broadcast's executor memory."""

    #: attributes whose assignment invalidates the broadcast + caches
    _MODEL_ATTRS = frozenset(
        {"tagger", "mblem", "mbma", "ner", "chunker", "mwu_lexicon", "parser", "config"}
    )

    def __setattr__(self, name, value):
        if name in self._MODEL_ATTRS:
            old_bc = self.__dict__.pop("_bc", None)
            if old_bc is not None:
                try:
                    old_bc.unpersist()
                except Exception:
                    pass
            self.__dict__.pop("_sent_cache", None)
        object.__setattr__(self, name, value)

    def release(self) -> None:
        """Drop the cached broadcast (unpersist on executors) and the
        sentence cache. Safe to call repeatedly."""
        bc = self.__dict__.pop("_bc", None)
        if bc is not None:
            try:
                bc.unpersist()
            except Exception:
                pass
        self.__dict__.pop("_sent_cache", None)

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
    def build(
        cls,
        config: PipelineConfig | None = None,
        corpus_path: str | None = None,
        mblem_lexicon=None,
        pos_corpus=None,
        dep_treebank=None,
        mbma_lexicon=None,
    ) -> "FrogPipeline":
        """Model training/loading (run_api, FrogAPI.cxx:893-1050).

        ``corpus_path`` is the froggen analogue (SURVEY.md §2.10 O5,
        /root/reference/docs/source/advanced.rst:1-40): point it at any
        annotated corpus in the gold_corpus.tsv format to train a fresh
        model set from scratch.

        Training at corpus scale is a SPARK JOB, not a driver loop:
        pass ``mblem_lexicon`` (a DataFrame of (word, tag, lemma) rows —
        the e-Lex shape, advanced.rst:121-136), ``pos_corpus`` (a
        DataFrame of (words array, tags array) sentences) and/or
        ``dep_treebank`` (a DataFrame in models.distributed's
        TREEBANK_SCHEMA — sources/treebank.treebank_df emits it) and the
        MBLEM / POS / parser models are trained by the distributed
        trainers in frog_spark.models.distributed (partitioned IGTree
        recursion; parity with the driver trainer is test-asserted).
        The gold corpus is unioned into ``dep_treebank`` training so the
        distributed parser is a drop-in for the shipped one. The small
        committed gold corpus (plus the synthetic treebank per
        ``cfg.treebank_sentences``) remains the default for every
        component not given a large-scale source.
        """
        import os

        from frog_spark.sources.resources import RESOURCE_DIR

        cfg = config or PipelineConfig()
        gold = load_gold_corpus(corpus_path)
        if cfg.augment_variants > 0:
            from frog_spark.sources.augment import augment_gold

            gold = augment_gold(gold, n_variants=cfg.augment_variants)
        # tagger / NER / parser / MBLEM / MBMA additionally train on
        # the synthetic treebank — heads+rels+POS+BIO+lemmas are real
        # gold there, and since round 4 the vocabulary carries real
        # CELEX-style morph segmentations too (sources/treebank.py
        # _build_morph_table; surfaces outside the table stay
        # monomorphemic, which is correct for the names/function words
        # they cover).
        syn = gold
        if cfg.treebank_sentences > 0:
            from frog_spark.sources.treebank import synthetic_treebank

            syn = gold + synthetic_treebank(cfg.treebank_sentences)
        gaz = Gazetteer(load_gazetteer())
        override = None
        if cfg.ner_override_path is not None:
            p = (
                os.path.join(RESOURCE_DIR, "ner_override.tsv")
                if cfg.ner_override_path == "default"
                else cfg.ner_override_path
            )
            override = Gazetteer(load_gazetteer(p))
        if mblem_lexicon is not None and mbma_lexicon is not None:
            # fully distributed lexicon training: the driver-side row
            # lists would be thrown away, so only build the tagger's
            # ext lexicon
            lemma_rows = morph_rows = None
            ext_tag_lexicon = ext_tag_lexicon_from_inflect(cfg)
        else:
            lemma_rows, morph_rows, ext_tag_lexicon = training_rows(cfg, syn)
        if mblem_lexicon is not None:
            from frog_spark.models.distributed import train_mblem_distributed

            mblem = train_mblem_distributed(mblem_lexicon.sparkSession, mblem_lexicon)
        else:
            mblem = Mblem.train(lemma_rows)
        if pos_corpus is not None:
            from frog_spark.models.distributed import train_mbt_distributed
            from frog_spark.sources.resources import load_token_trans

            tagger = PosTagger(
                train_mbt_distributed(
                    pos_corpus.sparkSession, pos_corpus,
                    ext_lexicon=ext_tag_lexicon,
                ),
                load_token_trans(),
            )
        else:
            tagger = PosTagger.train(syn, ext_lexicon=ext_tag_lexicon)
        if dep_treebank is not None:
            from frog_spark.models.distributed import (
                gold_sentences_df,
                train_depparser_distributed,
            )

            sp = dep_treebank.sparkSession
            parser = train_depparser_distributed(
                sp, gold_sentences_df(sp, gold).unionAll(dep_treebank)
            )
        else:
            parser = DepParser.train(syn)
        if mbma_lexicon is not None:
            from frog_spark.models.distributed import train_mbma_distributed

            mbma = train_mbma_distributed(mbma_lexicon.sparkSession, mbma_lexicon)
        else:
            mbma = Mbma.train(morph_rows)
        return cls(
            tagger=tagger,
            mblem=mblem,
            mbma=mbma,
            ner=NerTagger.train(
                syn,
                gaz,
                override=override,
                override_unconditional=cfg.ner_override_unconditional,
                override_only_n_spec=cfg.ner_override_only_n_spec,
            ),
            chunker=IobChunker.train(gold),
            mwu_lexicon=load_mwu_lexicon(),
            parser=parser,
            config=cfg,
        )

    # -- the per-sentence pipeline (frog_sentence) ---------------------------

    _CACHE_MAX = 65536

    def annotate_sentence(
        self, words: list[str], token_classes: list[str], lang: str = "nl"
    ) -> list[dict]:
        """Cached wrapper: transcript corpora repeat sentences heavily
        (greetings, tool banners, quoted turns), so identical sentences
        are annotated once per executor. Bounded FIFO cache.

        The returned row dicts are SHARED with the cache — callers must
        treat them as immutable (all in-repo consumers only read them;
        copying on every hit doubled the allocation rate of the whole
        pipeline and showed up as memory-bandwidth contention at high
        core counts)."""
        key = (tuple(words), tuple(token_classes), lang)
        cache = getattr(self, "_sent_cache", None)
        if cache is None:
            cache = self._sent_cache = {}
        hit = cache.get(key)
        if hit is not None:
            return hit
        rows = self._annotate_sentence_uncached(words, token_classes, lang)
        if len(cache) >= self._CACHE_MAX:
            cache.clear()
        cache[key] = rows
        return rows

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
                # unit-/span-level denormalized fields: computed here (the
                # per-sentence pass already has them) so downstream unit
                # and entity-span tables are FILTERS, not aggregations —
                # at 10^12 turns this removes two shuffles + a window
                "unit_word": w,
                "unit_tag": "",
                "unit_lemma": "",
                "unit_morph": "",
                "unit_conf": 0.0,
                "span_text": None,
                "span_end": -1,
                "pair_triples": [],
                "verb_triples": [],
            }
            for i, (w, tc) in enumerate(zip(words, token_classes))
        ]
        # T3 language gate (/root/reference/src/FrogAPI.cxx:2058-2074):
        # a sentence whose detected language differs from the configured
        # one gets tokenize-only rows. 'unk'/unspecified annotates.
        detected = lang if lang and lang != "nl" else _detect_lang(words)
        if detected not in (cfg.language, "unk"):
            return rows

        # O4 per-module timers (TimerBlock analogue); executor-local dict
        # drained into Spark accumulators per Arrow batch (_drain_timers)
        timers = getattr(self, "_local_timers", None)
        if timers is None:
            timers = self._local_timers = {}
        clock = time.perf_counter

        t0 = clock()
        tagged = self.tagger.tag(words, token_classes)
        tags = [t for t, _ in tagged]
        confs = [c for _, c in tagged]
        for r, tag, conf in zip(rows, tags, confs):
            r["pos_tag"], r["pos_conf"] = tag, conf
        timers["tagger"] = timers.get("tagger", 0.0) + clock() - t0

        # mbma || mblem per word (OpenMP sections, FrogAPI.cxx:2096-2134)
        if cfg.do_lemma:
            t0 = clock()
            for i, r in enumerate(rows):
                lemmas = self.mblem.lemmatize(words[i], tags[i], token_classes[i])
                r["lemmas"] = lemmas
                r["lemma"] = lemmas[0]
            timers["mblem"] = timers.get("mblem", 0.0) + clock() - t0
        if cfg.do_morph:
            t0 = clock()
            for i, r in enumerate(rows):
                # next_tag (P3) feeds MBMA's V2I inflection cleanup
                # (cgn_tagger_mod.cxx:231-244 -> mbma_mod.cxx:446-510)
                next_tag = tags[i + 1] if i + 1 < n else ""
                morph, compound = self.mbma.analyze(
                    words[i], tags[i], token_classes[i], next_tag,
                    # the lemma disambiguates MBMA's productive-suffix
                    # fallback for unseen stem-final-t verbs (morpho.py
                    # _suffix_fallback); None when MBLEM is switched off
                    lemma=rows[i].get("lemma"),
                )
                r["morph"], r["compound"] = morph, compound
            timers["mbma"] = timers.get("mbma", 0.0) + clock() - t0

        # NER || IOB per sentence (FrogAPI.cxx:2140-2174)
        if cfg.do_ner:
            t0 = clock()
            ner_tags, ner_confs, ner_spans = self.ner.tag(words, tags)
            for r, t, c in zip(rows, ner_tags, ner_confs):
                r["ner_tag"], r["ner_conf"] = t, c
            for start, end, _cat, _conf in ner_spans:
                rows[start]["span_text"] = " ".join(words[start : end + 1])
                rows[start]["span_end"] = end
            timers["ner"] = timers.get("ner", 0.0) + clock() - t0
        if cfg.do_iob:
            t0 = clock()
            ch_tags, ch_confs, _cspans = self.chunker.tag(words, tags)
            for r, t, c in zip(rows, ch_tags, ch_confs):
                r["chunk_tag"], r["chunk_conf"] = t, c
            timers["iob"] = timers.get("iob", 0.0) + clock() - t0

        if cfg.do_mwu:
            t0 = clock()
            lemmas_col = [r["lemma"] or w for r, w in zip(rows, words)]
            units = resolve_mwus(words, tags, confs, lemmas_col, self.mwu_lexicon)
            for ui, u in enumerate(units):
                u_morph = "_".join(rows[k]["morph"] for k in range(u.start, u.end + 1))
                for k in range(u.start, u.end + 1):
                    rows[k]["unit_idx"] = ui + 1
                    rows[k]["mwu_start"] = u.start
                    rows[k]["mwu_end"] = u.end
                    rows[k]["unit_word"] = u.word
                    rows[k]["unit_tag"] = u.tag
                    rows[k]["unit_lemma"] = u.lemma
                    rows[k]["unit_morph"] = u_morph
                    rows[k]["unit_conf"] = u.conf
            timers["mwu"] = timers.get("mwu", 0.0) + clock() - t0
            if cfg.do_parse and n <= MAX_PARSER_TOKENS:
                t0 = clock()
                parsed = self.parser.parse_units(units)
                for u, (head, rel) in zip(units, parsed):
                    for k in range(u.start, u.end + 1):
                        rows[k]["parse_head"] = head
                        rows[k]["parse_role"] = rel
                # triple lift, sentence-local part (SURVEY.md §2.11 K2):
                # both verb triples and entity-pair LCA triples depend only
                # on THIS sentence's tree + spans, so they are computed in
                # the same pass — shipping them through groupBy+join stages
                # would be pure shuffle waste. The relational formulation
                # lives in kg/triples.py and is equality-tested against
                # these arrays.
                from frog_spark.kg.triples import (
                    lca_pair_triples_py,
                    verb_triples_py,
                )

                unit_rows = [
                    (
                        ui + 1,
                        u.lemma,
                        u.tag.split("(", 1)[0],
                        rows[u.start]["parse_head"],
                        rows[u.start]["parse_role"],
                    )
                    for ui, u in enumerate(units)
                ]
                ents = [
                    (r["unit_idx"], r["span_text"], r["ner_tag"][2:])
                    for r in rows
                    if r["span_text"] is not None
                ]
                vtrip = [
                    {
                        "subj": s, "pred": p, "obj": o,
                        "subj_cat": sc, "obj_cat": oc,
                    }
                    for s, p, o, sc, oc in verb_triples_py(unit_rows, ents)
                ]
                if vtrip:
                    rows[0]["verb_triples"] = vtrip
                if cfg.do_ner and len(ents) >= 2:
                    rows[0]["pair_triples"] = [
                        {
                            "subj": s, "pred": p, "obj": o,
                            "subj_cat": sc, "obj_cat": oc,
                        }
                        for s, p, o, sc, oc in lca_pair_triples_py(unit_rows, ents)
                    ]
                timers["parser"] = timers.get("parser", 0.0) + clock() - t0
        else:
            for r in rows:
                r["unit_tag"] = r["pos_tag"]
                r["unit_lemma"] = r["lemma"] or r["word"]
                r["unit_morph"] = r["morph"]
                r["unit_conf"] = r["pos_conf"]
        return rows


_TRIPLE_ARRAY = ArrayType(
    StructType(
        [
            StructField("subj", StringType()),
            StructField("pred", StringType()),
            StructField("obj", StringType()),
            StructField("subj_cat", StringType()),
            StructField("obj_cat", StringType()),
        ]
    )
)

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
        StructField("unit_word", StringType(), False),
        # the unit's MERGED tag (lexicon tag for MWUs, Unit.tag) — the
        # relational triple path must see the same tag the in-UDF lift
        # uses, not the first member token's tagger output
        StructField("unit_tag", StringType(), False),
        StructField("unit_lemma", StringType(), False),
        StructField("unit_morph", StringType(), False),
        StructField("unit_conf", DoubleType(), False),
        StructField("span_text", StringType(), True),
        StructField("span_end", IntegerType(), False),
        StructField("pair_triples", _TRIPLE_ARRAY, False),
        StructField("verb_triples", _TRIPLE_ARRAY, False),
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
    # reuse the pipeline's existing broadcast (see annotate_transcripts):
    # re-broadcasting an object that already carries a Broadcast in _bc
    # would pickle the nested broadcast by id and fail on the workers
    bc = getattr(pipeline, "_bc", None)
    if bc is None:
        bc = spark.sparkContext.broadcast(pipeline)
        try:
            pipeline._bc = bc
        except Exception:
            pass
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
                            a["unit_word"], a["unit_tag"], a["unit_lemma"], a["unit_morph"],
                            float(a["unit_conf"]), a["span_text"],
                            a["span_end"], a["pair_triples"], a["verb_triples"],
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
                yield _pdf(process_sentences(head), _OUT_COLS)
        if carry:
            yield _pdf(process_sentences(carry), _OUT_COLS)

    return shuffled.mapInPandas(run, schema=ANNOTATED_SCHEMA)


TRIPLE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("subj_cat", StringType(), True),
        StructField("obj_cat", StringType(), True),
        StructField("source", StringType(), False),
    ]
)


def triples_from_transcripts(
    spark: SparkSession,
    transcripts: DataFrame,
    pipeline: FrogPipeline | None = None,
    num_partitions: int | None = None,
    timers: PipelineTimers | None = None,
) -> DataFrame:
    """End-to-end transcripts -> (subj, pred, obj) triples in ONE stage.

    The full annotation chain still runs per sentence (that is the real
    work), but ONLY triple rows leave the UDF — the projection-specialized
    sibling of ``annotate_transcripts`` for consumers that don't need
    token-level output. Catalyst prunes columns of relational plans
    automatically; a pandas UDF's output schema is opaque to it, so the
    pruning is done here by construction (~10x less Arrow traffic than
    shipping annotated tokens and exploding them).

    Equivalence with extract_triples(annotate_transcripts(...)) is
    asserted in tests/test_triples_paths.py.
    """
    from frog_spark.operators.tokenizer import split_sentences, tokenize_text

    pipe = pipeline or FrogPipeline.build()
    # reuse a pipeline's broadcast across calls (a streaming foreachBatch
    # invokes this per micro-batch; re-broadcasting the full model set
    # every batch re-serializes MBs per batch and accumulates blocks)
    bc = getattr(pipe, "_bc", None)
    if bc is None:
        bc = spark.sparkContext.broadcast(pipe)
        try:
            pipe._bc = bc
        except Exception:
            pass
    parts = num_partitions or spark.sparkContext.defaultParallelism
    shuffled = transcripts.select("conv_id", "turn_idx", "text").repartition(
        parts, "conv_id", "turn_idx"
    ).sortWithinPartitions("conv_id", "turn_idx")
    out_cols = [f.name for f in TRIPLE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p: FrogPipeline = bc.value
        for b in batches:
            rows: list[tuple] = []
            for conv_id, turn_idx, text in zip(
                b["conv_id"], b["turn_idx"], b["text"]
            ):
                turn_idx = int(turn_idx)
                toks = tokenize_text(text or "")
                for si, sent in enumerate(split_sentences(toks)):
                    ann = p.annotate_sentence(
                        [t.word for t in sent],
                        [t.token_class for t in sent],
                        "nl",
                    )
                    for src, key in (("verb", "verb_triples"), ("entpair", "pair_triples")):
                        for t in ann[0][key]:
                            rows.append(
                                (
                                    conv_id, turn_idx, si,
                                    t["subj"], t["pred"], t["obj"],
                                    t["subj_cat"], t["obj_cat"], src,
                                )
                            )
            _drain_timers(p, timers)
            yield _pdf(rows, out_cols)

    return shuffled.mapInPandas(run, schema=TRIPLE_SCHEMA)


def annotate_transcripts(
    spark: SparkSession,
    transcripts: DataFrame,
    pipeline: FrogPipeline | None = None,
    num_partitions: int | None = None,
    timers: PipelineTimers | None = None,
) -> DataFrame:
    """transcripts (conv_id, turn_idx, role, text, tool, ts) -> annotated
    tokens.

    Fused path: the ONE shuffle of the pipeline happens at TURN grain
    (a turn row is ~6x smaller than its exploded token rows), then
    tokenization + the full per-sentence chain run in a single
    mapInPandas — no token-level exchange ever exists. ``tokenize_turns``
    + ``annotate_tokens`` remain available for token-level inputs.
    """
    from frog_spark.operators.tokenizer import split_sentences, tokenize_text

    pipe = pipeline or FrogPipeline.build()
    # reuse a pipeline's broadcast across calls (a streaming foreachBatch
    # invokes this per micro-batch; re-broadcasting the full model set
    # every batch re-serializes MBs per batch and accumulates blocks)
    bc = getattr(pipe, "_bc", None)
    if bc is None:
        bc = spark.sparkContext.broadcast(pipe)
        try:
            pipe._bc = bc
        except Exception:
            pass
    parts = num_partitions or spark.sparkContext.defaultParallelism

    shuffled = transcripts.select("conv_id", "turn_idx", "text").repartition(
        parts, "conv_id", "turn_idx"
    ).sortWithinPartitions("conv_id", "turn_idx")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p: FrogPipeline = bc.value
        for b in batches:
            cols: list[list] = [[] for _ in _OUT_COLS]
            for conv_id, turn_idx, text in zip(
                b["conv_id"], b["turn_idx"], b["text"]
            ):
                turn_idx = int(turn_idx)
                toks = tokenize_text(text or "")
                for si, sent in enumerate(split_sentences(toks)):
                    words = [t.word for t in sent]
                    tcs = [t.token_class for t in sent]
                    ann = p.annotate_sentence(words, tcs, "nl")
                    for ti, (t, a) in enumerate(zip(sent, ann)):
                        row = (
                            conv_id, turn_idx, si, ti,
                            a["word"], a["token_class"], t.no_space,
                            a["pos_tag"], float(a["pos_conf"]),
                            a["lemma"], a["lemmas"], a["morph"], a["compound"],
                            a["ner_tag"], float(a["ner_conf"]),
                            a["chunk_tag"], float(a["chunk_conf"]),
                            a["unit_idx"], a["mwu_start"], a["mwu_end"],
                            a["parse_head"], a["parse_role"],
                            a["unit_word"], a["unit_tag"], a["unit_lemma"], a["unit_morph"],
                            float(a["unit_conf"]), a["span_text"],
                            a["span_end"], a["pair_triples"], a["verb_triples"],
                        )
                        for c, v in zip(cols, row):
                            c.append(v)
            _drain_timers(p, timers)
            if not cols[0]:
                yield _pdf([], _OUT_COLS)
            else:
                yield pd.DataFrame(dict(zip(_OUT_COLS, cols)))

    return shuffled.mapInPandas(run, schema=ANNOTATED_SCHEMA)
