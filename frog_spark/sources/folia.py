"""FoLiA XML sink/source (SURVEY.md §2.1 S8/S2, simplified subset).

The reference emits full FoLiA documents through libfolia
(append_to_sentence, /root/reference/src/FrogAPI.cxx:1429-1506; layer
writers in each module). This implements a SIMPLIFIED but well-formed
subset of the public FoLiA schema (https://proycon.github.io/folia/):
``<FoLiA><text><p><s><w><t/><pos/><lemma/><morphology/></w></s></p></text></FoLiA>``
— the annotation layers frog's tabbed output carries, without provenance
processors or set declarations (documented deviation).

Spark-first shape: the SINK builds each turn's document declaratively —
per-token element strings are pure JVM ``concat``/``regexp_replace``
expressions, sentence and document assembly are ordered
``array_join(array_sort(collect_list(struct(...))))`` aggregations (two
shuffles, both on the output grain). The SOURCE parses documents with
stdlib ``xml.etree`` inside ``mapInPandas`` (Arrow-batched, one parse per
turn, no driver involvement).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FOLIA_NS = "http://ilk.uvt.nl/folia"


def _esc(col):
    """XML-escape a string column (&, <, >, \" — order matters)."""
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    return F.regexp_replace(c, '"', "&quot;")


def _bio_span_layer(
    tok: DataFrame, tag_col: str, layer: str, element: str
) -> DataFrame:
    """BIO-tagged tokens -> one `<layer>...</layer>` string per sentence.

    Span grouping is the standard lag-window trick (a new span starts at
    B-*, or at I-* after O / a different category — the same repair
    semantics N4 applies), entirely JVM-side. Mirrors the reference's
    span writers (ner_tagger_mod.cxx:625-702 entities,
    iob_tagger_mod.cxx:177-264 chunking)."""
    from pyspark.sql import Window

    sw = Window.partitionBy("conv_id", "turn_idx", "sent_idx").orderBy("token_idx")
    cat = F.substring_index(F.col(tag_col), "-", -1)
    prev_tag = F.lag(tag_col, 1, "O").over(sw)
    prev_cat = F.substring_index(prev_tag, "-", -1)
    starts = (F.col(tag_col) != "O") & (
        F.col(tag_col).startswith("B-")
        | (prev_tag == "O")
        | (prev_cat != cat)
    )
    spans = (
        tok.withColumn("_start", starts.cast("int"))
        .withColumn("_span", F.sum("_start").over(sw))
        .filter(F.col(tag_col) != "O")
        .groupBy("conv_id", "turn_idx", "sent_idx", "_span")
        .agg(
            F.min(F.struct("token_idx", F.substring_index(tag_col, "-", -1).alias("cat")))["cat"].alias("cat"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token_idx", "w_id", "word"))),
                    lambda s: F.concat(
                        F.lit('<wref id="'), s["w_id"], F.lit('" t="'),
                        _esc(s["word"]), F.lit('"/>'),
                    ),
                ),
                "",
            ).alias("wrefs"),
        )
        .withColumn(
            "span_xml",
            F.concat(
                F.lit(f'<{element} class="'), _esc(F.col("cat")), F.lit('">'),
                F.col("wrefs"), F.lit(f"</{element}>"),
            ),
        )
    )
    return spans.groupBy("conv_id", "turn_idx", "sent_idx").agg(
        F.concat(
            F.lit(f"<{layer}>"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_span", "span_xml"))),
                    lambda s: s["span_xml"],
                ),
                "",
            ),
            F.lit(f"</{layer}>"),
        ).alias(f"{layer}_xml")
    )


def _dependency_layer(tok: DataFrame) -> DataFrame:
    """Per-sentence `<dependencies>` layer (Parser.cxx:1220-1273).

    One `<dependency class="rel">` per parse UNIT (MWU-collapsed), hd and
    dep each holding the unit's word wrefs; a unit headed by ROOT
    (parse_head 0) gets an empty `<hd/>` — a documented subset deviation
    that keeps the layer round-trippable without a phantom root word."""
    units = (
        tok.filter((F.col("parse_head") >= 0) & (F.col("parse_role") != ""))
        .groupBy("conv_id", "turn_idx", "sent_idx", "unit_idx")
        .agg(
            F.first("parse_head").alias("head_unit"),
            F.first("parse_role").alias("role"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token_idx", "w_id", "word"))),
                    lambda s: F.concat(
                        F.lit('<wref id="'), s["w_id"], F.lit('" t="'),
                        _esc(s["word"]), F.lit('"/>'),
                    ),
                ),
                "",
            ).alias("wrefs"),
        )
    )
    heads = units.select(
        "conv_id", "turn_idx", "sent_idx",
        F.col("unit_idx").alias("head_unit"),
        F.col("wrefs").alias("head_wrefs"),
    )
    deps = (
        units.join(heads, ["conv_id", "turn_idx", "sent_idx", "head_unit"], "left")
        .withColumn(
            "dep_xml",
            F.concat(
                F.lit('<dependency class="'), _esc(F.col("role")), F.lit('"><hd>'),
                F.coalesce(F.col("head_wrefs"), F.lit("")),
                F.lit("</hd><dep>"), F.col("wrefs"), F.lit("</dep></dependency>"),
            ),
        )
    )
    return deps.groupBy("conv_id", "turn_idx", "sent_idx").agg(
        F.concat(
            F.lit("<dependencies>"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("unit_idx", "dep_xml"))),
                    lambda s: s["dep_xml"],
                ),
                "",
            ),
            F.lit("</dependencies>"),
        ).alias("dependencies_xml")
    )


def folia_xml(annotated: DataFrame) -> DataFrame:
    """Annotated token rows -> one FoLiA document string per turn.
    Output: (conv_id, turn_idx, folia). Emits the full layer set the
    reference writes: per-word pos/lemma/morphology plus per-sentence
    entities, chunking, and dependencies span layers.
    """
    doc_id = F.concat_ws(".", F.col("conv_id"), F.col("turn_idx").cast("string"))
    w_id = F.concat_ws(
        ".",
        doc_id, F.lit("s"), F.col("sent_idx").cast("string"),
        F.lit("w"), F.col("token_idx").cast("string"),
    )
    w_xml = F.concat(
        F.lit('<w xml:id="'), w_id, F.lit('"><t>'), _esc(F.col("word")),
        F.lit('</t><pos class="'), _esc(F.col("pos_tag")),
        F.lit('" confidence="'), F.format_number(F.col("pos_conf"), 6),
        F.lit('"/><lemma class="'), _esc(F.col("lemma")),
        F.lit('"/><morphology class="'), _esc(F.col("morph")),
        F.lit('"/></w>'),
    )
    tok = annotated.select(
        "conv_id", "turn_idx", "sent_idx", "token_idx", "word",
        "ner_tag", "chunk_tag", "unit_idx", "parse_head", "parse_role",
        w_id.alias("w_id"), w_xml.alias("w_xml"),
    )
    ents = _bio_span_layer(tok, "ner_tag", "entities", "entity")
    chunks = _bio_span_layer(tok, "chunk_tag", "chunking", "chunk")
    deps = _dependency_layer(tok)
    keys = ["conv_id", "turn_idx", "sent_idx"]
    sents = (
        tok.groupBy(*keys)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token_idx", "w_xml"))),
                    lambda s: s["w_xml"],
                ),
                "",
            ).alias("s_body")
        )
        .join(ents, keys, "left")
        .join(chunks, keys, "left")
        .join(deps, keys, "left")
        .select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            F.concat(
                F.lit('<s xml:id="'),
                F.concat_ws(
                    ".",
                    F.col("conv_id"), F.col("turn_idx").cast("string"),
                    F.lit("s"), F.col("sent_idx").cast("string"),
                ),
                F.lit('">'), F.col("s_body"),
                F.coalesce(F.col("entities_xml"), F.lit("")),
                F.coalesce(F.col("chunking_xml"), F.lit("")),
                F.coalesce(F.col("dependencies_xml"), F.lit("")),
                F.lit("</s>"),
            ).alias("s_xml"),
        )
    )
    return (
        sents.groupBy("conv_id", "turn_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sent_idx", "s_xml"))),
                    lambda s: s["s_xml"],
                ),
                "",
            ).alias("body")
        )
        .select(
            "conv_id",
            "turn_idx",
            F.concat(
                F.lit('<?xml version="1.0" encoding="utf-8"?>'),
                F.lit(f'<FoLiA xmlns="{FOLIA_NS}" xml:id="'),
                F.concat_ws(".", F.col("conv_id"), F.col("turn_idx").cast("string")),
                F.lit('" version="2.5"><text xml:id="'),
                F.concat_ws(".", F.col("conv_id"), F.col("turn_idx").cast("string")),
                F.lit('.text"><p>'),
                F.col("body"),
                F.lit("</p></text></FoLiA>"),
            ).alias("folia"),
        )
    )


_PARSED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("token_idx", IntegerType(), False),
        StructField("word", StringType(), False),
        StructField("pos_tag", StringType(), False),
        StructField("pos_conf", DoubleType(), False),
        StructField("lemma", StringType(), False),
        StructField("morph", StringType(), False),
    ]
)


def parse_folia(folia_df: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, folia) -> token rows; stdlib xml.etree inside
    mapInPandas (the S2 scan analogue of run_folia_engine,
    /root/reference/src/FrogAPI.cxx:2797-2860)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        ns = {"f": FOLIA_NS}
        for b in batches:
            rows = []
            for conv_id, turn_idx, xml_str in zip(
                b["conv_id"], b["turn_idx"], b["folia"]
            ):
                root = ET.fromstring(xml_str)
                for si, s in enumerate(root.iterfind(".//f:s", ns)):
                    for ti, w in enumerate(s.iterfind("f:w", ns)):
                        pos = w.find("f:pos", ns)
                        lemma = w.find("f:lemma", ns)
                        morph = w.find("f:morphology", ns)
                        rows.append(
                            (
                                conv_id, int(turn_idx), si, ti,
                                w.findtext("f:t", "", ns),
                                pos.get("class", "") if pos is not None else "",
                                float(pos.get("confidence", "0").replace(",", ""))
                                if pos is not None else 0.0,
                                lemma.get("class", "") if lemma is not None else "",
                                morph.get("class", "") if morph is not None else "",
                            )
                        )
            cols = [f.name for f in _PARSED_SCHEMA.fields]
            if rows:
                yield pd.DataFrame(rows, columns=cols)
            else:
                # empty frames default to float64 columns, which Arrow
                # cannot cast to the string schema — force object dtype
                yield pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})

    return folia_df.mapInPandas(run, schema=_PARSED_SCHEMA)


_CORRECTED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("token_idx", IntegerType(), False),  # post-correction index
        StructField("word", StringType(), False),
        StructField("token_class", StringType(), False),
        StructField("corrected", BooleanType(), False),
        StructField("original", StringType(), True),  # pre-split word when corrected
    ]
)


def correct_folia_words(folia_df: DataFrame) -> DataFrame:
    """T4 word correction (UctoTokenizer::correct_words,
    /root/reference/src/ucto_tokenizer_mod.cxx:756-775): a pre-tokenized
    FoLiA document may contain words the tokenizer would split further
    ("gisteren?" -> "gisteren" + "?"); re-run the rule tokenizer on every
    <w> and emit the corrected token stream, flagging split tokens with
    their original — the relational analogue of the reference's FoLiA
    <correction><new> records. Row-local (mapInPandas over documents)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        from frog_spark.operators.tokenizer import tokenize_text

        ns = {"f": FOLIA_NS}
        for b in batches:
            rows = []
            for conv_id, turn_idx, xml_str in zip(
                b["conv_id"], b["turn_idx"], b["folia"]
            ):
                root = ET.fromstring(xml_str)
                for si, s in enumerate(root.iterfind(".//f:s", ns)):
                    ti = 0
                    for w in s.iterfind("f:w", ns):
                        surface = w.findtext("f:t", "", ns)
                        toks = tokenize_text(surface)
                        split = len(toks) > 1
                        for tok in toks:
                            rows.append(
                                (
                                    conv_id, int(turn_idx), si, ti,
                                    tok.word, tok.token_class,
                                    split, surface if split else None,
                                )
                            )
                            ti += 1
            cols = [f.name for f in _CORRECTED_SCHEMA.fields]
            if rows:
                yield pd.DataFrame(rows, columns=cols)
            else:
                yield pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})

    return folia_df.mapInPandas(run, schema=_CORRECTED_SCHEMA)


_SPAN_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("layer", StringType(), False),  # entity | chunk | dependency
        StructField("cls", StringType(), False),
        StructField("span_start", IntegerType(), False),  # token_idx of first dep/span wref
        StructField("span_end", IntegerType(), False),
        StructField("head_start", IntegerType(), True),  # dependencies only; null = ROOT
    ]
)


def _tok_of(wref_id: str) -> int:
    # w_id = <doc>.s.<sent>.w.<tok>
    return int(wref_id.rsplit(".", 1)[1])


def parse_folia_spans(folia_df: DataFrame) -> DataFrame:
    """Parse the entities / chunking / dependencies layers back out of
    FoLiA documents (round-trip counterpart of the span writers; the
    reference reads these layers through libfolia in run_folia_engine).
    Output: one row per span / dependency."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        ns = {"f": FOLIA_NS}
        for b in batches:
            rows = []
            for conv_id, turn_idx, xml_str in zip(
                b["conv_id"], b["turn_idx"], b["folia"]
            ):
                root = ET.fromstring(xml_str)
                for si, s in enumerate(root.iterfind(".//f:s", ns)):
                    for layer, el in (("entity", "f:entities/f:entity"),
                                      ("chunk", "f:chunking/f:chunk")):
                        for span in s.iterfind(el, ns):
                            toks = [
                                _tok_of(w.get("id"))
                                for w in span.iterfind("f:wref", ns)
                            ]
                            rows.append(
                                (conv_id, int(turn_idx), si, layer,
                                 span.get("class", ""), min(toks), max(toks), None)
                            )
                    for dep in s.iterfind("f:dependencies/f:dependency", ns):
                        dtoks = [
                            _tok_of(w.get("id"))
                            for w in dep.iterfind("f:dep/f:wref", ns)
                        ]
                        htoks = [
                            _tok_of(w.get("id"))
                            for w in dep.iterfind("f:hd/f:wref", ns)
                        ]
                        rows.append(
                            (conv_id, int(turn_idx), si, "dependency",
                             dep.get("class", ""), min(dtoks), max(dtoks),
                             min(htoks) if htoks else None)
                        )
            cols = [f.name for f in _SPAN_SCHEMA.fields]
            if rows:
                yield pd.DataFrame(rows, columns=cols)
            else:
                yield pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})

    return folia_df.mapInPandas(run, schema=_SPAN_SCHEMA)
