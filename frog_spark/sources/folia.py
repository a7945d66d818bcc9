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


def folia_xml(annotated: DataFrame) -> DataFrame:
    """Annotated token rows -> one FoLiA document string per turn.
    Output: (conv_id, turn_idx, folia).
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
    sents = (
        annotated.select(
            "conv_id", "turn_idx", "sent_idx", "token_idx", w_xml.alias("w_xml")
        )
        .groupBy("conv_id", "turn_idx", "sent_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token_idx", "w_xml"))),
                    lambda s: s["w_xml"],
                ),
                "",
            ).alias("s_body")
        )
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
                F.lit('">'), F.col("s_body"), F.lit("</s>"),
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
