"""Triple lift: annotated tokens -> entity spans -> (subj, pred, obj)
triples (SURVEY.md §2.11, K1-K2).

Lift specification (fixed; applied identically to reference-derived gold
annotations and to pipeline output so P/R is meaningful):

  * verb triples: for each verb-headed unit V (CGN head WW) with a
    ``su``-dependent S and an ``obj1``/``obj2``/``predc``-dependent O,
    emit (repr(S), lemma(V), repr(O)) where repr(U) is U's NER span
    surface text when U starts an entity span, else U's lemma.
  * entity-pair path triples: for every ordered pair of entity spans
    (A before B) in one sentence whose dependency-path LCA is a verb
    unit distinct from both, emit (text(A), lemma(LCA), text(B)).

Spark-first shape: entity spans and units are WINDOW + groupBy
aggregations over the annotated token table; verb triples are two hash
joins on (conv_id, turn_idx, sent_idx, head_unit) — co-partitioned with
the annotation output so AQE keeps them local; only the per-sentence LCA
walk runs in a pandas UDF over collected (small) unit arrays.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SENT_KEY = ["conv_id", "turn_idx", "sent_idx"]
OBJ_ROLES = ("obj1", "obj2", "predc")


def entity_spans(annotated: DataFrame) -> DataFrame:
    """K1: NER BIO tags -> one row per entity span.

    span_id = running count of B- markers within the sentence
    (window sum ≙ the reference's sequential span assembly,
    /root/reference/src/ner_tagger_mod.cxx:423-503).
    """
    w = Window.partitionBy(*SENT_KEY).orderBy("token_idx")
    toks = annotated.withColumn(
        "is_b", F.when(F.col("ner_tag").startswith("B-"), 1).otherwise(0)
    ).withColumn("span_id", F.sum("is_b").over(w))
    ent = (
        toks.filter(F.col("ner_tag") != "O")
        .groupBy(*SENT_KEY, "span_id")
        .agg(
            F.min("token_idx").alias("start"),
            F.max("token_idx").alias("end"),
            F.first(F.expr("substring(ner_tag, 3)")).alias("ner_cat"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("token_idx", "word"))
                    ),
                    lambda s: s["word"],
                ),
            ).alias("span_text"),
            F.avg("ner_conf").alias("conf"),
            F.min("unit_idx").alias("first_unit"),
        )
    )
    return ent


def units(annotated: DataFrame) -> DataFrame:
    """Post-MWU unit table: one row per parse unit."""
    return (
        annotated.groupBy(*SENT_KEY, "unit_idx")
        .agg(
            F.concat_ws(
                "_",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token_idx", "word"))),
                    lambda s: s["word"],
                ),
            ).alias("word"),
            F.concat_ws(
                "_",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token_idx", "lemma"))),
                    lambda s: s["lemma"],
                ),
            ).alias("lemma"),
            F.first("pos_tag").alias("pos_tag"),
            F.first("parse_head").alias("parse_head"),
            F.first("parse_role").alias("parse_role"),
            F.min("token_idx").alias("start_tok"),
        )
        .withColumn("pos_head", F.split(F.col("pos_tag"), r"\(").getItem(0))
    )


def _units_with_repr(annotated: DataFrame) -> DataFrame:
    """Units + entity-span surface where the unit starts a span."""
    u = units(annotated)
    ent = entity_spans(annotated).select(
        *SENT_KEY,
        F.col("first_unit").alias("unit_idx"),
        F.col("span_text").alias("ent_text"),
        F.col("ner_cat"),
    )
    u = u.join(ent, SENT_KEY + ["unit_idx"], "left")
    return u.withColumn("repr", F.coalesce("ent_text", "lemma"))


def verb_triples(annotated: DataFrame) -> DataFrame:
    """K2a: su + obj/predc dependents of one verb -> triple. Two hash
    joins on the sentence key + head unit index."""
    u = _units_with_repr(annotated)
    verbs = u.filter(F.col("pos_head") == "WW").select(
        *SENT_KEY,
        F.col("unit_idx").alias("v_idx"),
        F.col("lemma").alias("pred"),
    )
    subs = u.filter(F.col("parse_role") == "su").select(
        *SENT_KEY,
        F.col("parse_head").alias("v_idx"),
        F.col("repr").alias("subj"),
        F.col("ner_cat").alias("subj_cat"),
    )
    objs = u.filter(F.col("parse_role").isin(*OBJ_ROLES)).select(
        *SENT_KEY,
        F.col("parse_head").alias("v_idx"),
        F.col("repr").alias("obj"),
        F.col("ner_cat").alias("obj_cat"),
    )
    return (
        verbs.join(subs, SENT_KEY + ["v_idx"])
        .join(objs, SENT_KEY + ["v_idx"])
        .select(
            *SENT_KEY, "subj", "pred", "obj", "subj_cat", "obj_cat",
            F.lit("verb").alias("source"),
        )
    )


_PAIR_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("sent_idx", IntegerType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("subj_cat", StringType()),
        StructField("obj_cat", StringType()),
        StructField("source", StringType()),
    ]
)


def lca_pair_triples_py(
    unit_rows: list[tuple[int, str, str, int, str]],
    entities: list[tuple[int, str, str]],
) -> list[tuple[str, str, str, str, str]]:
    """Pure-Python LCA lift for one sentence (shared with the gold
    harness). unit_rows: (unit_idx, lemma, pos_head, parse_head, role);
    entities: (first_unit, span_text, cat)."""
    heads = {u[0]: u[3] for u in unit_rows}
    lemma = {u[0]: u[1] for u in unit_rows}
    pos = {u[0]: u[2] for u in unit_rows}

    def ancestors(x: int) -> list[int]:
        out = [x]
        seen = {x}
        while True:
            h = heads.get(x, -1)
            if h is None or h <= 0 or h in seen:
                break
            out.append(h)
            seen.add(h)
            x = h
        return out

    triples = []
    ents = sorted(entities)
    for i in range(len(ents)):
        for j in range(i + 1, len(ents)):
            a, b = ents[i], ents[j]
            anc_a = ancestors(a[0])
            anc_b = set(ancestors(b[0]))
            lca = next((x for x in anc_a if x in anc_b), None)
            if (
                lca is not None
                and lca != a[0]
                and lca != b[0]
                and pos.get(lca) == "WW"
            ):
                triples.append((a[1], lemma[lca], b[1], a[2], b[2]))
    return triples


def entity_pair_triples(annotated: DataFrame) -> DataFrame:
    """K2b: entity-pair LCA path triples; units collected per sentence
    (bounded: sentences are small) inside an Arrow-batched UDF."""
    u = units(annotated).select(
        *SENT_KEY,
        F.struct("unit_idx", "lemma", "pos_head", "parse_head", "parse_role").alias(
            "u"
        ),
    ).groupBy(*SENT_KEY).agg(F.collect_list("u").alias("units"))
    e = entity_spans(annotated).select(
        *SENT_KEY,
        F.struct("first_unit", "span_text", "ner_cat").alias("e"),
    ).groupBy(*SENT_KEY).agg(F.collect_list("e").alias("ents"))
    joined = u.join(e, SENT_KEY)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for conv_id, turn_idx, sent_idx, units_arr, ents_arr in zip(
                b["conv_id"], b["turn_idx"], b["sent_idx"], b["units"], b["ents"]
            ):
                unit_rows = [
                    (
                        x["unit_idx"],
                        x["lemma"],
                        x["pos_head"],
                        x["parse_head"],
                        x["parse_role"],
                    )
                    for x in units_arr
                ]
                ents = [
                    (x["first_unit"], x["span_text"], x["ner_cat"]) for x in ents_arr
                ]
                for s, p, o, sc, oc in lca_pair_triples_py(unit_rows, ents):
                    rows.append(
                        (conv_id, int(turn_idx), int(sent_idx), s, p, o, sc, oc,
                         "entpair")
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _PAIR_SCHEMA.fields])

    return joined.mapInPandas(run, schema=_PAIR_SCHEMA)


def extract_triples(annotated: DataFrame, persist: bool = True) -> DataFrame:
    """K2: full lift — union of verb triples and entity-pair triples.

    The lift reads ``annotated`` through four aggregation branches
    (units x2, spans x2); without materialization Spark would re-execute
    the expensive annotation UDF once per branch, so the input is
    persisted (skip with persist=False when the caller already
    checkpointed it, e.g. kg/materialize.py reads it back from parquet).
    """
    if persist:
        from pyspark import StorageLevel

        annotated = annotated.persist(StorageLevel.MEMORY_AND_DISK)
    return verb_triples(annotated).unionByName(entity_pair_triples(annotated))
