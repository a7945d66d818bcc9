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

Spark-first shape: everything sentence-local (span assembly, unit
merging, the LCA walk) is computed inside the one annotation pass and
denormalized onto token rows, so the unit and entity-span tables are
narrow FILTERS (zero shuffle); the only relational work left is the verb
triple lift — two hash joins on (conv_id, turn_idx, sent_idx, head_unit).
That split is deliberate scale design: per-sentence logic never crosses a
partition boundary, cross-row logic stays declarative for Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENT_KEY = ["conv_id", "turn_idx", "sent_idx"]
OBJ_ROLES = ("obj1", "obj2", "predc")

#: verbs that are AUXILIARIES whenever they govern a vc dependent: a
#: perfect/passive/modal auxiliary takes su + vc only, never its own
#: object — an obj/predc attached to it is a parse artifact (the gold
#: trees hang the object on the embedded participle/infinitive, where
#: no su joins it, so the gold lift emits NO triple for these). The
#: constraint is conditional on the vc edge: the same lemmas as MAIN
#: verbs ('De club heeft een stadion', 'Hij is de trainer') keep their
#: objects. Deliberately excludes AcI verbs (laten, zien, horen),
#: whose obj1 + vc co-occur legitimately.
AUX_VC_LEMMAS = (
    "hebben", "zijn", "worden", "zullen",
    "willen", "kunnen", "moeten", "mogen",
)


def entity_spans(annotated: DataFrame) -> DataFrame:
    """K1: one row per entity span.

    Span assembly happened inside the annotation pass (the per-sentence
    UDF mirrors the reference's sequential span grouping,
    /root/reference/src/ner_tagger_mod.cxx:423-503, and stamps the
    B- token with span_text/span_end) — so this is a narrow FILTER with
    zero shuffle; at 10^12 turns the lift starts from a column-pruned
    scan of 4 columns.
    """
    return annotated.filter(F.col("span_text").isNotNull()).select(
        *SENT_KEY,
        F.col("token_idx").alias("span_id"),
        F.col("token_idx").alias("start"),
        F.col("span_end").alias("end"),
        F.expr("substring(ner_tag, 3)").alias("ner_cat"),
        F.col("span_text"),
        F.col("ner_conf").alias("conf"),
        F.col("unit_idx").alias("first_unit"),
    )


def units(annotated: DataFrame) -> DataFrame:
    """Post-MWU unit table: one row per parse unit (narrow filter — the
    unit merge was done in the annotation pass)."""
    return (
        annotated.filter(F.col("token_idx") == F.col("mwu_start"))
        .select(
            *SENT_KEY,
            "unit_idx",
            F.col("unit_word").alias("word"),
            F.col("unit_lemma").alias("lemma"),
            # the unit's MERGED tag (lexicon tag for MWUs) — NOT the first
            # member token's tagger output; the in-UDF lift keys verb
            # detection on Unit.tag and both paths must agree
            F.col("unit_tag").alias("pos_tag"),
            "parse_head",
            "parse_role",
            F.col("token_idx").alias("start_tok"),
        )
        .withColumn("pos_head", F.split(F.col("pos_tag"), r"\(").getItem(0))
    )


def _units_with_repr(annotated: DataFrame) -> DataFrame:
    """Units + entity-span surface where the unit starts a span.

    A unit can start MORE than one span in degenerate taggings (NER runs
    before MWU merge, so a glue MWU's member tokens can carry two B-*
    tags); keep the FIRST span per unit — the same rule the in-UDF path
    applies (ent_by_unit.setdefault) — or the left join would fan the
    unit out into duplicate triples."""
    u = units(annotated)
    ent = (
        entity_spans(annotated)
        .groupBy(*SENT_KEY, F.col("first_unit").alias("unit_idx"))
        .agg(
            F.min(F.struct("start", "span_text", "ner_cat")).alias("e")
        )
        .select(
            *SENT_KEY, "unit_idx",
            F.col("e.span_text").alias("ent_text"),
            F.col("e.ner_cat").alias("ner_cat"),
        )
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
    # auxiliaries (su + vc only) drop out — same rule as verb_triples_py
    vc_heads = (
        u.filter(F.col("parse_role") == "vc")
        .select(*SENT_KEY, F.col("parse_head").alias("v_idx"))
        .distinct()
    )
    aux_with_vc = verbs.filter(F.col("pred").isin(*AUX_VC_LEMMAS)).join(
        vc_heads, SENT_KEY + ["v_idx"], "left_semi"
    )
    verbs = verbs.join(aux_with_vc, SENT_KEY + ["v_idx"], "left_anti")
    return (
        verbs.join(subs, SENT_KEY + ["v_idx"])
        .join(objs, SENT_KEY + ["v_idx"])
        .select(
            *SENT_KEY, "subj", "pred", "obj", "subj_cat", "obj_cat",
            F.lit("verb").alias("source"),
        )
    )


def verb_triples_py(
    unit_rows: list[tuple[int, str, str, int, str]],
    entities: list[tuple[int, str, str]],
) -> list[tuple[str, str, str, str | None, str | None]]:
    """Pure-Python verb-argument lift for one sentence — THE single
    implementation shared by the annotation UDF (plans/pipeline.py) and
    the gold harness (kg/gold.py), so the P/R measurement can never
    drift from the pipeline's own lift. unit_rows:
    (unit_idx, lemma, pos_head, parse_head, role); entities:
    (first_unit, span_text, cat). Output order is deterministic:
    verbs in unit order, subjects/objects in unit order."""
    ent_by_unit: dict[int, tuple[str, str]] = {}
    for fu, text, cat in entities:
        ent_by_unit.setdefault(fu, (text, cat))

    def repr_of(u_idx: int) -> tuple[str, str | None]:
        hit = ent_by_unit.get(u_idx)
        return hit if hit else (unit_rows[u_idx - 1][1], None)

    vc_heads = {u[3] for u in unit_rows if u[4] == "vc"}
    out: list[tuple[str, str, str, str | None, str | None]] = []
    for v_idx, v_lemma, v_pos, _vh, _vr in unit_rows:
        if v_pos != "WW":
            continue
        subs = [u for u in unit_rows if u[3] == v_idx and u[4] == "su"]
        if v_lemma in AUX_VC_LEMMAS and v_idx in vc_heads:
            continue  # auxiliary: su + vc only (see AUX_VC_LEMMAS)
        objs = [u for u in unit_rows if u[3] == v_idx and u[4] in OBJ_ROLES]
        for su_u in subs:
            for ob_u in objs:
                s_repr, s_cat = repr_of(su_u[0])
                o_repr, o_cat = repr_of(ob_u[0])
                out.append((s_repr, v_lemma, o_repr, s_cat, o_cat))
    return out


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
    """K2b: entity-pair LCA path triples.

    The LCA walk ran inside the annotation pass (both its inputs — the
    dependency tree and the entity spans — are sentence-local, so a
    groupBy+join formulation would only add shuffles); the results sit on
    the sentence's first token as ``pair_triples``. This is a narrow
    filter + explode."""
    return _exploded(annotated, "pair_triples", "entpair")


def _exploded(annotated: DataFrame, col: str, source: str) -> DataFrame:
    return (
        annotated.filter((F.col("token_idx") == 0) & (F.size(col) > 0))
        .select(*SENT_KEY, F.explode(col).alias("t"))
        .select(
            *SENT_KEY,
            F.col("t.subj").alias("subj"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
            F.col("t.subj_cat").alias("subj_cat"),
            F.col("t.obj_cat").alias("obj_cat"),
            F.lit(source).alias("source"),
        )
    )


def extract_triples(annotated: DataFrame) -> DataFrame:
    """K2: full lift — verb triples + entity-pair triples.

    Fast path: both triple families were computed in the annotation pass
    (sentence-local by construction) and sit as arrays on each sentence's
    first token, so the lift is ONE narrow filter+explode stage over a
    SINGLE read of the input — zero shuffles and no double execution of
    the annotation UDF (a union of two branches would run it twice).
    ``extract_triples_relational`` keeps the declarative hash-join
    formulation; tests assert both agree.
    """

    def tag(col: str, source: str):
        return F.transform(
            F.col(col),
            lambda t: F.struct(
                t["subj"].alias("subj"),
                t["pred"].alias("pred"),
                t["obj"].alias("obj"),
                t["subj_cat"].alias("subj_cat"),
                t["obj_cat"].alias("obj_cat"),
                F.lit(source).alias("source"),
            ),
        )

    both = F.concat(tag("verb_triples", "verb"), tag("pair_triples", "entpair"))
    return (
        annotated.filter((F.col("token_idx") == 0) & (F.size(both) > 0))
        .select(*SENT_KEY, F.explode(both).alias("t"))
        .select(*SENT_KEY, "t.subj", "t.pred", "t.obj", "t.subj_cat",
                "t.obj_cat", "t.source")
    )


def extract_triples_relational(
    annotated: DataFrame, persist: bool = True
) -> DataFrame:
    """The DataFrame-op lift: hash-join verb triples + exploded pair
    triples. Eager localCheckpoint stops the union's subplans from racing
    to compute the annotation UDF concurrently (a lazy persist would not
    serialize the first computation)."""
    if persist:
        annotated = annotated.localCheckpoint(eager=True)
    return verb_triples(annotated).unionByName(entity_pair_triples(annotated))
