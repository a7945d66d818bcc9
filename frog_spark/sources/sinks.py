"""Output sinks (SURVEY.md §2.1 S6-S7, §1.4 output schemas).

Tabbed ("columned") output mirrors /root/reference/src/FrogAPI.cxx:2254-2324
and /root/reference/src/FrogData.cxx:122-183:
  index word lemma morph [compound] pos pos_conf(6dp) ner iob head role
  - index is 1-based over post-MWU units; MWU-merged rows join member
    fields with '_' and MULTIPLY POS confidences (merge(), FrogData.cxx:142-183)
  - confidence rendered fixed, 6 decimals (FrogAPI.cxx:2291-2295)

JSON output mirrors /root/reference/src/FrogData.cxx:65-117 (to_json).
Both are deterministic SELECT ... ORDER BY views — the golden-compare
surface for per-turn equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["conv_id", "turn_idx", "sent_idx"]


def merged_units(annotated: DataFrame) -> DataFrame:
    """Post-MWU merged rows (the unit-level view the tabbed sink renders).

    The '_'-joined fields and the product-of-members confidence
    (FrogData.cxx:142-183) were computed in the annotation pass, so this
    is a narrow filter on the unit's first token — no shuffle."""
    # MWU rows join the MEMBER tags with '_' (tag, ner, chunk) and force
    # compound '0', per the reference merge(); member tags come from one
    # bounded aggregation over each unit's tokens — the per-unit scalar
    # fields stay the denormalized first-token values
    member = (
        annotated.groupBy(*_KEY, "unit_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("token_idx", "pos_tag", "ner_tag", "chunk_tag")
                        )
                    ),
                    lambda s: s["pos_tag"],
                ),
                "_",
            ).alias("m_pos"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("token_idx", "ner_tag"))
                    ),
                    lambda s: s["ner_tag"],
                ),
                "_",
            ).alias("m_ner"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("token_idx", "chunk_tag"))
                    ),
                    lambda s: s["chunk_tag"],
                ),
                "_",
            ).alias("m_chunk"),
        )
    )
    first = annotated.filter(F.col("token_idx") == F.col("mwu_start"))
    is_mwu = F.col("mwu_end") > F.col("mwu_start")
    return first.join(member, [*_KEY, "unit_idx"]).select(
        *_KEY,
        "unit_idx",
        F.col("unit_word").alias("word"),
        F.col("unit_lemma").alias("lemma"),
        F.col("unit_morph").alias("morph"),
        F.when(is_mwu, F.lit("0")).otherwise(F.col("compound")).alias("compound"),
        F.when(is_mwu, F.col("m_pos")).otherwise(F.col("pos_tag")).alias("pos_tag"),
        F.col("unit_conf").alias("pos_conf"),
        F.when(is_mwu, F.col("m_ner")).otherwise(F.col("ner_tag")).alias("ner_tag"),
        F.when(is_mwu, F.col("m_chunk")).otherwise(F.col("chunk_tag")).alias("chunk_tag"),
        "parse_head",
        "parse_role",
        is_mwu.alias("is_mwu"),
    )


def tabbed_output(annotated: DataFrame, compounds: bool = False) -> DataFrame:
    """One row per post-MWU unit in reference column order; ``line`` holds
    the rendered TSV line (diffable against a golden file)."""
    u = merged_units(annotated)
    conf_str = F.format_string("%.6f", F.col("pos_conf"))
    head_str = F.when(F.col("parse_head") >= 0, F.col("parse_head").cast("string")).otherwise(
        F.lit("")
    )
    cols = [
        F.col("unit_idx").cast("string"),
        F.col("word"),
        F.col("lemma"),
        F.col("morph"),
    ]
    if compounds:
        cols.append(F.col("compound"))
    cols += [
        F.col("pos_tag"),
        conf_str,
        F.col("ner_tag"),
        F.col("chunk_tag"),
        head_str,
        F.col("parse_role"),
    ]
    return u.select(
        *_KEY,
        F.col("unit_idx"),
        F.concat_ws("\t", *cols).alias("line"),
    ).orderBy(*_KEY, "unit_idx")


def write_tabbed(annotated: DataFrame, path: str, compounds: bool = False) -> None:
    tabbed_output(annotated, compounds).select("line").write.mode("overwrite").text(path)


def json_output(annotated: DataFrame) -> DataFrame:
    """One JSON array per sentence (to_json shape, FrogData.cxx:65-117)."""
    u = merged_units(annotated)
    obj = F.struct(
        F.col("unit_idx").alias("index"),
        F.col("word"),
        F.col("lemma"),
        F.col("morph"),
        F.struct(
            F.col("pos_tag").alias("tag"), F.col("pos_conf").alias("confidence")
        ).alias("pos"),
        F.col("ner_tag").alias("ner"),
        F.col("chunk_tag").alias("chunking"),
        F.struct(
            F.col("parse_head").alias("parse_index"),
            F.col("parse_role").alias("parse_role"),
        ).alias("parse"),
    )
    return (
        u.groupBy(*_KEY)
        .agg(
            F.to_json(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("unit_idx", obj.alias("o")))),
                    lambda s: s["o"],
                )
            ).alias("json")
        )
        .orderBy(*_KEY)
    )
