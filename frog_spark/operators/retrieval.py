"""Lexical retrieval over the documents table: BM25 scoring + top-k.

Training-data pipelines use BM25 both for quality-targeted selection
(retrieve documents similar to a trusted seed set — the DSIR / "data
selection via importance resampling" family) and for decontamination
triage. The reference engine has no retrieval operator; this is part of
the §2.12 at-scale extension set.

Spark-first shape (Robertson/Okapi BM25, k1=1.2, b=0.75):
  * tokenize scan-side (pure JVM split/lower — whole-stage codegen),
  * explode only the QUERY terms (the filter is pushed below the
    explode, so the shuffled relation is |docs| x |query| at most, never
    the full posting list),
  * df(term) and avgdl are tiny aggregates broadcast back into the join,
  * one groupBy(doc) sums the per-term contributions; TakeOrdered(k)
    ends the plan (no full sort at 100 TB).

The whole computation is SQL-expressible, so the DuckDB oracle in
__spark_entry__ recomputes it exactly (scores rounded to 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def _tokens(text_col):
    return F.split(F.trim(F.lower(F.regexp_replace(text_col, r"[^A-Za-z0-9\s]", " "))), r"\s+")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    Output: (doc_id, n_terms_hit, score) ordered by score desc then
    doc_id (deterministic tie-break), score rounded to 6.
    """
    terms = [t.lower() for t in query_terms]
    toks = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("w")).select(
        id_col, F.size("w").alias("dl"), F.col("w")
    )
    # ONE pass for both corpus scalars (N and avgdl) — at 100 TB a
    # separate count() would be a second full scan
    stats = toks.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = stats["n"], stats["avgdl"]

    term_arr = F.array(*[F.lit(t) for t in terms])
    tf = (
        toks.select(id_col, "dl", F.explode(F.array_intersect(F.array_distinct("w"), term_arr)).alias("probe"), "w")
        .select(
            id_col,
            "dl",
            F.col("probe").alias("term"),
            F.size(F.filter("w", lambda x: x == F.col("probe"))).alias("tf"),
        )
    )
    df_t = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    # idf = ln(1 + (N - df + 0.5)/(df + 0.5)); df side is tiny -> broadcast
    scored = tf.join(F.broadcast(df_t), "term").select(
        id_col,
        "term",
        (
            F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * (K1 + 1))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.lit(float(avgdl))))
        ).alias("contrib"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_terms_hit"), F.round(F.sum("contrib"), 6).alias("score")
    )
    return agg.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
