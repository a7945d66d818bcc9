"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All JVM-side (built-in pyspark.sql.functions, whole-stage codegen) — these
run inside the parquet scan stage with no shuffle at all, which is exactly
what a 100 TB quality-filter pass needs. Each has an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the single shared marker table (functions/langmarkers.py) — the DuckDB
# oracle SQL is generated from the same lists, so they cannot drift
from frog_spark.functions.langmarkers import EN_MARKERS as EN_STOP
from frog_spark.functions.langmarkers import NL_MARKERS as NL_STOP


def _words(text_col: Column) -> Column:
    return F.split(F.trim(F.lower(F.regexp_replace(text_col, r"\s+", " "))), " ")


def token_count(text_col: Column) -> Column:
    """Whitespace token count (BPE-ish subword estimate = chars/4 is a
    separate column in quality_score)."""
    return F.size(F.split(F.trim(text_col), r"\s+"))


def _stop_hits(text_col: Column, stops: list[str]) -> Column:
    words = _words(text_col)
    arr = F.array(*[F.lit(s) for s in stops])
    return F.size(F.array_intersect(F.array_distinct(words), arr))


def lang_id(text_col: Column) -> Column:
    """'nl' / 'en' / 'unk' by distinct-stopword votes."""
    nl, en = _stop_hits(text_col, NL_STOP), _stop_hits(text_col, EN_STOP)
    return (
        F.when((nl == 0) & (en == 0), "unk")
        .when(nl >= en, "nl")
        .otherwise("en")
    )


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features + composite score (length, punctuation
    ratio, stopword ratio, mean word length, subword estimate).

    Staged projections (round 6): the single-projection version inlined
    every base measure into every ratio and the composite score, so the
    regex/split/array_intersect subtrees were re-evaluated up to 6x per
    row — and the array expressions are CodegenFallback, outside
    whole-stage-codegen's subexpression elimination. Binding the counts
    as attributes first makes each base measure compute exactly once per
    row; outputs are expression-for-expression identical."""
    t = F.col(text_col)
    darr = F.array_distinct(_words(t))
    nl_arr = F.array(*[F.lit(s) for s in NL_STOP])
    en_arr = F.array(*[F.lit(s) for s in EN_STOP])
    all_arr = F.array(*[F.lit(s) for s in NL_STOP + EN_STOP])
    base = docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        token_count(t).alias("n_tokens"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).alias("_n_punct"),
        F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).alias("_n_alpha"),
        F.size(F.array_intersect(darr, all_arr)).alias("_stop_hits"),
        F.size(F.array_intersect(darr, nl_arr)).alias("_nl_hits"),
        F.size(F.array_intersect(darr, en_arr)).alias("_en_hits"),
    )
    n_chars, n_tokens = F.col("n_chars"), F.col("n_tokens")
    stop_ratio = F.col("_stop_hits") / F.greatest(n_tokens, F.lit(1))
    punct_ratio = F.col("_n_punct") / F.greatest(n_chars, F.lit(1))
    mean_word_len = F.col("_n_alpha") / F.greatest(n_tokens, F.lit(1))
    score = (
        F.when((n_tokens >= 5) & (n_tokens <= 100000), 0.25).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.25).otherwise(0.0)
        + F.when(stop_ratio >= 0.01, 0.25).otherwise(0.0)
        + F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 0.25).otherwise(0.0)
    )
    nl, en = F.col("_nl_hits"), F.col("_en_hits")
    lang_pred = (
        F.when((nl == 0) & (en == 0), "unk")
        .when(nl >= en, "nl")
        .otherwise("en")
    )
    return base.select(
        F.col(id_col),
        "n_chars",
        "n_tokens",
        (n_chars / F.lit(4.0)).alias("est_subwords"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality_score"),
        lang_pred.alias("lang_pred"),
    )


_URL_RE = r"(https?://|www\.)[^\s]+"
_EMAIL_RE = r"[A-Za-z0-9.+_-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+"
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def clean_text(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pretraining-corpus text cleanup: strip URLs and e-mail addresses,
    drop control characters, collapse whitespace runs, trim. Pure JVM
    regexp chain inside the scan stage (zero shuffle — the shape a 100-TB
    cleanup pass must have). Output: (doc_id, clean, n_removed_chars)."""
    t = F.col(text_col)
    stripped = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(t, _URL_RE, " "), _EMAIL_RE, " "),
        _CTRL_RE,
        " ",
    )
    clean = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return docs.select(
        F.col(id_col),
        clean.alias("clean"),
        (F.length(t) - F.length(clean)).alias("n_removed_chars"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of normalized text (exact)
    + first-8-words rolling prefix hash (fuzzy prefix matcher)."""
    norm = F.trim(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    prefix = F.concat_ws(" ", F.slice(F.split(norm, " "), 1, 8))
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("fp_exact"),
        F.md5(prefix).alias("fp_prefix"),
    )


def gopher_repetition(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality filter (Rae et al. 2021, table A1
    — the public repetition thresholds used to filter MassiveText):
    per-document word-2-gram duplicate fraction and top-2-gram fraction,
    plus the keep/drop verdict.

    Spark-first shape: bigrams are built scan-side with a pure-JVM
    ``transform(sequence(...))`` (no UDF), then ONE shuffle on
    (doc_id, bigram) with map-side combine does all the counting — the
    same plan holds at 100 TB because the key space is bounded by the
    corpus's bigram vocabulary per document, never all-pairs. Documents
    with < 2 tokens keep fractions of 0.0 (nothing can repeat).

    Output: (doc_id, n_bigrams, dup_bigram_frac, top_bigram_frac, keep),
    fractions rounded to 6 for cross-engine comparison. Thresholds:
    top-2-gram fraction <= 0.20 (the published 2-gram knob) and
    duplicate-2-gram fraction <= 0.60.
    """
    # bind the word array as an attribute first: inlined into the
    # transform lambda, the interpreted HOF would re-run the whole
    # normalize+split per bigram element (see gram_sets)
    wdf = docs.select(F.col(id_col), _words(F.col(text_col)).alias("_w"))
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("_w") - 2),
        lambda i: F.concat(
            F.element_at("_w", i + 1), F.lit(" "), F.element_at("_w", i + 2)
        ),
    )
    exploded = (
        wdf.select(F.col(id_col), F.when(F.size("_w") >= 2, bigrams).alias("bg"))
        .select(id_col, F.explode_outer("bg").alias("bigram"))
    )
    per_bigram = exploded.groupBy(id_col, "bigram").agg(F.count("*").alias("c"))
    agg = per_bigram.groupBy(id_col).agg(
        F.sum(F.when(F.col("bigram").isNotNull(), F.col("c")).otherwise(0)).alias("n_bigrams"),
        F.sum(F.when(F.col("bigram").isNotNull(), 1).otherwise(0)).alias("n_distinct"),
        F.max(F.when(F.col("bigram").isNotNull(), F.col("c")).otherwise(0)).alias("top_c"),
    )
    nb = F.col("n_bigrams")
    dup_frac = F.when(nb > 0, F.round(1.0 - F.col("n_distinct") / nb, 6)).otherwise(0.0)
    top_frac = F.when(nb > 0, F.round(F.col("top_c") / nb, 6)).otherwise(0.0)
    return agg.select(
        F.col(id_col),
        nb.alias("n_bigrams"),
        dup_frac.alias("dup_bigram_frac"),
        top_frac.alias("top_bigram_frac"),
        ((dup_frac <= 0.60) & (top_frac <= 0.20)).alias("keep"),
    )


def unigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Self-perplexity quality proxy: per-document mean unigram surprisal
    -avg(log2 p(w)) under the corpus's own unigram distribution.

    The cheap stand-in for an external-LM perplexity filter (CCNet /
    Gopher both rank on LM scores): documents far from the corpus
    distribution (gibberish, boilerplate, wrong-language) score high.
    Plan shape: one explode + ONE aggregation shuffle for the frequency
    table, which joins back to the exploded words. The frequency table
    is |vocabulary|-sized — at 100 TB that's still millions of rows
    (words, not documents), so the join stays a broadcast when the
    vocabulary is bounded and degrades to a plain shuffle join (both
    sides keyed by word) when it is not; Spark's AQE picks per run.

    Output: (doc_id, n_tokens, avg_surprisal) — surprisal rounded to 6
    for cross-engine comparison.
    """
    words = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("word")
    )
    freq = words.groupBy("word").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    scored = (
        words.join(freq, "word")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            (-F.log2(F.col("c") / F.col("t"))).alias("surprisal"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("surprisal"), 6).alias("avg_surprisal"),
        )
    )


def corpus_divergence(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Distribution-shift detector: unigram KL divergence (bits) of each
    corpus slice against the whole corpus, KL(slice || corpus) =
    sum_w p_s(w) * log2(p_s(w) / p_c(w)).

    Data-pipeline observability — a slice (language, source, crawl
    snapshot) whose token distribution drifts from the corpus is the
    first thing a curation run should flag. The corpus distribution's
    support contains every slice's by construction, so no smoothing is
    needed and the number is exact (oracle-reproducible). Plan: one
    (group, word) aggregation shuffle; the per-word corpus counts are a
    vocabulary-sized relation joined on word.

    Output: (group, n_tokens, n_types, kl_bits) ordered by group.
    """
    words = docs.select(
        F.col(group_col).alias("group"), F.explode(_words(F.col(text_col))).alias("word")
    )
    gw = words.groupBy("group", "word").agg(F.count("*").alias("gc"))
    gt = gw.groupBy("group").agg(F.sum("gc").alias("gn"))
    cw = gw.groupBy("word").agg(F.sum("gc").alias("cc"))
    ct = gt.agg(F.sum("gn").alias("cn"))
    joined = (
        gw.join(gt, "group")
        .join(cw, "word")
        .crossJoin(F.broadcast(ct))
        .select(
            "group",
            "gc",
            (
                (F.col("gc") / F.col("gn"))
                * F.log2((F.col("gc") / F.col("gn")) / (F.col("cc") / F.col("cn")))
            ).alias("term"),
        )
    )
    return (
        joined.groupBy("group")
        .agg(
            F.sum("gc").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.round(F.sum("term"), 6).alias("kl_bits"),
        )
        .orderBy("group")
    )
