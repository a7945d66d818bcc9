"""Corpus-curation operators for training-data pipelines: PII
scrubbing, token-budget mixture fill, temperature resampling weights,
and vocabulary construction.

These extend the §2.12 at-scale set (the reference engine is a per-
document annotator and has no corpus-curation layer; see SURVEY.md §2).
All four are pure JVM plans (built-in pyspark.sql.functions, no Python
UDFs) with exact ANSI-SQL oracles in __spark_entry__:

* ``pii_scrub`` — regex detection + redaction of emails / E.164-style
  phone numbers / IPv4 addresses. Runs entirely inside the scan stage
  (zero shuffle): at 100 TB this is a map-only pass whose cost is the
  read itself.
* ``quota_fill`` — deterministic per-stratum token-budget selection
  (the "mix 30% web, 20% code, ..." step of corpus assembly): docs are
  taken in md5(id)-order per stratum until the stratum's token budget
  is exhausted. One shuffle on the stratum key; the running sum is a
  window inside each stratum. Selection is stable under repartitioning
  and engine changes because the order key is a content hash, not a
  partition index.
* ``temperature_mix`` — per-group sampling weights share^alpha
  (the multilingual "temperature sampling" rule of mBERT/XLM-R and
  the data-mixing literature): one groupBy over the corpus, then
  arithmetic on the tiny per-group relation.
* ``vocab_topk`` — corpus word-frequency vocabulary with deterministic
  ids (count desc, word asc) and cumulative coverage. The global sort
  touches only the k survivors (TakeOrdered), never the full type
  inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# shared tokenizer with textstats (the oracle SQL mirrors it verbatim)
from frog_spark.operators.textstats import _words

# Java and RE2 agree on these (no backrefs, no lookaround, leftmost-
# first semantics identical for this pattern shape)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{2} [0-9]{3} [0-9]{7}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Detect and redact emails, phone numbers and IPv4 addresses.

    Output: (id, n_emails, n_phones, n_ips, n_pii, redacted). Emails are
    redacted first so an address's digit runs can never be re-matched as
    a phone/IP fragment; the placeholders contain no digits, so the
    three passes cannot interact.
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0))
    n_ips = F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IPV4_RE,
        "<IP>",
    )
    return docs.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        (n_emails + n_phones + n_ips).alias("n_pii"),
        redacted.alias("redacted"),
    )


def quota_fill(
    docs: DataFrame,
    budget_tokens: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fill each stratum's token budget in deterministic md5(id) order.

    A doc is kept while the stratum's running token total (inclusive)
    stays <= budget_tokens, so every engine keeps the identical prefix
    of the identical hash-ordered sequence. One shuffle (on the stratum
    key); at 100 TB a hot stratum is the skew case — the same two-pass
    trick as txt_pack applies (per-partition partial sums + offsets),
    but the windowed form is the honest default because budgets are per
    STRATUM and strata counts are bounded (sources, not documents).
    """
    key = F.md5(
        F.concat_ws(":", F.col(strata_col), F.col(id_col).cast("string"))
    )
    base = docs.select(
        F.col(id_col),
        F.col(strata_col),
        F.size(_words(F.col(text_col))).alias("n_tokens"),
        key.alias("fill_key"),
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy("fill_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= F.lit(budget_tokens))
        .select(id_col, strata_col, "n_tokens", "cum_tokens")
    )


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.5,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-sampling weights per group: w_g ∝ share_g^alpha.

    Output per group: n_docs, n_tokens, natural token share, the
    alpha-tempered sampling weight, and mix_factor = weight / share
    (>1 means the group is up-sampled relative to its natural size —
    the low-resource-language boost alpha exists to provide). One
    corpus-wide groupBy; everything after runs on the per-group rows.
    """
    # ONE corpus pass (the groupBy); the total and the normalizer are
    # unpartitioned windows over the per-group relation, whose row count
    # is bounded by the number of groups (languages/sources), so the
    # single-partition window exchange moves a handful of rows — never
    # re-reads the corpus (the naive agg-and-crossJoin formulation plans
    # FOUR full scans at 100 TB)
    per = docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_words(F.col(text_col)))).alias("n_tokens"),
    )
    all_groups = Window.partitionBy()
    shared = per.withColumn(
        "share", F.col("n_tokens") / F.sum("n_tokens").over(all_groups)
    ).withColumn(
        "weight",
        F.pow("share", F.lit(alpha))
        / F.sum(F.pow("share", F.lit(alpha))).over(all_groups),
    )
    return shared.select(
        F.col(group_col).alias("group"),
        "n_docs",
        "n_tokens",
        F.round("share", 6).alias("share"),
        F.round("weight", 6).alias("weight"),
        F.round(F.col("weight") / F.col("share"), 6).alias("mix_factor"),
    ).orderBy("group")


def vocab_topk(
    docs: DataFrame, k: int = 256, text_col: str = "text"
) -> DataFrame:
    """Top-k corpus vocabulary with deterministic ids and coverage.

    vocab_id ranks by (count desc, word asc). The heavy part — word
    counting — is a map-side-combined groupBy; the global order is a
    TakeOrdered over the per-word counts (never a full sort), and the
    id/coverage window runs on the k surviving rows only, which is why
    the single-partition window is safe at any corpus size.

    The coverage denominator (total tokens) is a second aggregate over
    the SAME word-count relation: at runtime AQE collapses it onto a
    ReusedExchange of the counts shuffle, so the corpus is scanned and
    the words shuffled exactly once (gated in tests/test_curation.py).
    """
    words = docs.select(F.explode(_words(F.col(text_col))).alias("word"))
    counts = words.groupBy("word").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    top = counts.orderBy(F.desc("n"), F.asc("word")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("word"))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("vocab_id"),
            "word",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("freq_share"),
            F.round(F.sum(F.col("n") / F.col("total")).over(cum), 6).alias(
                "cum_share"
            ),
        )
        .orderBy("vocab_id")
    )


URL_HOST_RE = r"https?://([A-Za-z0-9.-]+)"


def url_host_filter(
    docs: DataFrame,
    blocklist: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """URL extraction + domain-blocklist filtering — the first gate of
    C4/RefinedWeb-style web pipelines.

    Output: (id, n_urls, n_blocked, keep) where hosts are the capture
    group of ``URL_HOST_RE`` and keep is n_blocked == 0. Occurrences
    count (a doc linking a blocked host twice reports 2), so the
    blocked-host check is a filter over the extracted list, not a
    set intersection. Pure scan-stage JVM, zero shuffle; the blocklist
    is inlined as a literal array here (broadcast-join it instead when
    it outgrows a literal — same plan shape either way).
    """
    hosts = F.regexp_extract_all(F.col(text_col), F.lit(URL_HOST_RE), 1)
    bl = F.array(*[F.lit(b) for b in sorted(set(blocklist))])
    n_urls = F.size(hosts)
    n_blocked = F.size(F.filter(hosts, lambda h: F.array_contains(bl, h)))
    return docs.select(
        F.col(id_col),
        n_urls.alias("n_urls"),
        n_blocked.alias("n_blocked"),
        (n_blocked == 0).alias("keep"),
    )


def length_percentiles(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group token-length profile with ENGINE-INDEPENDENT discrete
    percentiles: p is the value at 1-indexed position ceil(p * n) in
    (n_tokens, id)-sorted order — a definition both Spark and any SQL
    engine reproduce exactly (interpolating quantile functions differ
    across engines and would never hash-match).

    One shuffle: the rank window and the final aggregate share the
    group partitioning.
    """
    w = Window.partitionBy(group_col).orderBy("n_tokens", "doc_id")
    base = (
        docs.select(
            F.col(group_col),
            F.col("doc_id"),
            F.size(_words(F.col(text_col))).cast("long").alias("n_tokens"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy(group_col)))
    )

    def pick(p: float):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("n_tokens")
            )
        )

    return (
        base.groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            pick(0.5).alias("p50_tokens"),
            pick(0.9).alias("p90_tokens"),
            pick(0.99).alias("p99_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
        )
        .orderBy(group_col)
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG/pretraining passage chunking: overlapping word-window
    slices of each document (X64).

    Chunk i covers words [i*stride, i*stride + window); the last chunk
    index is ceil((n - window)/stride) so every word is covered and no
    chunk starts past the text (a document shorter than one window is
    one chunk; whitespace-only documents yield none). Pure scan-stage
    JVM work — split, sequence, explode, slice — zero shuffle, so at
    100 TB this is a map-only pass whose output cost is the ~1.33x
    (window/stride) duplication the overlap intends.

    Output: (id, chunk_idx, n_words, chunk_text).
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    if stride > window:
        # words between windows would go uncovered and the last chunk
        # could start past the text, breaking the documented coverage
        # invariant (every word covered, no chunk starts past the text)
        raise ValueError("stride must be <= window for full coverage")
    words = _words(F.col(text_col))
    n = F.size(words)
    last = F.when(n <= window, F.lit(0)).otherwise(
        F.ceil((n - F.lit(window)) / F.lit(float(stride))).cast("int")
    )
    return (
        docs.where(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.posexplode(F.sequence(F.lit(0), last)).alias("chunk_idx", "_i"),
            words.alias("_w"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size(
                F.slice(F.col("_w"), F.col("chunk_idx") * stride + 1, window)
            ).alias("n_words"),
            F.concat_ws(
                " ",
                F.slice(F.col("_w"), F.col("chunk_idx") * stride + 1, window),
            ).alias("chunk_text"),
        )
    )
