"""Training-data pipeline operators: dedup, decontamination, splitting,
packing.

All operators consume a DataFrame with (id, text) — typically the
``documents`` table — and are built from JVM-side functions only
(whole-stage codegen; no Python in the hot path except the embedding
band-key matmul). Each has a matching ANSI-SQL oracle in
__spark_entry__.py.

  * exact_dedup         — hash-groupBy on the md5 of normalized text
  * ngram_jaccard_pairs — EXACT set-similarity join (PPJoin prefix +
                          length filters, array-intersect verification)
  * minhash_dedup_pairs — MinHash-LSH banding, row-local signatures,
                          exact verification
  * simhash_dup_pairs   — 60-bit cross-engine SimHash + pigeonhole
                          Hamming blocking
  * embedding_dup_pairs — banded random-hyperplane LSH over vectors,
                          exact cosine verification
  * dedup_clusters      — connected components over near-dup pairs ->
                          canonical doc per transitive cluster
  * decontaminate       — benchmark n-gram-overlap flags (broadcast
                          semi-join against the distinct benchmark grams)
  * split_assign        — deterministic md5-hash train/val/test split
  * pack_documents      — training-sequence packing by stream offset
                          (hash-bucketed streams, one window pass)
"""

from __future__ import annotations

import math
from typing import Iterator  # noqa: UP035 — pyspark typehint resolution needs typing.Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from frog_spark.functions.skew import md5_bucket, spread


def _norm_text(col):
    # trim too — a leading/trailing space would otherwise contribute an
    # empty-string "word" to every gram/stopword computation
    return F.trim(F.lower(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest id per exact (normalized) text; one shuffle on the
    128-bit md5 of the normalized text, NOT the text itself — at 100 TB the
    raw string key would double the shuffle bytes (every document's text
    shipped twice, once as key and once as value). md5 collisions are
    cryptographically negligible, so grouping on the digest alone is exact.
    Output: (doc_id, text, dup_count)."""
    key = F.md5(_norm_text(F.col(text_col)))
    w = Window.partitionBy(key).orderBy(F.col(id_col))
    wc = Window.partitionBy(key)
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .withColumn("dup_count", F.count("*").over(wc))
        .filter(F.col("rn") == 1)
        .select(id_col, text_col, "dup_count")
    )


def gram_sets(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3, drop_short: bool = False
) -> DataFrame:
    """(id, grams: array<string>, sz) — distinct word n-grams per doc.

    Entirely row-local (split + transform + array_distinct inside the scan
    stage): the gram SET never leaves its row, so downstream consumers can
    choose between exploding it (global aggregates like document frequency)
    and shipping the whole array (pairwise verification), whichever moves
    fewer bytes.

    The word array and the gram array are bound as ATTRIBUTES in
    intermediate projections instead of being inlined into the
    higher-order ``transform`` lambda: HOFs are CodegenFallback, and an
    interpreted lambda re-evaluates every embedded subtree PER ELEMENT —
    inlined, the full regexp_replace+lower+split normalization ran once
    per gram and dominated every gram-based query (measured ~640 us/gram,
    ~52 s for one evaluation at the driver's sf=1.0; bound, the same
    corpus grams in ~2 s). CollapseProject keeps the split because the
    bound columns are referenced more than once by non-cheap expressions.

    ``drop_short=True`` drops docs with fewer than ``n`` words (i.e. the
    sz == 0 rows) HERE, as a word-count predicate below the gram
    projection. Callers must not filter the returned ``sz`` instead:
    predicate pushdown rewrites a filter on a derived column by inlining
    its whole expression tree, so ``.filter(sz > 0)`` plants the entire
    interpreted gram pipeline inside a scan-level Filter and re-pays it
    per row (measured: the old minhash shape spent ~40 s there at
    sf=1.0). ``n_words >= n  <=>  sz > 0`` exactly: cnt = n_words-(n-1)
    >= 1 yields >= 1 gram, and array_distinct never empties a non-empty
    array."""
    words = F.split(_norm_text(F.col(text_col)), " ")
    wdf = docs.select(F.col(id_col).alias("id"), words.alias("_words"))
    if drop_short:
        wdf = wdf.filter(F.size("_words") >= n)
    cnt = F.size(F.col("_words")) - (n - 1)
    # the outer coalesce makes grams NON-NULLABLE (text is a nullable
    # parquet column, and nullability propagates through the whole
    # expression): without it, InferFiltersFromConstraints turns any
    # downstream join touching grams/sz into a pushed-down
    # isnotnull(<entire inlined gram pipeline>) Filter at the scan —
    # the same per-element re-evaluation pathology as above, measured
    # ~17 s per verification side at sf=1.0. A null text yields [] just
    # like an empty text, which every consumer treats identically (no
    # gram rows, sz = 0, empty intersections).
    grams = F.coalesce(
        F.array_distinct(
            F.when(
                cnt > 0,
                F.transform(
                    F.sequence(F.lit(0), cnt - 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("_words"), i + 1, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ),
        F.array().cast("array<string>"),
    )
    gdf = wdf.select("id", grams.alias("grams"))
    return gdf.select("id", "grams", F.size("grams").alias("sz"))


def word_ngrams(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, ngram) exploded distinct word n-grams."""
    return gram_sets(docs, id_col, text_col, n).select(
        "id", F.explode("grams").alias("ngram")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT pairs with word-n-gram Jaccard >= threshold, via prefix
    filtering (PPJoin-style set-similarity join).

    Theorem: under any global total order of n-grams, two sets with
    J >= t must share an element within each set's first
    |S| - ceil(t*|S|) + 1 elements. Ordering by document frequency
    ascending makes those prefixes the RAREST grams, so the candidate
    self-join hits only low-df keys — the frequent-gram key explosion
    that kills a naive gram join at 100 TB never happens, with zero
    recall loss (verification computes true Jaccard over full sets).

    Verification ships the candidate ids back to the per-doc gram ARRAYS
    (array_intersect, row-local) instead of re-joining the exploded gram
    relation — the round-2 version needed a persist of the exploded grams
    to avoid recomputing them for four consumers; this shape has no
    multi-consumer hot relation, so nothing is cached and nothing leaks.

    Round-6 candidate tightening (guide §2.3 "shuffle fewer bytes"): the
    1-match prefix filter admits every pair sharing ONE rare gram — on a
    low-entropy corpus that was 7.2M candidate pairs at the driver's
    sf=1.0, each shipping two ~1 KB gram arrays through the verification
    joins, for a 2,792-pair result. This version uses the EXTENDED
    prefix (Xiao et al., PPJoin+ family): if |A ∩ B| = i then the k-th
    smallest common element (global gram order) sits within the first
    |A| - i + k elements of A and of B; for pairs passing the length
    filter i >= ceil(t*|A|), so prefixes of length
    |A| - ceil(t*|A|) + k must share min(k, ceil(t*(|A|+|B|)/(1+t)))
    elements. Requiring that match count (a groupBy instead of distinct)
    cuts candidates ~1000x with ZERO recall loss. Grams are compared by
    xxhash64 in the prefix/candidate phases (narrower shuffles); hash
    collisions merge grams into one pruning-order class — candidates can
    only be added by that, except the astronomically unlikely case of two
    same-hash grams inside ONE doc (P < 1e-11 even at 10^10 grams)
    perturbing the prefix tie layout; verification recomputes true
    Jaccard on the string arrays, so emitted values are exact
    regardless. ceil() calls subtract
    1e-9 first: IEEE t*sz can land an ulp above the exact product and
    round the prefix one element short (a real recall edge at e.g.
    t=0.8, sz=10).
    """
    k_ext = 3
    eps = 1e-9
    d = gram_sets(spread(docs), id_col, text_col, n)
    # sz is carried through the explode projection (row-local), so no
    # separate sizes aggregate + join is needed
    g = d.select("id", "sz", F.explode("grams").alias("ngram")).select(
        "id", "sz", F.xxhash64("ngram").alias("gh")
    )
    df_ = g.groupBy("gh").agg(F.count("*").alias("df"))
    # no broadcast hint on df_: one row per distinct gram can be huge on
    # a real corpus; AQE converts the join to broadcast at runtime when
    # the aggregate turns out small
    ranked = g.join(df_, "gh").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("id").orderBy("df", "gh")),
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(eps)) + k_ext
    ).select("id", "sz", "gh")
    # PPJoin LENGTH FILTER (J >= t requires t*|A| <= |B| <= |A|/t) prunes
    # candidates BEFORE the expensive full-set verification — on low-entropy
    # corpora (tiny vocabularies) prefix grams alone stay frequent and this
    # filter is what keeps the candidate set bounded
    pa = prefix.select(F.col("id").alias("a"), "gh", F.col("sz").alias("sz_a"))
    pb = prefix.select(F.col("id").alias("b"), "gh", F.col("sz").alias("sz_b"))
    required = F.least(
        F.lit(k_ext).cast("long"),
        F.ceil(
            (F.lit(threshold) / F.lit(1.0 + threshold))
            * (F.col("sz_a") + F.col("sz_b"))
            - F.lit(eps)
        ),
    )
    cands = (
        pa.join(pb, "gh")
        .filter(
            (F.col("a") < F.col("b"))
            & (F.col("sz_b") >= F.lit(threshold) * F.col("sz_a"))
            & (F.col("sz_a") >= F.lit(threshold) * F.col("sz_b"))
        )
        .groupBy("a", "b", "sz_a", "sz_b")
        .agg(F.count("*").alias("shared_prefix"))
        .filter(F.col("shared_prefix") >= required)
        .select("a", "b")
    )
    return _verify_jaccard(cands, d, threshold)


def _verify_jaccard(cands: DataFrame, gram_sets_df: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over per-doc gram arrays for candidate (a, b) pairs.

    Two shuffle joins ship each candidate's gram array once; the
    intersection itself is row-local (array_intersect), so the pairwise
    work never re-aggregates the exploded gram relation."""
    da = gram_sets_df.select(
        F.col("id").alias("a"), F.col("grams").alias("ga"), F.col("sz").alias("sz_a")
    )
    db = gram_sets_df.select(
        F.col("id").alias("b"), F.col("grams").alias("gb"), F.col("sz").alias("sz_b")
    )
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    return (
        cands.join(da, "a")
        .join(db, "b")
        .withColumn("jaccard", inter / (F.col("sz_a") + F.col("sz_b") - inter))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.7,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs over word shingles.

    Defaults (128 hashes, 32 bands of 4 rows) give P(candidate) =
    1-(1-J^4)^32 ≈ 0.9998 at J=0.7 and ≈0.23 at J=0.3 — near-total recall
    at the threshold with bounded spurious candidates; the true-Jaccard
    verification step makes precision exact either way, so the output
    equals the exact-join result on any corpus where no J>=t pair slips
    all 32 bands.

    Signature plan (round-3 rewrite): the whole 128-hash signature is
    ROW-LOCAL — one xxhash64 per shingle, then 128 universal-hash
    derivations (a_i*h + b_i mod 2^31-1, matching the base-hash domain —
    see the code comment on why the modulus MUST equal it,
    same construction as Spark MLlib's MinHashLSH) folded over the gram
    array with aggregate+zip_with(least). The round-2 version instead ran
    128 independent min(xxhash64(i, ngram)) aggregates over the EXPLODED
    gram relation: 128 string hashes per gram AND a groupBy shuffle of
    every gram row. This shape hashes each shingle once, shuffles
    nothing for signatures (they compute inside the scan stage), and
    needs no persist — the remaining shuffles are the text-key grouping
    window, the representative band self-join, the doc-pair expansion
    joins, and the two verification joins (see the text-grain
    contraction comment below)."""
    rows_per_band = num_hashes // bands
    # fixed-seed universal-hash family over Z_p with p = 2^31 - 1 (the
    # Mersenne prime): h_i = (a_i*h + b_i) mod p with h, a_i < p is a TRUE
    # permutation of the base-hash domain, which the minhash property
    # requires. (A larger modulus over a 2^31-bounded domain — the first
    # version of this rewrite — makes every affine map monotone except at
    # one wraparound, so all "permutations" share nearly the same argmin
    # and band recall collapses; caught by the brute-force-equality
    # invariant test on a random corpus.) a_i*h + b_i < 2^62 never
    # overflows a signed long (Spark 4 ANSI mode would throw).
    P31 = (1 << 31) - 1
    rng = np.random.default_rng(0xF09)
    a_consts = rng.integers(1, P31, size=num_hashes)
    b_consts = rng.integers(0, P31, size=num_hashes)

    # docs with fewer than shingle_n words have NO grams: their signature
    # would stay at the all-sentinel init value, colliding every such doc
    # in every band (O(m^2) candidates on a web corpus full of short docs).
    # drop_short filters INSIDE gram_sets on the word count — an sz > 0
    # filter here would push down as a re-inlined gram pipeline (see the
    # gram_sets docstring)
    #
    # Text-grain contraction (round-6 close, guide §2.3/§2.4 "decide with
    # small rows"): every quantity this operator computes — grams,
    # signature, band keys, pairwise Jaccard — is a function of the
    # NORMALIZED TEXT alone, so all work past the first scan runs once per
    # DISTINCT text (md5-grain text equality: the same standard
    # exact_dedup and its oracle already rest on), and verified
    # representative pairs expand back to doc pairs at the end — a cross
    # pair inherits its representative pair's exact jaccard, and
    # same-text pairs are exactly jaccard 1.0 (array_intersect of equal
    # arrays divides to 1.0). A dedup corpus is by definition full of
    # exact replicas, and at doc grain every replica group of size m
    # re-verified m^2/2 identical array pairs and collided in EVERY band
    # (measured at stress sf=1.0, bands=64: 17.8M pre-distinct band-join
    # rows and 607k array-shipping verification pairs for 52,500 docs of
    # 7,875 distinct texts; contracted: ~600k band-join rows, ~15k
    # verification pairs). Zero-duplicate worst case: one extra narrow
    # window exchange (~50 B/doc) and a rep-filter semi-join, nothing
    # amplified.
    norm = _norm_text(F.col(text_col))
    tk = (
        spread(docs)
        .select(
            F.col(id_col).alias("id"),
            F.md5(norm).alias("tkey"),
            F.split(norm, " ").alias("_w"),
        )
        .filter(F.size("_w") >= shingle_n)  # exactly gram_sets' drop_short row set
        .select("id", "tkey")
    )
    # (id, tkey, rid): rid = min doc id of the text group — a
    # deterministic, collision-free representative. Checkpointed once
    # (~50 B/doc, the simhash members pattern): consumed by the rep
    # filter, both expansion sides and the intra self-join.
    mem = tk.select(
        "id", "tkey", F.min("id").over(Window.partitionBy("tkey")).alias("rid")
    ).localCheckpoint(eager=True)
    rep_ids = mem.filter(F.col("id") == F.col("rid")).select("id")
    # grams of ONE representative per distinct text: joining the rep ids
    # BELOW gram_sets (distinct-text-sized side; AQE broadcasts it while
    # it fits) makes the gram transform run on representative rows only,
    # not the whole corpus, and the checkpoint (gram arrays of distinct
    # texts only) feeds the signature explode and both verification
    # joins without recompute
    rep_docs = spread(docs).join(rep_ids.withColumnRenamed("id", id_col), id_col)
    d = gram_sets(rep_docs, id_col, text_col, shingle_n, drop_short=True).localCheckpoint(
        eager=True
    )
    # Signature plan (round-6 rewrite, guide §4.1): the round-3 version
    # folded a 128-wide array over the gram array with aggregate+zip_with;
    # higher-order functions are CodegenFallback in Spark, so the ~128 x
    # n_grams universal-hash evaluations ran interpreted and dominated the
    # query (measured ~50 of 75 s at the driver's sf=1.0). Exploding the
    # grams and computing 128 plain min() aggregates keeps every
    # multiply-mod inside whole-stage-codegen hash aggregation. The
    # min-fold is identical: every (a_i*h+b_i) mod p < p, and sz > 0
    # guarantees at least one gram, so the p sentinel never survived
    # anyway. Partial (map-side) aggregation collapses the exchange to
    # ~1 row per doc (the gram rows of a doc are co-located by
    # construction), so signatures still cost no data-sized shuffle.
    g = d.select("id", "sz", F.explode("grams").alias("ngram"))
    base = F.pmod(F.xxhash64("ngram"), F.lit(P31))
    rows = g.select("id", "sz", base.alias("h"))
    sig_cols = [
        F.min((F.lit(int(a)) * F.col("h") + F.lit(int(b))) % F.lit(P31)).alias(f"s{i}")
        for i, (a, b) in enumerate(zip(a_consts, b_consts))
    ]
    sigs = rows.groupBy("id").agg(F.first("sz").alias("sz"), *sig_cols)
    band_keys = F.array(
        *[
            F.xxhash64(
                *[F.col(f"s{bi * rows_per_band + r}") for r in range(rows_per_band)]
            )
            for bi in range(bands)
        ]
    )
    buckets = sigs.select("id", "sz", F.posexplode(band_keys).alias("band", "key"))
    tcands = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id"))
            # PPJoin length filter (J >= t forces t*|A| <= |B| <= |A|/t):
            # exact — sz is text-determined, so the representative-level
            # decision holds verbatim for every expanded doc pair
            & (F.col("y.sz") >= F.lit(threshold) * F.col("x.sz"))
            & (F.col("x.sz") >= F.lit(threshold) * F.col("y.sz")),
        )
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    # exact Jaccard once per representative pair, then expand to doc
    # pairs: each unordered doc pair arises exactly once (text groups
    # partition the docs; rep pairs have a < b; intra pairs are ordered
    # by id), so no doc-grain distinct is needed
    tver = _verify_jaccard(tcands, d, threshold)
    ea = mem.select(F.col("rid").alias("a"), F.col("id").alias("ia"))
    eb = mem.select(F.col("rid").alias("b"), F.col("id").alias("ib"))
    cross = (
        tver.join(ea, "a")
        .join(eb, "b")
        .select(
            F.least("ia", "ib").alias("a"),
            F.greatest("ia", "ib").alias("b"),
            "jaccard",
        )
    )
    m1, m2 = mem.alias("m1"), mem.alias("m2")
    intra = m1.join(
        m2, (F.col("m1.rid") == F.col("m2.rid")) & (F.col("m1.id") < F.col("m2.id"))
    ).select(
        F.col("m1.id").alias("a"),
        F.col("m2.id").alias("b"),
        F.lit(1.0).alias("jaccard"),
    )
    if threshold > 1.0:
        # identical texts have jaccard exactly 1.0; a (degenerate)
        # threshold above it must exclude them like the verify filter did
        intra = intra.filter(F.lit(False))
    return cross.unionByName(intra)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with an evaluation/benchmark set (the standard
    13-gram/8-gram overlap rule used for LLM training corpora).

    Scale shape: the benchmark side is exploded to distinct n-grams and
    deduplicated; the join is a LEFT SEMI against that (typically small)
    relation, so Spark broadcasts it and the training corpus is touched
    exactly once with no shuffle of document text. Output: (doc_id,
    contaminated)."""
    doc_grams = gram_sets(docs, id_col, text_col, n).select(
        F.col("id"), F.explode("grams").alias("ngram")
    )
    bench_grams = (
        gram_sets(benchmark.select(F.lit(0).alias("_bid"), F.col(bench_text_col)), "_bid", bench_text_col, n)
        .select(F.explode("grams").alias("ngram"))
        .distinct()
    )
    hits = doc_grams.join(F.broadcast(bench_grams), "ngram", "left_semi").select("id").distinct()
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits.withColumnRenamed("id", "doc_id").withColumn("c", F.lit(True)), "doc_id", "left")
        .select("doc_id", F.coalesce("c", F.lit(False)).alias("contaminated"))
    )


def pack_documents(
    docs: DataFrame,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 32,
) -> DataFrame:
    """Sequence packing for training-batch prep: assign each document to
    a fixed-capacity bin of ~``max_tokens`` whitespace tokens.

    Pretraining packing concatenates documents head-to-tail and slices
    the stream into fixed-length sequences, letting documents straddle
    sequence boundaries — so the assignment is closed-form: a document's
    bin is the window its stream OFFSET falls in, computed by one
    running-sum. A single global stream would serialize the scan at
    scale, so documents hash into ``buckets`` independent streams
    (deterministic — md5 of the id, the cross-engine construction) and
    each stream packs by id order via one window pass. Output: (doc_id,
    bucket, offset, bin_id, n_tokens) — deterministic under any
    partitioning, one shuffle at 100 TB."""
    # token count over NORMALIZED whitespace (runs collapsed first) so the
    # SQL oracle's single-space split sees identical counts on text with
    # tabs/newlines/double spaces; empty/whitespace-only docs count 0
    # (a bare split would yield [''] = 1 phantom token)
    trimmed = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    n_tok = (
        F.when(F.length(trimmed) == 0, F.lit(0))
        .otherwise(F.size(F.split(trimmed, " ")))
        .cast("long")
    )
    bucket = md5_bucket(F.col(id_col), buckets)
    w = Window.partitionBy("bucket").orderBy(id_col)
    df = docs.select(
        F.col(id_col), bucket.alias("bucket"), n_tok.alias("n_tokens")
    ).withColumn(
        "offset",
        F.coalesce(
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ),
    )
    return df.select(
        id_col,
        "bucket",
        "offset",
        F.floor(F.col("offset") / max_tokens).cast("long").alias("bin_id"),
        "n_tokens",
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 40,
) -> DataFrame:
    """Near-duplicate pairs -> one canonical document per CLUSTER.

    A real training-data pipeline doesn't stop at pairs: transitive
    duplicates (A~B, B~C) must collapse to one kept document. Connected
    components (min-label propagation, kg/canonicalize.py — the same
    machinery that canonicalizes KG entities) assign every paired doc
    its cluster's minimum id; unpaired docs are their own canonical.
    Output: (doc_id, canonical_id, cluster_size) for EVERY input doc —
    filter canonical_id == doc_id for the keep-set.

    ``max_iter`` passes through to connected_components, which RAISES on
    non-convergence rather than silently splitting clusters — duplicate
    chains on web corpora can have diameter beyond the default, so the
    cap is a caller-visible knob (min-label propagation converges in
    O(diameter) rounds)."""
    from frog_spark.kg.canonicalize import connected_components

    comp = connected_components(pairs, src="a", dst="b", max_iter=max_iter)
    labeled = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn("canonical_id", F.coalesce("component", F.col("doc_id")))
        .select("doc_id", "canonical_id")
    )
    sizes = labeled.groupBy("canonical_id").agg(F.count("*").alias("cluster_size"))
    return labeled.join(sizes, "canonical_id").select(
        "doc_id", "canonical_id", "cluster_size"
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = (90, 5, 5),
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash.

    The bucket is derived from the md5 of the id's STRING form (the same
    cross-engine-reproducible construction simhash64 uses), so the split
    is stable across runs, engines, partitionings and cluster sizes —
    the property that matters when a 100-TB corpus is re-split
    incrementally. Output: (id, split)."""
    total = sum(weights)
    bucket = md5_bucket(F.col(id_col), total)
    split = (
        F.when(bucket < weights[0], "train")
        .when(bucket < weights[0] + weights[1], "val")
        .otherwise("test")
    )
    return df.select(F.col(id_col), split.alias("split"))


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    frac: float = 0.2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: from every stratum keep the
    ``ceil(frac * stratum_size)`` rows that rank first by md5 of the
    id's string form.

    Training-set curation needs per-language (or per-source /
    per-quality-bucket) quotas rather than a global Bernoulli sample;
    hashing the id instead of calling rand() makes the sample stable
    across runs, engines, partitionings and cluster sizes — the same
    cross-engine-reproducible construction split_assign uses. The plan
    is one window over the stratum (a single shuffle on strata_col;
    strata are languages/sources, so per-key volume is bounded by the
    corpus mix, and a skewed stratum can be salted upstream like any
    hot key). Output: (id, stratum, rank, stratum_size) for the kept
    rows."""
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    ranked = df.select(
        F.col(id_col),
        F.col(strata_col).alias("stratum"),
        F.row_number().over(w).alias("rank"),
        F.count("*").over(Window.partitionBy(strata_col)).alias("stratum_size"),
    )
    return ranked.filter(
        F.col("rank") <= F.ceil(F.lit(frac) * F.col("stratum_size"))
    )


def exact_substring_runs(
    docs: DataFrame,
    k: int = 2,
    min_run: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_occurrences: int | None = None,
) -> DataFrame:
    """Cross-document exact-substring detection (the ExactSubstr
    primitive of Lee et al. 2021 "Deduplicating Training Data Makes
    Language Models Better", at word-k-gram anchor granularity):
    maximal runs of CONSECUTIVE shared word-k-grams between two
    documents, i.e. verbatim shared word spans of length
    >= min_run + k - 1.

    Suffix arrays don't distribute; the relational form does:
      1. posexplode each document's k-grams -> (doc, pos, gram),
      2. equi-join grams across documents (doc_a < doc_b) -> anchors,
      3. merge anchors into runs with the classic diagonal trick: two
         anchors continue the same run iff both positions advance by
         one, so (a_pos - b_pos) is constant along a run (the diagonal)
         and (a_pos - row_number() within the diagonal) is constant
         exactly for consecutive anchors — a pure window computation,
         no iteration.
    The join in step 2 is quadratic in PER-GRAM frequency, not corpus
    size (measured: 500 docs -> 2.2 s, 5,000 docs of the same
    30-word vocabulary -> 54 s as anchors grow ~100x). At real scale
    ``max_gram_occurrences`` drops boilerplate grams before the join
    (a shuffle semi-join against the under-cap gram set — runs through
    a capped gram merely split, never fabricated); the gate query
    leaves it None so the DuckDB oracle recomputes the exact relation.

    Output: (doc_a, doc_b, a_start, b_start, len_words), 0-based word
    offsets, one row per maximal run.
    """
    from pyspark.sql import Window

    # bind the word array as an attribute first: inlined into the
    # transform lambda, the interpreted HOF re-runs the whole
    # normalize+split per gram element (see gram_sets)
    words = F.split(_norm_text(F.col(text_col)), " ")
    wdf = docs.select(F.col(id_col).alias("doc"), words.alias("_w")).filter(
        F.size("_w") >= k
    )
    gram_arr = F.transform(
        F.sequence(F.lit(0), F.size("_w") - k),
        lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i + 1, k)),
    )
    grams = wdf.select("doc", F.posexplode(gram_arr).alias("pos", "gram"))
    if max_gram_occurrences is not None:
        under_cap = (
            grams.groupBy("gram")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") <= max_gram_occurrences)
            .select("gram")
        )
        grams = grams.join(under_cap, "gram", "left_semi")
    a, b = grams.alias("a"), grams.alias("b")
    anchors = a.join(
        b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc") < F.col("b.doc"))
    ).select(
        F.col("a.doc").alias("doc_a"),
        F.col("b.doc").alias("doc_b"),
        F.col("a.pos").alias("a_pos"),
        F.col("b.pos").alias("b_pos"),
    )
    diag = (F.col("a_pos") - F.col("b_pos")).alias("diag")
    win = Window.partitionBy("doc_a", "doc_b", diag).orderBy("a_pos")
    runs = anchors.select(
        "doc_a", "doc_b", "a_pos", "b_pos",
        (F.col("a_pos") - F.row_number().over(win)).alias("run_id"),
        diag,
    )
    agg = runs.groupBy("doc_a", "doc_b", "diag", "run_id").agg(
        F.min("a_pos").alias("a_start"),
        F.min("b_pos").alias("b_start"),
        F.count("*").alias("n_grams"),
    )
    return agg.filter(F.col("n_grams") >= min_run).select(
        "doc_a", "doc_b", "a_start", "b_start",
        (F.col("n_grams") + k - 1).alias("len_words"),
    )


SIMHASH_BITS = 60  # 15 hex chars of md5 — cross-engine reproducible


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash over words: per-bit majority vote of word hashes.

    The word hash is the first 15 hex chars of md5 (a standard function
    both Spark and DuckDB implement identically), which makes the whole
    fingerprint — and therefore the Hamming-pair query — expressible as
    an ANSI-SQL oracle. Output: (doc_id, simhash).

    Plan shape (round-6 rewrite, guide §4.1): the round-3 version folded a
    60-wide CASE-WHEN array over the word array with
    aggregate+zip_with — higher-order functions are CodegenFallback in
    Spark, so every element evaluated interpreted (~12 s for 50k docs at
    the driver's sf=1.0). This version explodes the distinct words and
    computes 60 plain ``sum((h >> b) & 1)`` aggregates, which run in
    whole-stage-codegen hash aggregation. Identical fingerprints: the
    vote ``sum(bit ? 1 : -1) > 0`` equals ``2*ones > n_words`` exactly
    (integer arithmetic). One narrow exchange (~1 row per doc after
    partial aggregation) replaces the interpreted fold."""
    from functools import reduce

    words = F.array_distinct(F.split(_norm_text(F.col(text_col)), " "))
    # split("") yields [""], so every doc emits >= 1 word row and no
    # doc_id is lost by the explode
    h = F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
    exploded = docs.select(F.col(id_col), F.explode(words).alias("w")).select(
        F.col(id_col), h.alias("h")
    )
    agg = exploded.groupBy(id_col).agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"o{b}")
            for b in range(SIMHASH_BITS)
        ],
    )
    sim = reduce(
        lambda a, b: a.bitwiseOR(b),
        [
            F.when(
                F.col(f"o{b}") * 2 > F.col("n"),
                F.shiftleft(F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
            for b in range(SIMHASH_BITS)
        ],
    )
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    broadcast_max_docs: int = 20_000_000,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — EXACT over the
    fingerprints; only the fingerprint itself is the approximation.

    Plan shape (round-6 rewrite, guide §2.3/§2.4 "decide with small rows,
    move big rows once"): the round-3 version blocked DOC rows on 4
    15-bit chunks and pushed the whole candidate self-join through a
    distinct — on a low-entropy corpus fingerprints repeat and correlate,
    so that join produced ~306M rows at the driver's sf=1.0 (measured)
    for a ~29M-pair result. This version:

      1. contracts to DISTINCT fingerprint values first (the pair
         relation over values is all that blocking must decide);
      2. blocks values on 6 10-bit chunks joined on every C(6,3)=20
         3-chunk combination key — pigeonhole: hamming<=3 leaves >= 3 of
         6 chunks untouched, so a qualifying pair matches at least one
         30-bit combo key exactly (zero recall loss vs the 15-bit
         scheme, ~80x fewer join rows because a 30-bit agreement is far
         rarer than a 15-bit one);
      3. expands value pairs back to doc pairs with joins against the
         (id, simhash) relation — broadcast (map-side, no shuffle of the
         output-sized relation until the caller's sort) while the corpus
         is at most `broadcast_max_docs` rows; beyond that the members
         relation no longer fits an executor, so the expansions and the
         intra-group self-join fall back to plain equi-joins on the
         fingerprint value (shuffle 16 B/doc once — the correct shape at
         true 100-TB node counts). The gate reads `s.count()` on the
         already-materialized checkpoint: one cheap job, one long of
         driver state.

    Equal fingerprints (hamming 0) pair inside their group via a
    self-join on the value; distinct-value pairs cover the rest, so
    every qualifying doc pair is emitted exactly once."""
    if not (0 <= max_hamming < SIMHASH_BITS):
        raise ValueError(f"max_hamming must be in [0, {SIMHASH_BITS - 1}]")
    # five consumers read the fingerprint relation (distinct values, two
    # broadcast expansions, both sides of the intra-group self-join);
    # materialize it once — 16 bytes/doc, the same localCheckpoint
    # pattern link_prediction uses for its shared edge relation
    s = (
        simhash64(docs, id_col, text_col)
        .select(F.col(id_col).alias("id"), "simhash")
        .localCheckpoint(eager=True)
    )
    vals = s.select("simhash").distinct()

    if max_hamming <= 3:
        # 3-of-6 combination keys: 30 effective bits per key
        def chunk(col, i):
            return F.shiftright(col, i * 10).bitwiseAND(F.lit(0x3FF))

        combo_keys = [
            (chunk(F.col("simhash"), ci) * F.lit(1 << 20))
            + (chunk(F.col("simhash"), cj) * F.lit(1 << 10))
            + chunk(F.col("simhash"), ck)
            for ci in range(6)
            for cj in range(ci + 1, 6)
            for ck in range(cj + 1, 6)
        ]
    else:
        # generic pigeonhole: h errors leave >= 1 of h+1 chunks untouched
        c = max_hamming + 1
        bounds = [round(i * SIMHASH_BITS / c) for i in range(c + 1)]
        combo_keys = [
            F.shiftright(F.col("simhash"), lo).bitwiseAND(F.lit((1 << (hi - lo)) - 1))
            for lo, hi in zip(bounds, bounds[1:])
        ]

    keyed = vals.select(
        "simhash",
        F.posexplode(F.array(*combo_keys)).alias("combo", "key"),
    )
    vx, vy = keyed.alias("vx"), keyed.alias("vy")
    val_pairs = (
        vx.join(
            vy,
            (F.col("vx.combo") == F.col("vy.combo"))
            & (F.col("vx.key") == F.col("vy.key"))
            & (F.col("vx.simhash") < F.col("vy.simhash")),
        )
        .select(F.col("vx.simhash").alias("va"), F.col("vy.simhash").alias("vb"))
        .withColumn("hamming", F.bit_count(F.col("va").bitwiseXOR(F.col("vb"))))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    members = s.select(F.col("id"), F.col("simhash"))
    # size-gate the expansion broadcasts: s is eagerly checkpointed, so
    # this count scans the materialized 16 B/doc relation, not the corpus
    maybe_broadcast = F.broadcast if s.count() <= broadcast_max_docs else (lambda df: df)
    cross = (
        val_pairs.join(
            maybe_broadcast(
                members.select(F.col("id").alias("ia"), F.col("simhash").alias("va"))
            ),
            "va",
        )
        .join(
            maybe_broadcast(
                members.select(F.col("id").alias("ib"), F.col("simhash").alias("vb"))
            ),
            "vb",
        )
        .select(
            F.least("ia", "ib").alias("a"),
            F.greatest("ia", "ib").alias("b"),
            "hamming",
        )
    )
    mx, my = members.alias("mx"), members.alias("my")
    intra = mx.join(
        maybe_broadcast(my),
        (F.col("mx.simhash") == F.col("my.simhash")) & (F.col("mx.id") < F.col("my.id")),
    ).select(
        F.col("mx.id").alias("a"),
        F.col("my.id").alias("b"),
        F.lit(0).cast("int").alias("hamming"),
    )
    return cross.unionByName(intra)


def _estimate_rows(df: DataFrame, vec_col: str, default_dim: int = 64) -> int:
    """Approximate row count from Catalyst plan statistics — zero jobs.

    sizeInBytes for file sources is the on-disk size; an embedding row is
    ~4 bytes/float + key overhead, so n ≈ size / (4*dim). Only the LOG2 of
    the estimate is consumed (LSH bits per band), so being off by even 4x
    shifts the bucket size by two bits — recall is unaffected because
    verification is exact and multiple independent bands back each other
    up."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        row_count = stats.rowCount()
        if row_count.isDefined():
            return int(str(row_count.get()))
        dim = default_dim
        first_field = df.schema[vec_col]
        # arrays don't carry a length; assume default_dim unless metadata says
        dim = int(first_field.metadata.get("dim", default_dim)) if first_field.metadata else default_dim
        return max(2, int(stats.sizeInBytes()) // (4 * dim + 16))
    except Exception:
        # py4j surface changed (private queryExecution API) or a non-JVM
        # plan — degrade to one real count, VISIBLY: a silent full scan
        # here would look like auto-sizing working when it isn't. Pass
        # n_hint at scale to skip both paths.
        import warnings

        warnings.warn(
            "plan statistics unavailable; falling back to a full count() "
            "for LSH auto-sizing — pass n_hint to avoid the extra scan",
            RuntimeWarning,
            stacklevel=2,
        )
        return df.count()


def embedding_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bands: int = 4,
    bits_per_band: int | None = None,
    target_bucket_size: int = 128,
    n_hint: int | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs over an array<float> column.

    Blocking: random-hyperplane LSH (sign bits of seeded Gaussian
    projections, computed as one Arrow-batched numpy matmul per batch),
    BANDED like MinHash — ``bands`` independent signatures of
    ``bits_per_band`` bits each; candidates must agree on at least one
    whole band. Bits per band scale with input size
    (``log2(n / target_bucket_size)``), so the in-band bucket size — and
    therefore the quadratic in-bucket self-join — stays bounded at any n,
    while multiple bands keep recall high (a near-dup pair that flips one
    bit still collides on another band). Verification is a JVM-side
    zip_with dot product; only true cosine >= threshold pairs survive.

    Zero-norm vectors cannot have a defined cosine; they are excluded
    explicitly (not silently nulled out).

    Auto-sizing: pass ``bits_per_band`` or an approximate ``n_hint``
    (log2 granularity — a 2x error moves the bucket size by one bit).
    With neither, the row count is estimated from Catalyst's plan
    statistics (sizeInBytes / Arrow row width) — NO extra scan job; a
    driver-side count() here would be a full pass over the table per
    call at 100 TB.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    if bits_per_band is None:
        n = n_hint if n_hint is not None else _estimate_rows(emb, vec_col)
        bits_per_band = min(24, max(4, math.ceil(math.log2(max(n, 2) / target_bucket_size))))
    r, b = bits_per_band, bands

    def _band_keys(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rng_planes: dict[int, np.ndarray] = {}
        for vecs in batch_iter:
            if len(vecs) == 0:
                yield pd.Series([], dtype=object)
                continue
            mat = np.array(vecs.tolist(), dtype=np.float64)
            dim = mat.shape[1] if mat.ndim == 2 else 0
            if dim not in rng_planes:
                # deterministic: seed fixed, regenerated identically on
                # every executor — no state shipped
                rng_planes[dim] = np.random.default_rng(0xF06).standard_normal(
                    (dim, r * b)
                )
            bits = (mat @ rng_planes[dim]) >= 0  # (batch, r*b)
            weights = 1 << np.arange(r, dtype=np.int64)
            keys = np.stack(
                [bits[:, bi * r : (bi + 1) * r] @ weights for bi in range(b)], axis=1
            )
            yield pd.Series(list(keys))

    band_udf = pandas_udf(_band_keys, "array<long>")

    dot = lambda a, b_: F.aggregate(  # noqa: E731
        F.zip_with(a, b_, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    norm = F.sqrt(dot(F.col(vec_col), F.col(vec_col)))
    # the pandas-UDF band keys feed ONLY the bucket branch; the
    # verification sides recompute (v, nrm) with pure JVM expressions from
    # the scan — no shared hot relation, so nothing needs persisting (the
    # round-2 persist here was never unpersisted and leaked across calls)
    e = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        norm.alias("nrm"),
    ).filter(F.col("nrm") > 0)
    buckets = emb.select(
        F.col(id_col).alias("id"),
        norm.alias("nrm"),
        band_udf(F.col(vec_col).cast("array<double>")).alias("keys"),
    ).filter(F.col("nrm") > 0).select("id", F.posexplode("keys").alias("band", "key"))
    cands = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    ea = e.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    eb = e.select(F.col("id").alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return (
        cands.join(ea, "a")
        .join(eb, "b")
        .withColumn("cosine", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
