"""X21-X23: Gopher repetition filter, BM25 top-k, stratified sampling.

Driver-gate parity for these lives in __spark_entry__ (each has a full
DuckDB oracle); these tests pin the semantics on hand-built corpora
where the expected numbers are checkable by eye.
"""

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )


def test_gopher_repetition_flags_repeats(spark):
    from frog_spark.operators.textstats import gopher_repetition

    rows = [
        ("the cat sat on the mat", "en"),           # 5 bigrams, all distinct
        ("spam spam spam spam spam spam", "en"),     # one bigram repeated 5x
        ("word", "en"),                              # < 2 tokens
        ("a b a b a b a b a b", "en"),               # 'a b' x5 + 'b a' x4
    ]
    got = {
        r["doc_id"]: r
        for r in gopher_repetition(_docs(spark, rows)).collect()
    }
    assert got[0]["n_bigrams"] == 5
    assert got[0]["dup_bigram_frac"] == 0.0
    assert got[0]["keep"] is True
    # doc 1: 5 bigrams, 1 distinct -> dup 0.8, top 1.0 -> dropped
    assert got[1]["n_bigrams"] == 5
    assert got[1]["dup_bigram_frac"] == 0.8
    assert got[1]["top_bigram_frac"] == 1.0
    assert got[1]["keep"] is False
    # degenerate short doc: nothing can repeat
    assert got[2]["n_bigrams"] == 0
    assert got[2]["dup_bigram_frac"] == 0.0 and got[2]["keep"] is True
    # doc 3: 9 bigrams, 2 distinct, top 'a b' = 5/9
    assert got[3]["n_bigrams"] == 9
    assert got[3]["top_bigram_frac"] == round(5 / 9, 6)
    assert got[3]["keep"] is False


def test_bm25_ranks_rarer_term_higher(spark):
    from frog_spark.operators.retrieval import bm25_topk

    rows = [
        ("common common common filler filler", "en"),
        ("common filler filler filler filler", "en"),
        ("rare filler filler filler filler", "en"),
        ("filler filler filler filler filler", "en"),
    ]
    got = bm25_topk(_docs(spark, rows), ["common", "rare"], k=4).collect()
    # the rare-term doc outranks every common-term doc (idf dominates)
    assert got[0]["doc_id"] == 2
    assert got[0]["n_terms_hit"] == 1
    # doc 0 (tf=3) outranks doc 1 (tf=1) for the same term
    ranks = [r["doc_id"] for r in got]
    assert ranks.index(0) < ranks.index(1)
    # no hit for doc 3
    assert 3 not in ranks
    # BM25 formula spot check for doc 2: N=4, df=1, tf=1, dl=5, avgdl=5
    idf = math.log(1 + (4 - 1 + 0.5) / (1 + 0.5))
    expect = idf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 1.0))
    assert abs(got[0]["score"] - round(expect, 6)) < 1e-9


def test_stratified_sample_quotas_and_determinism(spark):
    from frog_spark.operators.dedup import stratified_sample

    rows = [(f"text {i}", "nl" if i % 3 == 0 else "en") for i in range(60)]
    d = _docs(spark, rows)
    got = stratified_sample(d, strata_col="lang", frac=0.2).collect()
    by_stratum = {}
    for r in got:
        by_stratum.setdefault(r["stratum"], []).append(r)
    n_nl = sum(1 for i in range(60) if i % 3 == 0)
    n_en = 60 - n_nl
    assert len(by_stratum["nl"]) == math.ceil(0.2 * n_nl)
    assert len(by_stratum["en"]) == math.ceil(0.2 * n_en)
    assert all(r["stratum_size"] == n_nl for r in by_stratum["nl"])
    # deterministic under repartitioning (the 100-TB property)
    again = stratified_sample(d.repartition(7), strata_col="lang", frac=0.2).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)
    # a larger fraction keeps a superset (hash-order prefix property)
    bigger = stratified_sample(d, strata_col="lang", frac=0.5).collect()
    assert {r["doc_id"] for r in got} <= {r["doc_id"] for r in bigger}


def test_exact_substring_runs_diagonal_merge(spark):
    from frog_spark.operators.dedup import exact_substring_runs

    rows = [
        ("alpha beta gamma delta epsilon zeta", "en"),
        ("x y alpha beta gamma delta epsilon q", "en"),  # 5-word shared span
        ("unrelated words entirely here", "en"),
        ("alpha beta q q q alpha beta", "en"),           # only 2-word overlaps
    ]
    got = exact_substring_runs(_docs(spark, rows), k=2, min_run=3).collect()
    # exactly one maximal run: docs 0/1 share 'alpha beta gamma delta
    # epsilon' (4 consecutive bigrams -> len_words 5), starting at word
    # 0 in doc 0 and word 2 in doc 1
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert (r["a_start"], r["b_start"], r["len_words"]) == (0, 2, 5)
    # lowering min_run surfaces the 2-word overlaps with doc 3 too
    more = exact_substring_runs(_docs(spark, rows), k=2, min_run=1).collect()
    assert len(more) > 1
    assert all(m["len_words"] >= 2 for m in more)


def test_unigram_surprisal_orders_rarity(spark):
    from frog_spark.operators.textstats import unigram_surprisal

    rows = [
        ("common common common common", "en"),
        ("common common rare1 rare2", "en"),
    ]
    got = {r["doc_id"]: r for r in unigram_surprisal(_docs(spark, rows)).collect()}
    # doc 1 contains the two hapaxes -> strictly higher mean surprisal
    assert got[1]["avg_surprisal"] > got[0]["avg_surprisal"]
    assert got[0]["n_tokens"] == 4
    # exact value: p(common) = 6/8 -> surprisal = -log2(0.75)
    import math
    assert abs(got[0]["avg_surprisal"] - round(-math.log2(6 / 8), 6)) < 1e-9


def test_corpus_divergence_flags_shifted_slice(spark):
    from frog_spark.operators.textstats import corpus_divergence

    rows = [
        ("alpha beta gamma delta", "en"),
        ("alpha beta gamma delta", "en"),
        ("alpha beta gamma delta", "en"),
        ("omega omega omega omega", "xx"),  # fully disjoint vocabulary
    ]
    got = {r["group"]: r for r in corpus_divergence(_docs(spark, rows)).collect()}
    # a disjoint slice diverges more than the majority slice
    assert got["xx"]["kl_bits"] > got["en"]["kl_bits"] > 0
    # exact: p_xx(omega)=1, p_c(omega)=4/16 -> KL = log2(4) = 2 bits
    assert got["xx"]["kl_bits"] == 2.0
    assert got["xx"]["n_tokens"] == 4 and got["xx"]["n_types"] == 1
    # a slice identical to the corpus diverges by 0
    uniform = corpus_divergence(_docs(spark, rows[:2])).collect()
    assert all(r["kl_bits"] == 0.0 for r in uniform)


def test_exact_substring_cap_bounds_the_join(spark):
    from frog_spark.operators.dedup import exact_substring_runs

    # 'stop stop' is boilerplate (appears in every doc); the real shared
    # span 'alpha beta gamma delta' appears twice
    rows = [
        ("stop stop alpha beta gamma delta", "en"),
        ("stop stop alpha beta gamma delta", "en"),
        ("stop stop other words here now", "en"),
        ("stop stop more unrelated words q", "en"),
    ]
    capped = exact_substring_runs(
        _docs(spark, rows), k=2, min_run=3, max_gram_occurrences=3
    ).collect()
    # the 4x 'stop stop' gram is dropped; the straddling 'stop alpha'
    # bigram (x2, under cap) survives, so the maximal run between docs
    # 0 and 1 is the 5-word 'stop alpha beta gamma delta'
    assert len(capped) == 1
    assert (capped[0]["doc_a"], capped[0]["doc_b"]) == (0, 1)
    assert capped[0]["len_words"] == 5
    # uncapped, the full 6-word verbatim run (including the boilerplate
    # prefix) is found instead — the cap splits runs, never fabricates
    full = exact_substring_runs(_docs(spark, rows), k=2, min_run=3).collect()
    pair01 = [r for r in full if (r["doc_a"], r["doc_b"]) == (0, 1)]
    assert len(pair01) == 1 and pair01[0]["len_words"] == 6
