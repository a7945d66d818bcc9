"""X27-X30: PII scrubbing, token-budget quota fill, temperature
resampling, vocabulary construction (operators/curation.py).

Driver-gate parity lives in __spark_entry__ (each has a full DuckDB
oracle); these tests pin the semantics on hand-built corpora where the
expected numbers are checkable by eye, plus the plan-shape gates.
"""

import math

from pyspark.sql import functions as F


def _docs(spark, rows, cols="doc_id long, text string, lang string"):
    return spark.createDataFrame(rows, cols)


def test_pii_scrub_detects_and_redacts(spark):
    from frog_spark.operators.curation import pii_scrub

    rows = [
        (0, "schrijf naar jan.de.vries+test@mail.example.org vandaag", "nl"),
        (1, "bel +31 206 5551234 of kijk op 192.168.0.1 nu", "nl"),
        (2, "geen pii hier alleen tekst", "nl"),
        (3, "twee adressen a@b.nl en c.d@e-f.co", "nl"),
    ]
    got = {r["doc_id"]: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert got[0]["n_emails"] == 1 and got[0]["n_pii"] == 1
    assert "<EMAIL>" in got[0]["redacted"]
    assert "mail.example.org" not in got[0]["redacted"]
    assert got[1]["n_phones"] == 1 and got[1]["n_ips"] == 1
    assert got[1]["redacted"] == "bel <PHONE> of kijk op <IP> nu"
    assert got[2]["n_pii"] == 0 and got[2]["redacted"] == rows[2][1]
    assert got[3]["n_emails"] == 2
    # the email pass runs first: an address's digit/dot runs must never
    # be re-matched by the phone/IP passes
    assert got[3]["redacted"] == "twee adressen <EMAIL> en <EMAIL>"


def test_quota_fill_takes_hash_order_prefix(spark):
    from frog_spark.operators.curation import quota_fill

    # 10 docs of 4 tokens each per source, budget 10 -> exactly 2 kept
    # (cum 4, 8; the third would hit 12 > 10)
    rows = [
        (i, "een twee drie vier", f"src{i % 2}") for i in range(20)
    ]
    d = _docs(spark, rows, "doc_id long, text string, source string")
    got = quota_fill(d, budget_tokens=10, strata_col="source").collect()
    per = {}
    for r in got:
        per.setdefault(r["source"], []).append(r)
    assert set(per) == {"src0", "src1"}
    for src, kept in per.items():
        assert len(kept) == 2, (src, kept)
        assert sorted(r["cum_tokens"] for r in kept) == [4, 8]
    # deterministic under repartitioning: same ids kept
    ids = {r["doc_id"] for r in got}
    ids_rep = {
        r["doc_id"]
        for r in quota_fill(
            d.repartition(7), budget_tokens=10, strata_col="source"
        ).collect()
    }
    assert ids == ids_rep
    # inclusive boundary: budget exactly on a doc edge keeps that doc
    got12 = quota_fill(d, budget_tokens=12, strata_col="source").collect()
    assert sorted(r["cum_tokens"] for r in got12 if r["source"] == "src0") == [4, 8, 12]


def test_temperature_mix_boosts_low_resource_group(spark):
    from frog_spark.operators.curation import temperature_mix

    # en: 4 docs x 4 tokens = 16; nl: 1 doc x 4 tokens = 4 -> shares .8/.2
    rows = [(i, "w x y z", "en") for i in range(4)] + [(4, "a b c d", "nl")]
    got = {r["group"]: r for r in temperature_mix(_docs(spark, rows), alpha=0.5).collect()}
    assert got["en"]["n_tokens"] == 16 and got["nl"]["n_tokens"] == 4
    s8, s2 = math.sqrt(0.8), math.sqrt(0.2)
    assert got["en"]["weight"] == round(s8 / (s8 + s2), 6)
    assert got["nl"]["weight"] == round(s2 / (s8 + s2), 6)
    # alpha < 1 up-samples the small group, down-samples the big one
    assert got["nl"]["mix_factor"] > 1 > got["en"]["mix_factor"]
    # alpha = 1 is natural sampling: every factor 1.0
    nat = temperature_mix(_docs(spark, rows), alpha=1.0).collect()
    assert all(r["mix_factor"] == 1.0 for r in nat)


def test_vocab_topk_ids_and_coverage(spark):
    from frog_spark.operators.curation import vocab_topk

    rows = [(0, "b b b a a c", "en"), (1, "a c c b", "en")]
    got = vocab_topk(_docs(spark, rows), k=2).collect()
    # counts: a=3, b=4, c=3 -> top-2 is b(4), then a(3) beating c(3) on
    # the lexical tie-break
    assert [(r["vocab_id"], r["word"], r["n"]) for r in got] == [
        (1, "b", 4),
        (2, "a", 3),
    ]
    assert got[0]["freq_share"] == 0.4
    assert got[1]["cum_share"] == 0.7
    # k >= n_types covers the whole corpus
    full = vocab_topk(_docs(spark, rows), k=100).collect()
    assert len(full) == 3 and full[-1]["cum_share"] == 1.0


def test_curation_plans_stay_jvm_side(spark):
    """X27-X30 plan-shape gates (mirrors the BASELINE.md audit rows):
    pure-JVM plans, pii/vocab ReadSchema pruned to the used columns,
    vocab's global order a TakeOrdered over per-word counts."""
    import contextlib
    import io

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    qs = entry.queries()

    def plan(name):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf).explain("formatted")
        return buf.getvalue()

    for name in ("txt_pii_scrub", "doc_quota_mix",
                 "doc_temperature_mix", "txt_vocab_topk"):
        p = plan(name)
        assert "BatchEvalPython" not in p and "MapInPandas" not in p, name
        assert "ArrowEvalPython" not in p, name

    p = plan("txt_pii_scrub")
    schema_line = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "doc_id" in schema_line and "text" in schema_line
    assert "lang" not in schema_line and "source" not in schema_line

    p = plan("txt_vocab_topk")
    assert "TakeOrderedAndProject" in p
    schema_line = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "lang" not in schema_line and "doc_id" not in schema_line

    # single-pass at runtime: AQE must collapse the coverage
    # denominator's branch onto a ReusedExchange of the word-count
    # shuffle — one FileScan, one words shuffle, however big the corpus
    df = qs["txt_vocab_topk"](spark, sf)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("+- == Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "ReusedExchange" in final

    # temperature_mix: ONE corpus scan — the total/normalizer windows
    # run on the tiny per-group relation, never a re-read
    p = plan("doc_temperature_mix")
    tree = p.split("(1) Scan parquet")[0]
    assert tree.count("Scan parquet") == 1, tree


def test_url_host_filter_counts_occurrences(spark):
    """X34: hosts count per OCCURRENCE (a doc linking a blocked host
    twice reports n_blocked=2), keep is n_blocked == 0, and docs with
    no URLs keep with n_urls=0."""
    from frog_spark.operators.curation import url_host_filter

    rows = [
        (0, "zie https://spam.example/a en http://spam.example/b", "nl"),
        (1, "alleen https://goed.example/x hier", "nl"),
        (2, "geen urls in dit document", "nl"),
        (3, "mix http://goed.example/y plus https://spam.example/z", "nl"),
    ]
    got = {
        r["doc_id"]: r
        for r in url_host_filter(_docs(spark, rows), ["spam.example"]).collect()
    }
    assert (got[0]["n_urls"], got[0]["n_blocked"], got[0]["keep"]) == (2, 2, False)
    assert (got[1]["n_urls"], got[1]["n_blocked"], got[1]["keep"]) == (1, 0, True)
    assert (got[2]["n_urls"], got[2]["n_blocked"], got[2]["keep"]) == (0, 0, True)
    assert (got[3]["n_urls"], got[3]["n_blocked"], got[3]["keep"]) == (2, 1, False)


def test_length_percentiles_discrete_definition(spark):
    """X35: percentile p is the value at 1-indexed rank ceil(p*n) in
    (n_tokens, doc_id) order — checkable by hand on 10 docs of
    1..10 tokens: p50 -> rank 5 -> 5 tokens, p90 -> rank 9,
    p99 -> rank ceil(9.9)=10."""
    from frog_spark.operators.curation import length_percentiles

    rows = [(i, " ".join(["w"] * (i + 1)), "nl") for i in range(10)]
    rows += [(100, "a b", "en"), (101, "a", "en"), (102, "a b c", "en")]
    got = {r["lang"]: r for r in length_percentiles(_docs(spark, rows)).collect()}
    nl = got["nl"]
    assert (nl["n_docs"], nl["min_tokens"], nl["max_tokens"]) == (10, 1, 10)
    assert (nl["p50_tokens"], nl["p90_tokens"], nl["p99_tokens"]) == (5, 9, 10)
    assert nl["mean_tokens"] == 5.5
    en = got["en"]
    assert (en["n_docs"], en["p50_tokens"], en["p99_tokens"]) == (3, 2, 3)


def test_x34_x35_plans_stay_jvm_side(spark):
    """X34/X35 scale gates: pure-JVM plans; the URL filter is
    shuffle-free scan-stage work; the length profile does exactly one
    exchange (the rank window and group agg share the lang
    partitioning)."""
    import contextlib
    import io

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    qs = entry.queries()

    def plan(name):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf).explain("formatted")
        return buf.getvalue()

    for name in ("txt_url_filter", "doc_length_profile"):
        p = plan(name)
        assert "BatchEvalPython" not in p and "MapInPandas" not in p, name
        assert "ArrowEvalPython" not in p, name

    # url filter: the only exchange is the gate-only final orderBy's
    # rangepartitioning — the filter itself is shuffle-free scan work
    p = plan("txt_url_filter")
    assert "hashpartitioning" not in p, p
    assert p.count("rangepartitioning") == 1, p

    # length profile: exactly one data shuffle (hashpartitioning on
    # lang) feeding both the rank window and the aggregate
    p = plan("doc_length_profile")
    assert p.count("hashpartitioning") == 1, p


def test_chunk_documents_windows_and_overlap(spark):
    from frog_spark.operators.curation import chunk_documents

    words = [f"w{i}" for i in range(10)]
    rows = [
        (0, " ".join(words)),       # 10 words, window 4 stride 3 -> 3 chunks
        (1, "short text"),           # shorter than a window -> 1 chunk
        (2, "   "),                  # whitespace-only -> no chunks
        (3, " ".join(f"x{i}" for i in range(7))),  # n-window divisible by stride
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_documents(docs, window=4, stride=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_words"], r["chunk_text"])
        )
    # ceil((10-4)/3)=2 -> chunks at 0,3,6; the last is full (words 6..9)
    assert got[0] == [
        (0, 4, "w0 w1 w2 w3"), (1, 4, "w3 w4 w5 w6"), (2, 4, "w6 w7 w8 w9"),
    ]
    assert got[1] == [(0, 2, "short text")]
    assert 2 not in got
    # n=7: (7-4)/3 = 1 exactly -> last chunk ends exactly at the text end
    assert got[3] == [(0, 4, "x0 x1 x2 x3"), (1, 4, "x3 x4 x5 x6")]
    # every word of doc 0 is covered by at least one chunk
    covered = {w for _, _, t in got[0] for w in t.split()}
    assert covered == set(words)


def test_chunk_documents_rejects_bad_params(spark):
    import pytest as _pytest

    from frog_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, window=0)
    with _pytest.raises(ValueError):
        chunk_documents(docs, stride=0)
