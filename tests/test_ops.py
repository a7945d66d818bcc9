"""Training-data operators + sinks/sources/streaming tests."""

import datetime

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 44),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat", "en", "s", 44),  # near dup
        (3, "de kat en de hond lopen naar de stad en het park", "nl", "s", 49),
        (4, "volledig andere inhoud zonder enige overlap hier", "nl", "s", 49),
        (5, "", "en", "s", 0),
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).cache()


def test_exact_dedup(docs):
    from frog_spark.operators.dedup import exact_dedup

    out = {r["doc_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert out[0] == 2 and 1 not in out
    assert out[2] == 1


def test_ngram_jaccard_pairs(docs):
    from frog_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs  # identical
    assert (0, 2) in pairs  # near dup
    assert (3, 4) not in pairs


def test_minhash_pairs(docs):
    from frog_spark.operators.dedup import minhash_dedup_pairs

    pairs = {(r["a"], r["b"]) for r in minhash_dedup_pairs(docs, threshold=0.7).collect()}
    assert (0, 1) in pairs
    assert (0, 4) not in pairs


def test_simhash(docs):
    from frog_spark.operators.dedup import simhash64, simhash_dup_pairs

    h = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert h[0] == h[1]  # identical text -> identical fingerprint
    pairs = {(r["a"], r["b"]) for r in simhash_dup_pairs(docs, max_hamming=8).collect()}
    assert (0, 1) in pairs


def test_embedding_dup_and_topk(spark):
    from frog_spark.operators.dedup import embedding_dup_pairs
    from frog_spark.operators.similarity import cosine_topk

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0]),  # near dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r["a"], r["b"]) for r in embedding_dup_pairs(emb, threshold=0.99).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs
    tk = cosine_topk(emb, [1.0, 0.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in tk] == [0, 1]


def test_ivf_matches_bruteforce_top1(spark):
    from frog_spark.operators.similarity import (
        assign_buckets,
        cosine_topk,
        ivf_topk,
        train_centroids,
    )

    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(100)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    cents = train_centroids(emb, n_centroids=4)
    bucketed = assign_buckets(emb, cents).cache()
    q = rows[17][1]
    exact = cosine_topk(emb, q, k=1).collect()[0]["vec_id"]
    approx = [r["vec_id"] for r in ivf_topk(bucketed, cents, q, k=5, n_probe=2).collect()]
    assert exact == 17 and 17 in approx


def test_textstats(docs):
    from frog_spark.operators.textstats import quality_features

    q = {r["doc_id"]: r for r in quality_features(docs).collect()}
    assert q[0]["lang_pred"] == "en"
    assert q[3]["lang_pred"] == "nl"
    assert q[0]["n_tokens"] == 9
    assert q[0]["quality_score"] >= 0.75
    assert q[5]["quality_score"] <= 0.5


def test_multimodal_meta(spark):
    from frog_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_meta,
        make_fake_payload,
        sample_frames,
    )

    rows = [
        (0, "image", make_fake_payload("image", 640, 480), None),
        (1, "video", make_fake_payload("video", 320, 240, 25), None),
        (2, "audio", b"\x00garbage", None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    meta = {r["media_id"]: r for r in extract_media_meta(media).collect()}
    assert meta[0]["width"] == 640 and meta[0]["height"] == 480
    assert meta[1]["frames"] == 25
    assert meta[2]["width"] is None  # undecodable -> null, no crash
    frames = sample_frames(media, every_n=10).collect()
    assert {r["frame_idx"] for r in frames} == {0, 10, 20}


def test_tabbed_output_matches_reference_shape(spark, pipeline):
    from frog_spark.corpus import transcripts_df
    from frog_spark.plans.pipeline import annotate_transcripts
    from frog_spark.sources.sinks import tabbed_output

    tdf = transcripts_df(spark, n_turns=6)
    ann = annotate_transcripts(spark, tdf, pipeline)
    lines = tabbed_output(ann).collect()
    assert lines
    first = lines[0]["line"].split("\t")
    # index word lemma morph pos conf(6dp) ner iob head role
    assert len(first) == 10
    assert first[0] == "1"
    conf = first[5]
    assert "." in conf and len(conf.split(".")[1]) == 6


def test_mwu_merged_row_in_tabbed(spark, pipeline):
    from frog_spark.corpus import TRANSCRIPT_SCHEMA
    from frog_spark.plans.pipeline import annotate_transcripts
    from frog_spark.sources.sinks import tabbed_output

    tdf = spark.createDataFrame(
        [("c", 0, "user", "de Algemene Rekenkamer controleert de uitgaven.",
          None, datetime.datetime(2025, 1, 1))],
        schema=TRANSCRIPT_SCHEMA,
    )
    ann = annotate_transcripts(spark, tdf, pipeline)
    lines = [r["line"] for r in tabbed_output(ann).collect()]
    assert any(line.split("\t")[1] == "Algemene_Rekenkamer" for line in lines)
    # 7 tokens but 6 units after the merge
    assert len(lines) == 6


def test_streaming_annotation(spark, pipeline, tmp_path):
    from frog_spark.corpus import transcripts_df
    from frog_spark.streaming.server import annotate_stream, file_stream_source

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    tdf = transcripts_df(spark, n_turns=12)
    tdf.write.parquet(src)
    q = annotate_stream(spark, file_stream_source(spark, src), out, chk, pipeline)
    q.awaitTermination(120)
    result = spark.read.parquet(out)
    assert result.count() > 0
    assert "pos_tag" in result.columns


def test_text_source_and_retry(spark, tmp_path):
    from frog_spark.sources.textscan import (
        mark_done,
        pending_files,
        read_text_as_transcripts,
    )

    d = tmp_path / "texts"
    d.mkdir()
    (d / "a.txt").write_text("Dit is een test.\nDe kat loopt.\n")
    (d / "b.txt").write_text("Anna leest een boek.\n")
    df = read_text_as_transcripts(spark, str(d))
    assert df.count() == 3
    assert df.filter("conv_id = 'a.txt'").count() == 2
    outd = tmp_path / "out"
    assert len(pending_files(str(d), str(outd))) == 2
    mark_done(str(outd), str(d / "a.txt"))
    assert [p.endswith("b.txt") for p in pending_files(str(d), str(outd))] == [True]


def test_stateful_streaming_entity_memory(spark, tmp_path):
    """applyInPandasWithState: per-conversation entity counts accumulate
    across micro-batches and survive via the state store."""
    from frog_spark.corpus import transcripts_df
    from frog_spark.sources.resources import load_gazetteer
    from frog_spark.streaming.server import file_stream_source
    from frog_spark.streaming.state import conversation_entity_state

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    transcripts_df(spark, n_turns=48).write.parquet(src)
    names = {n for ns in load_gazetteer().values() for n in ns}
    stream = conversation_entity_state(file_stream_source(spark, src), names)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    res = spark.read.parquet(out)
    assert res.count() > 0
    # the final row per conversation carries the cumulative turn count
    import pyspark.sql.functions as F

    final = res.groupBy("conv_id").agg(F.max("n_turns").alias("n"))
    totals = {r["conv_id"]: r["n"] for r in final.collect()}
    src_counts = {
        r["conv_id"]: r["cnt"]
        for r in spark.read.parquet(src)
        .groupBy("conv_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert totals == src_counts
    assert res.filter("n_entity_mentions > 0").count() > 0


def test_gazetteer_spans_relational(spark):
    """N1/N2 relationalized: broadcast-join gazetteer matching keeps only
    the longest match per (doc, position)."""
    from frog_spark.operators.ner import gazetteer_spans_relational

    docs = spark.createDataFrame(
        [(1, "fast table scan beats slow scan"), (2, "the TABLE  Scan")],
        "doc_id int, text string",
    )
    entries = [("op", "table scan"), ("obj", "table"), ("obj", "scan")]
    rows = {
        (r["doc_id"], r["pos"], r["span_text"], r["cat"], r["n"])
        for r in gazetteer_spans_relational(docs, entries).collect()
    }
    assert (1, 1, "table scan", "op", 2) in rows      # longest wins at pos 1
    assert (1, 1, "table", "obj", 1) not in rows      # shadowed 1-gram
    assert (1, 2, "scan", "obj", 1) in rows           # inner word still marks
    assert (1, 5, "scan", "obj", 1) in rows
    assert (2, 1, "table scan", "op", 2) in rows      # case/space normalized


def test_cli_entrypoint(spark, tmp_path):
    """S4: the python -m frog_spark surface — annotate + triples commands
    round-trip through parquet (the run_interactive/API analogue,
    /root/reference/src/FrogAPI.cxx:1799-1938)."""
    import json
    import os
    import subprocess
    import sys

    from frog_spark.corpus import transcripts_df

    src = str(tmp_path / "in")
    transcripts_df(spark, n_turns=12).write.parquet(src)
    out = str(tmp_path / "out")
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    r = subprocess.run(
        [sys.executable, "-m", "frog_spark", "triples",
         "--input", src, "--output", out, "--partitions", "2"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert payload["triples"] == spark.read.parquet(out).count()


def test_clean_text(spark):
    from frog_spark.operators.textstats import clean_text

    df = spark.createDataFrame(
        [(1, "see https://x.org/a?b=1 and mail me@example.com\x07 now   ok"),
         (2, "  plain  text  ")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: (r["clean"], r["n_removed_chars"]) for r in clean_text(df).collect()}
    assert out[1][0] == "see and mail now ok"
    assert out[2] == ("plain text", 5)


def test_distributed_kmeans_ivf(spark):
    """Distributed Lloyd's: the update step collects only C x dim
    coordinates; probing the trained buckets finds the exact query vector
    first."""
    from frog_spark.operators.similarity import (
        assign_buckets,
        ivf_topk,
        train_centroids_distributed,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    cents = train_centroids_distributed(emb, n_centroids=4, iters=2)
    assert len(cents) == 4 and all(len(c) == len(cents[0]) for c in cents)
    query = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    bucketed = assign_buckets(emb, cents)
    top = ivf_topk(bucketed, cents, query, k=5, n_probe=2).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-9


def test_ivf_recall_vs_exact_oracle(spark):
    """sim_ivf_topk recall oracle (VERDICT r2 #9): with the trained
    centroids and probe count of the driver-gate query, IVF top-10 is
    compared against the EXACT brute-force cosine top-10 (the
    cosine_topk oracle). Recall@10 >= 0.8 at n_probe=3/8 — the
    approximation is bounded, not merely 'rows-only'."""
    from frog_spark.operators.similarity import (
        assign_buckets,
        cosine_topk,
        ivf_topk,
        train_centroids_distributed,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    query = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    exact = {r["vec_id"] for r in cosine_topk(emb, query, k=10).collect()}
    cents = train_centroids_distributed(emb, n_centroids=8)
    approx = {
        r["vec_id"]
        for r in ivf_topk(assign_buckets(emb, cents), cents, query, k=10, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, (recall, sorted(exact), sorted(approx))


def test_folia_roundtrip(spark, pipeline):
    """S8/S2: annotated tokens -> FoLiA XML documents -> parsed back;
    word/pos/lemma/morph survive the round trip (the reference's
    text-in == folia-in invariance, FrogAPI.cxx:2984-3171)."""
    from frog_spark.corpus import transcripts_df
    from frog_spark.plans.pipeline import annotate_transcripts
    from frog_spark.sources.folia import folia_xml, parse_folia

    tdf = transcripts_df(spark, n_turns=12)
    ann = annotate_transcripts(spark, tdf, pipeline)
    docs = folia_xml(ann)
    assert docs.count() == 12
    sample = docs.first()["folia"]
    assert sample.startswith('<?xml version="1.0"')
    assert "<FoLiA" in sample and "</FoLiA>" in sample
    back = parse_folia(docs)
    key = ["conv_id", "turn_idx", "sent_idx", "token_idx"]
    orig = {
        tuple(r[k] for k in key): (r["word"], r["pos_tag"], r["lemma"], r["morph"])
        for r in ann.select(*key, "word", "pos_tag", "lemma", "morph").collect()
    }
    got = {
        tuple(r[k] for k in key): (r["word"], r["pos_tag"], r["lemma"], r["morph"])
        for r in back.collect()
    }
    assert got == orig

    # full layer set (S8): entities, chunking, dependencies survive too
    from frog_spark.kg.triples import entity_spans
    from frog_spark.sources.folia import parse_folia_spans

    spans = parse_folia_spans(docs).collect()
    got_ents = {
        (r["conv_id"], r["turn_idx"], r["sent_idx"], r["cls"], r["span_start"], r["span_end"])
        for r in spans if r["layer"] == "entity"
    }
    want_ents = {
        (r["conv_id"], r["turn_idx"], r["sent_idx"], r["ner_cat"], r["start"], r["end"])
        for r in entity_spans(ann).collect()
    }
    assert got_ents == want_ents and len(want_ents) > 0

    got_chunks = {k for k in spans if k["layer"] == "chunk"}
    assert len(got_chunks) > 0
    # chunk spans reconstruct the BIO runs of the original tags
    bio = {}
    for r in ann.select("conv_id", "turn_idx", "sent_idx", "token_idx", "chunk_tag").collect():
        bio[(r["conv_id"], r["turn_idx"], r["sent_idx"], r["token_idx"])] = r["chunk_tag"]
    for r in got_chunks:
        first = bio[(r["conv_id"], r["turn_idx"], r["sent_idx"], r["span_start"])]
        assert first.endswith(r["cls"])

    # dependencies: every unit's (head_first_token, role) survives
    unit_first = {}
    for r in ann.select("conv_id", "turn_idx", "sent_idx", "token_idx", "unit_idx",
                        "parse_head", "parse_role").collect():
        k = (r["conv_id"], r["turn_idx"], r["sent_idx"], r["unit_idx"])
        if k not in unit_first or r["token_idx"] < unit_first[k][0]:
            unit_first[k] = (r["token_idx"], r["parse_head"], r["parse_role"])
    want_deps = set()
    by_sent_first = {}
    for (c, t, si, u), (tok0, head, role) in unit_first.items():
        by_sent_first[(c, t, si, u)] = tok0
    for (c, t, si, u), (tok0, head, role) in unit_first.items():
        if head >= 0 and role:
            head_tok = by_sent_first.get((c, t, si, head)) if head > 0 else None
            want_deps.add((c, t, si, role, tok0, head_tok))
    got_deps = {
        (r["conv_id"], r["turn_idx"], r["sent_idx"], r["cls"], r["span_start"], r["head_start"])
        for r in spans if r["layer"] == "dependency"
    }
    assert got_deps == want_deps and len(want_deps) > 0


def test_streaming_windowed_turn_counts(spark, tmp_path):
    """S3: watermarked tumbling-window aggregation over a turn stream;
    the streaming result equals the batch result of the same function."""
    import datetime

    from frog_spark.streaming.server import file_stream_source, windowed_turn_counts

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("c1", i, "user", f"turn {i}", None, base + datetime.timedelta(minutes=17 * i))
        for i in range(12)
    ]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    src = str(tmp_path / "turns")
    batch_df = spark.createDataFrame(rows, schema)
    batch_df.write.parquet(src)
    out = str(tmp_path / "agg")
    q = (
        windowed_turn_counts(file_stream_source(spark, src))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["conv_id"]): r["n_turns"]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["window_start"], r["conv_id"]): r["n_turns"]
        for r in windowed_turn_counts(batch_df).collect()
    }
    # append mode only emits windows the watermark has closed; every
    # emitted window must match the batch result, and most windows close
    assert got and all(want[k] == v for k, v in got.items())


def test_dedup_queries_leave_no_cached_relations(spark):
    """Cache-lifetime hygiene (VERDICT r2 #3): the dedup shapes persist
    no corpus-sized relations, and distributed training unpersists what
    it caches. Round-6 budget: minhash localCheckpoints exactly two
    BOUNDED relations per call (the ~50 B/doc text-key membership and
    the distinct-text gram arrays — the same multi-consumer
    materialization pattern simhash_dup_pairs and link_prediction use);
    ngram/embedding/training must still add zero. localCheckpoint
    blocks live until session teardown in practice (the SQL status
    store holds the plan), so the assertion is an exact per-call
    budget, not zero."""
    from frog_spark.models.distributed import synthetic_lexicon, train_mblem_distributed
    from frog_spark.operators.dedup import (
        embedding_dup_pairs,
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    ngram_jaccard_pairs(docs).count()
    embedding_dup_pairs(emb, id_col="vec_id", threshold=0.999).count()
    train_mblem_distributed(spark, synthetic_lexicon(spark, 500))
    zero_budget = spark.sparkContext._jsc.getPersistentRDDs().size()
    # delta-based: other tests' session fixtures may hold caches of
    # their own; these calls must add none. `<=` not `==`: a prior
    # test's cache can be GC-released mid-test (ContextCleaner runs
    # async), which once made the count DROP by one and flaked the
    # equality — only an INCREASE is a leak from these calls.
    assert zero_budget <= before, f"{zero_budget - before} cached RDDs leaked"
    minhash_dedup_pairs(docs).count()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    # minhash's budget is exactly its two documented checkpoints
    assert after - zero_budget <= 2, (
        f"minhash added {after - zero_budget} cached RDDs (budget 2)"
    )


def test_folia_word_correction(spark, pipeline):
    """T4 (correct_words, ucto_tokenizer_mod.cxx:756-775): a FoLiA doc
    whose <w> elements are under-tokenized gets a corrected token stream
    with the original word recorded on every split token."""
    from frog_spark.sources.folia import FOLIA_NS, correct_folia_words

    doc = (
        '<?xml version="1.0" encoding="utf-8"?>'
        f'<FoLiA xmlns="{FOLIA_NS}" xml:id="c.0" version="2.5"><text><p>'
        '<s xml:id="c.0.s.0">'
        '<w xml:id="c.0.s.0.w.0"><t>Dit</t></w>'
        '<w xml:id="c.0.s.0.w.1"><t>klopt</t></w>'
        '<w xml:id="c.0.s.0.w.2"><t>gisteren?</t></w>'
        "</s></p></text></FoLiA>"
    )
    df = spark.createDataFrame([("c", 0, doc)], "conv_id string, turn_idx int, folia string")
    out = correct_folia_words(df).orderBy("token_idx").collect()
    assert [r["word"] for r in out] == ["Dit", "klopt", "gisteren", "?"]
    assert [r["corrected"] for r in out] == [False, False, True, True]
    assert out[2]["original"] == "gisteren?" and out[3]["original"] == "gisteren?"
    assert out[3]["token_class"] == "PUNCTUATION"


def test_dedup_clusters_and_split(spark):
    """Transitive dup clusters collapse to the min id; the hash split is
    deterministic and roughly proportioned."""
    from frog_spark.operators.dedup import dedup_clusters, split_assign

    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(8)], "doc_id int, text string")
    pairs = spark.createDataFrame([(1, 3), (3, 5), (2, 6)], "a int, b int")
    out = {r["doc_id"]: (r["canonical_id"], r["cluster_size"]) for r in dedup_clusters(docs, pairs).collect()}
    assert out[1] == (1, 3) and out[3] == (1, 3) and out[5] == (1, 3)
    assert out[2] == (2, 2) and out[6] == (2, 2)
    assert out[0] == (0, 1) and out[7] == (7, 1)

    s1 = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    s2 = {r["doc_id"]: r["split"] for r in split_assign(docs.repartition(5)).collect()}
    assert s1 == s2  # partitioning-independent
    assert set(s1.values()) <= {"train", "val", "test"}


def test_decontaminate_and_pack(spark):
    from frog_spark.operators.dedup import decontaminate, pack_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h extra words here"),
            (2, "totally different content with no overlap at all x y"),
            (3, "prefix a b c d e f g h suffix"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame([("a b c d e f g h benchmark item",)], "text string")
    got = {r["doc_id"]: r["contaminated"] for r in decontaminate(docs, bench, n=8).collect()}
    assert got == {1: True, 2: False, 3: True}

    packed = pack_documents(docs, max_tokens=16, buckets=1).orderBy("doc_id").collect()
    # single bucket: offsets are running sums in doc_id order
    assert [r["offset"] for r in packed] == [0, 11, 21]
    assert [r["bin_id"] for r in packed] == [0, 0, 1]
    # deterministic under repartitioning
    again = pack_documents(docs.repartition(3), max_tokens=16, buckets=1).orderBy("doc_id").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in packed]


def test_dedup_invariants_random_corpus(spark):
    """Seeded-random-corpus invariants: MinHash-LSH + exact verification
    equals the brute-force Jaccard join (precision AND recall), cluster
    canonicals are component minima, and packing offsets are exact
    per-bucket running sums."""
    import itertools
    import random

    from frog_spark.operators.dedup import (
        dedup_clusters,
        minhash_dedup_pairs,
        pack_documents,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randint(6, 18))]
        rows.append((i, " ".join(words)))
        if rng.random() < 0.3:  # planted near-dup: copy with small edit
            dup = list(words)
            dup[rng.randrange(len(dup))] = rng.choice(vocab)
            rows.append((1000 + i, " ".join(dup)))
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    def grams(text, n=3):
        ws = text.split()
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    gsets = {i: grams(t) for i, t in rows}
    want = set()
    for (a, ga), (b, gb) in itertools.combinations(sorted(gsets.items()), 2):
        if not ga or not gb:
            continue
        j = len(ga & gb) / len(ga | gb)
        if j >= 0.7:
            want.add((a, b))
    # bands=64 of 2 rows: P(miss) at J=0.7 is (1-0.49)^64 ~ 1e-19, so
    # LSH+exact-verify must EQUAL the brute-force join on this corpus
    # (the default 32x4 banding has a ~2e-4 per-pair miss rate right at
    # the threshold — one planted pair at J=0.714 deterministically
    # slips it with the fixed seeds)
    got = {(r["a"], r["b"]) for r in minhash_dedup_pairs(docs, threshold=0.7, bands=64).collect()}
    assert got == want

    pairs = minhash_dedup_pairs(docs, threshold=0.7, bands=64)
    cl = dedup_clusters(docs, pairs).collect()
    by_comp = {}
    for r in cl:
        by_comp.setdefault(r["canonical_id"], []).append(r["doc_id"])
    for canon, members in by_comp.items():
        assert canon == min(members)
    assert sum(r["cluster_size"] for r in cl if r["doc_id"] == r["canonical_id"]) == len(rows)

    packed = pack_documents(docs, max_tokens=32, buckets=4).collect()
    by_bucket = {}
    for r in sorted(packed, key=lambda r: (r["bucket"], r["doc_id"])):
        run = by_bucket.setdefault(r["bucket"], [0])
        assert r["offset"] == run[-1]
        run.append(run[-1] + r["n_tokens"])
        assert r["bin_id"] == r["offset"] // 32


def test_textscan_crlf_and_regex_root(spark, tmp_path):
    """CRLF files must not leave trailing \\r on turns, and a scan root
    containing regex metacharacters must still strip to relative
    conv_ids (the root is a prefix, not a pattern)."""
    from frog_spark.sources.textscan import read_text_as_transcripts

    root = tmp_path / "data (v2) + more"
    root.mkdir()
    (root / "a.txt").write_bytes(b"eerste regel\r\ntweede regel\r\n")
    (root / "b.txt").write_text("gewone regel\n")
    rows = read_text_as_transcripts(spark, str(root)).collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r["text"])
    assert set(by_conv) == {"a.txt", "b.txt"}, by_conv
    assert by_conv["a.txt"] == ["eerste regel", "tweede regel"]
    assert not any("\r" in t for ts in by_conv.values() for t in ts)


def test_pipeline_broadcast_invalidated_on_model_swap(spark):
    """Swapping a model on a pipeline drops the cached broadcast and the
    sentence cache, so later annotation uses the new model (ADVICE r3:
    a mutated pipeline silently kept annotating with the stale copy)."""
    from frog_spark.corpus import transcripts_df
    from frog_spark.plans.pipeline import (
        FrogPipeline,
        PipelineConfig,
        annotate_transcripts,
    )

    pipe = FrogPipeline.build(PipelineConfig(treebank_sentences=0))
    ann1 = annotate_transcripts(spark, transcripts_df(spark, n_turns=6), pipe)
    ann1.count()
    assert getattr(pipe, "_bc", None) is not None
    pipe.parser = pipe.parser  # any model assignment invalidates
    assert getattr(pipe, "_bc", None) is None
    assert getattr(pipe, "_sent_cache", None) is None
    ann2 = annotate_transcripts(spark, transcripts_df(spark, n_turns=6), pipe)
    assert ann2.count() == ann1.count()


# ---------------------------------------------------------------------------
# X56: ordered conversion funnel (operators/events.py)
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_funnel_order_matters(spark):
    from frog_spark.operators.events import funnel

    rows = [
        # u1 completes in order
        (1, "view", "2024-01-01 00:01:00"),
        (1, "click", "2024-01-01 00:02:00"),
        (1, "purchase", "2024-01-01 00:03:00"),
        # u2's only click precedes the view: stage 1 only
        (2, "click", "2024-01-01 00:01:00"),
        (2, "view", "2024-01-01 00:02:00"),
        # u3's purchase precedes the click: stage 2 only
        (3, "view", "2024-01-01 00:01:00"),
        (3, "purchase", "2024-01-01 00:01:30"),
        (3, "click", "2024-01-01 00:02:00"),
        # u4 never views: not in the funnel at all
        (4, "click", "2024-01-01 00:01:00"),
        (4, "purchase", "2024-01-01 00:02:00"),
    ]
    got = [
        (r["stage_idx"], r["stage"], r["n_users"])
        for r in funnel(_events(spark, rows), ["view", "click", "purchase"])
        .orderBy("stage_idx")
        .collect()
    ]
    assert got == [(1, "view", 3), (2, "click", 2), (3, "purchase", 1)]


def test_funnel_equal_timestamp_and_greedy_witness(spark):
    from frog_spark.operators.events import funnel

    rows = [
        # same-instant step counts (>=, not >)
        (1, "view", "2024-01-01 00:01:00"),
        (1, "click", "2024-01-01 00:01:00"),
        # the greedy earliest-witness property: u2's FIRST view (00:01)
        # admits the 00:02 click even though a later view (00:03) would
        # not; earliest-first dominates every other witness chain
        (2, "view", "2024-01-01 00:01:00"),
        (2, "click", "2024-01-01 00:02:00"),
        (2, "view", "2024-01-01 00:03:00"),
    ]
    got = {r["stage"]: r["n_users"]
           for r in funnel(_events(spark, rows), ["view", "click"]).collect()}
    assert got == {"view": 2, "click": 2}


def test_funnel_single_step_and_empty(spark):
    from frog_spark.operators.events import funnel

    rows = [(1, "view", "2024-01-01 00:01:00")]
    got = funnel(_events(spark, rows), ["view"]).collect()
    assert [(r["stage_idx"], r["n_users"]) for r in got] == [(1, 1)]
    got0 = funnel(_events(spark, []), ["view", "click"]).collect()
    assert [(r["n_users"]) for r in got0] == [0, 0]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel(_events(spark, rows), [])


# ---------------------------------------------------------------------------
# X63: continuous KG maintenance (streaming/kg_update.py)
# ---------------------------------------------------------------------------


def test_streaming_fact_maintenance_equals_batch(spark, tmp_path):
    """The maintenance invariant: folding observation files through the
    streaming job (one micro-batch per file, versioned table + atomic
    _CURRENT repoint) equals summarize_facts over ALL observations in
    one batch pass — and a re-invocation with a new file resumes from
    the streaming checkpoint, processing only the unseen file."""
    from frog_spark.kg.evolve import summarize_facts
    from frog_spark.streaming.kg_update import (
        current_facts,
        run_fact_maintenance,
    )

    obs_dir, table_dir, ckpt = (
        str(tmp_path / "obs"), str(tmp_path / "facts"), str(tmp_path / "ckpt"),
    )

    def obs_df(rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    b1 = [("nl", "cap", "amsterdam", "2024-01-01"),
          ("be", "cap", "brussels", "2024-01-02")]
    b2 = [("nl", "cap", "amsterdam", "2024-02-01"),   # repeat: n_obs 2, window widens
          ("nl", "cap", "utrecht", "2024-02-02")]     # conflict obj: new fact
    obs_df(b1).coalesce(1).write.mode("append").parquet(obs_dir)
    obs_df(b2).coalesce(1).write.mode("append").parquet(obs_dir)

    run_fact_maintenance(spark, obs_dir, table_dir, ckpt)
    got = {tuple(r[:3]): (r["n_obs"], str(r["first_seen"]), str(r["last_seen"]))
           for r in current_facts(spark, table_dir).collect()}
    want = {tuple(r[:3]): (r["n_obs"], str(r["first_seen"]), str(r["last_seen"]))
            for r in summarize_facts(obs_df(b1 + b2)).collect()}
    assert got == want and len(got) == 3

    # no new files: re-run is a no-op (checkpoint), table unchanged
    run_fact_maintenance(spark, obs_dir, table_dir, ckpt)
    again = {tuple(r[:3]): (r["n_obs"], str(r["first_seen"]), str(r["last_seen"]))
             for r in current_facts(spark, table_dir).collect()}
    assert again == got

    # late batch arrives; resume processes ONLY it
    b3 = [("be", "cap", "brussels", "2023-12-01")]  # widens be's window backward
    obs_df(b3).coalesce(1).write.mode("append").parquet(obs_dir)
    run_fact_maintenance(spark, obs_dir, table_dir, ckpt)
    final = {tuple(r[:3]): (r["n_obs"], str(r["first_seen"]), str(r["last_seen"]))
             for r in current_facts(spark, table_dir).collect()}
    want3 = {tuple(r[:3]): (r["n_obs"], str(r["first_seen"]), str(r["last_seen"]))
             for r in summarize_facts(obs_df(b1 + b2 + b3)).collect()}
    assert final == want3
    assert final[("be", "cap", "brussels")][1].startswith("2023-12-01")


def test_vacuum_versions_expires_but_keeps_current(spark, tmp_path):
    from frog_spark.streaming.kg_update import (
        apply_obs_batch,
        current_facts,
        vacuum_versions,
    )

    table_dir = str(tmp_path / "facts")
    (tmp_path / "facts").mkdir()

    def obs_df(rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    for bid in range(4):
        apply_obs_batch(
            spark, obs_df([("s", "p", f"o{bid}", f"2024-01-0{bid + 1}")]),
            table_dir, bid,
        )
    import os

    assert sorted(os.listdir(table_dir)) == [
        "_CURRENT", "v0", "v1", "v2", "v3",
    ]
    removed = vacuum_versions(table_dir, keep_last=2)
    assert removed == ["v0", "v1"]
    # the current version survives and still reads (4 accumulated facts)
    assert current_facts(spark, table_dir).count() == 4
    # keep_last larger than what exists: no-op
    assert vacuum_versions(table_dir, keep_last=10) == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vacuum_versions(table_dir, keep_last=0)


def test_apply_obs_batch_replay_is_idempotent(spark, tmp_path):
    """ADVICE r5: a crash after the _CURRENT repoint but before the
    streaming checkpoint commit makes foreachBatch re-invoke the SAME
    batch_id; the merge base must then be the predecessor version, not
    _CURRENT (which already contains the batch), or n_obs silently
    doubles."""
    from frog_spark.streaming.kg_update import apply_obs_batch, current_facts

    table_dir = str(tmp_path / "facts")
    (tmp_path / "facts").mkdir()

    def obs_df(rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    b0 = [("nl", "cap", "amsterdam", "2024-01-01")]
    b1 = [("nl", "cap", "amsterdam", "2024-02-01"),
          ("be", "cap", "brussels", "2024-02-02")]
    apply_obs_batch(spark, obs_df(b0), table_dir, 0)
    apply_obs_batch(spark, obs_df(b1), table_dir, 1)
    want = {tuple(r[:3]): r["n_obs"] for r in current_facts(spark, table_dir).collect()}
    assert want[("nl", "cap", "amsterdam")] == 2

    # replay batch 1 (simulated crash between repoint and checkpoint)
    apply_obs_batch(spark, obs_df(b1), table_dir, 1)
    got = {tuple(r[:3]): r["n_obs"] for r in current_facts(spark, table_dir).collect()}
    assert got == want  # n_obs did NOT double

    # replay of the FIRST batch (no predecessor): base is empty
    apply_obs_batch(spark, obs_df(b0), table_dir, 0)
    first = {tuple(r[:3]): r["n_obs"]
             for r in spark.read.parquet(f"{table_dir}/v0").collect()}
    assert first == {("nl", "cap", "amsterdam"): 1}


def test_kg_maintenance_full_lifecycle(spark, tmp_path):
    """VERDICT r5 #7: the full lifecycle interleaved — streamed folds,
    vacuum, a concurrent reader holding the pre-vacuum _CURRENT, a
    checkpoint resume, and a replay — ends byte-equal to the one-shot
    batch recompute."""
    from frog_spark.kg.evolve import summarize_facts
    from frog_spark.streaming.kg_update import (
        apply_obs_batch,
        current_facts,
        run_fact_maintenance,
        vacuum_versions,
    )

    obs_dir, table_dir, ckpt = (
        str(tmp_path / "obs"), str(tmp_path / "facts"), str(tmp_path / "ckpt"),
    )

    def obs_df(rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    b1 = [("nl", "cap", "amsterdam", "2024-01-01")]
    b2 = [("be", "cap", "brussels", "2024-01-02")]
    b3 = [("nl", "cap", "amsterdam", "2024-03-01")]
    obs_df(b1).coalesce(1).write.mode("append").parquet(obs_dir)
    obs_df(b2).coalesce(1).write.mode("append").parquet(obs_dir)
    run_fact_maintenance(spark, obs_dir, table_dir, ckpt)

    # a concurrent reader resolves _CURRENT now (pre-vacuum, pre-resume)
    reader_df = current_facts(spark, table_dir)
    pre = {tuple(r[:3]): r["n_obs"] for r in reader_df.collect()}

    removed = vacuum_versions(table_dir, keep_last=2)
    # the reader's resolved version must have survived the vacuum
    assert {tuple(r[:3]): r["n_obs"] for r in reader_df.collect()} == pre

    # resume with a late file, then replay the newest batch id
    obs_df(b3).coalesce(1).write.mode("append").parquet(obs_dir)
    run_fact_maintenance(spark, obs_dir, table_dir, ckpt)
    import os
    newest = max(
        int(d.lstrip("v")) for d in os.listdir(table_dir)
        if d.startswith("v") and d.lstrip("v").isdigit()
    )
    apply_obs_batch(spark, obs_df(b3), table_dir, newest)  # replay

    got = {tuple(r[:3]): (r["n_obs"], str(r["first_seen"]), str(r["last_seen"]))
           for r in current_facts(spark, table_dir).collect()}
    want = {tuple(r[:3]): (r["n_obs"], str(r["first_seen"]), str(r["last_seen"]))
            for r in summarize_facts(obs_df(b1 + b2 + b3)).collect()}
    assert got == want


def test_ngram_extended_prefix_equals_bruteforce(spark):
    """Round-6 invariant: the k-extended-prefix candidate filter in
    ngram_jaccard_pairs is EXACT — over a seeded random corpus with
    planted near-dups and tiny documents (1-3 grams, where the
    min(k, ceil(t(|A|+|B|)/(1+t))) requirement must degrade), the
    output equals the brute-force Jaccard join at t=0.8."""
    import itertools
    import random

    from frog_spark.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    for i in range(50):
        words = [rng.choice(vocab) for _ in range(rng.randint(3, 16))]
        rows.append((i, " ".join(words)))
        if rng.random() < 0.4:  # planted near-dup: copy, one word changed
            dup = list(words)
            dup[rng.randrange(len(dup))] = rng.choice(vocab)
            rows.append((1000 + i, " ".join(dup)))
    # exact duplicates of tiny docs: J=1 pairs with < k shared grams
    rows.append((5001, "a b c"))          # 1 gram
    rows.append((5002, "a b c"))
    rows.append((5003, "p q r s"))        # 2 grams
    rows.append((5004, "p q r s"))
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    def grams(text, n=3):
        ws = text.split()
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    gsets = {i: grams(t) for i, t in rows}
    want = set()
    for (a, ga), (b, gb) in itertools.combinations(sorted(gsets.items()), 2):
        if not ga or not gb:
            continue
        if len(ga & gb) / len(ga | gb) >= 0.8:
            want.add((a, b))
    got = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    assert got == want
    assert (5001, 5002) in got and (5003, 5004) in got  # tiny-doc coverage


def test_simhash_pigeonhole_equals_bruteforce(spark):
    """Round-6 invariant: the distinct-value contraction + 3-of-6-chunk
    blocking (h<=3) and the generic h+1-chunk fallback (h=8) both
    produce EXACTLY the brute-force Hamming-pair join over the
    fingerprints, including hamming-0 groups of identical texts."""
    import itertools
    import random

    from frog_spark.operators.dedup import simhash64, simhash_dup_pairs

    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(4, 14))]
        rows.append((i, " ".join(words)))
        if rng.random() < 0.35:
            rows.append((1000 + i, " ".join(words)))  # exact dup: hamming 0
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    h = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}

    for max_h in (3, 8):
        want = {
            (a, b, bin(h[a] ^ h[b]).count("1"))
            for a, b in itertools.combinations(sorted(h), 2)
            if bin(h[a] ^ h[b]).count("1") <= max_h
        }
        got = {
            (r["a"], r["b"], r["hamming"])
            for r in simhash_dup_pairs(docs, max_hamming=max_h).collect()
        }
        assert got == want, f"max_hamming={max_h}"

def test_simhash_broadcast_gate_identical(spark):
    """The size-gated expansion path (broadcast_max_docs exceeded, so the
    member joins run as plain equi-joins) emits exactly the same pair set
    as the broadcast path."""
    import random

    from frog_spark.operators.dedup import simhash_dup_pairs

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for i in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randint(4, 14))]
        rows.append((i, " ".join(words)))
        if rng.random() < 0.3:
            rows.append((1000 + i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    broadcast = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_dup_pairs(docs, max_hamming=3).collect()
    }
    gated = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_dup_pairs(docs, max_hamming=3, broadcast_max_docs=0).collect()
    }
    assert gated == broadcast and broadcast
