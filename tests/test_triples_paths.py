"""The in-UDF (sentence-local) triple lift and the relational hash-join
lift must produce identical triple sets — the equality that justifies the
zero-shuffle fast path."""


def test_fast_and_relational_lifts_agree(spark, pipeline):
    from frog_spark.corpus import transcripts_df
    from frog_spark.kg.triples import extract_triples, extract_triples_relational
    from frog_spark.plans.pipeline import annotate_transcripts

    tdf = transcripts_df(spark, n_turns=90)
    ann = annotate_transcripts(spark, tdf, pipeline).localCheckpoint(eager=True)
    cols = ["conv_id", "turn_idx", "sent_idx", "subj", "pred", "obj", "source"]
    fast = {tuple(r) for r in extract_triples(ann).select(*cols).collect()}
    rel = {
        tuple(r)
        for r in extract_triples_relational(ann, persist=False)
        .select(*cols)
        .collect()
    }
    assert fast == rel
    assert len(fast) > 0

    # and the projection-specialized one-stage operator agrees too
    from frog_spark.plans.pipeline import triples_from_transcripts

    direct = {
        tuple(r)
        for r in triples_from_transcripts(spark, tdf, pipeline)
        .select(*cols)
        .collect()
    }
    assert direct == fast
