"""CGN tag utilities + partition-invariance tests."""

from frog_spark.functions.cgn import expand_tag, split_tag


def test_split_tag():
    assert split_tag("N(soort,ev,basis,zijd,stan)") == (
        "N",
        ["soort", "ev", "basis", "zijd", "stan"],
    )
    assert split_tag("LET()") == ("LET", [])
    assert split_tag("BW()") == ("BW", [])


def test_expand_tag_noun():
    m = expand_tag("N(soort,ev,basis,zijd,stan)")
    assert m == {
        "ntype": "soort",
        "getal": "ev",
        "graad": "basis",
        "genus": "zijd",
        "naamval": "stan",
    }


def test_expand_tag_head_constraint():
    # 'ev' is getal on nouns but pvagr on finite verbs
    assert expand_tag("WW(pv,tgw,ev)")["pvagr"] == "ev"
    assert expand_tag("N(soort,ev,basis,zijd,stan)")["getal"] == "ev"


def test_expand_tag_spec():
    assert expand_tag("SPEC(deeleigen)") == {"spectype": "deeleigen"}


def test_cgn_features_udf(spark):
    from pyspark.sql import functions as F

    from frog_spark.functions.cgn import cgn_features, cgn_head

    df = spark.createDataFrame(
        [("N(soort,ev,basis,zijd,stan)",), ("WW(pv,tgw,ev)",)], ["pos_tag"]
    )
    out = df.select(
        cgn_head(F.col("pos_tag")).alias("head"),
        cgn_features(F.col("pos_tag")).alias("feats"),
    ).collect()
    assert out[0]["head"] == "N"
    assert out[0]["feats"]["ntype"] == "soort"
    assert out[1]["feats"]["pvagr"] == "ev"


def test_annotation_partition_invariance(spark, pipeline):
    """North-rule invariant: identical output at different parallelism."""
    from frog_spark.corpus import transcripts_df
    from frog_spark.plans.pipeline import annotate_transcripts

    tdf = transcripts_df(spark, n_turns=48)
    key = ["conv_id", "turn_idx", "sent_idx", "token_idx"]
    a = (
        annotate_transcripts(spark, tdf, pipeline, num_partitions=2)
        .orderBy(*key)
        .select(*key, "word", "pos_tag", "lemma", "ner_tag", "parse_head", "parse_role")
        .toPandas()
    )
    b = (
        annotate_transcripts(spark, tdf.repartition(7), pipeline, num_partitions=5)
        .orderBy(*key)
        .select(*key, "word", "pos_tag", "lemma", "ner_tag", "parse_head", "parse_role")
        .toPandas()
    )
    assert a.equals(b)
