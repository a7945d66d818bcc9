"""KG lift, linking, canonicalization, checkpoint/resume tests."""

import shutil
import tempfile

import pytest

from frog_spark.kg.gold import gold_triples, precision_recall
from frog_spark.sources.resources import load_gold_corpus


def test_gold_lift_s01(gold):
    ts = gold_triples(gold)
    s01 = ts["Dit is een test van Frog op de datum 09-01-2012!"]
    assert ("dit", "zijn", "test") in s01


def test_gold_lift_entities_used_as_repr(gold):
    ts = gold_triples(gold)
    s19 = ts["De minister bezoekt de Tweede Kamer in Den Haag."]
    assert ("minister", "bezoeken", "Tweede Kamer") in s19


def test_precision_recall():
    p, r = precision_recall({("a", "b", "c")}, {("a", "b", "c"), ("d", "e", "f")})
    assert p == 1.0 and r == 0.5


@pytest.fixture(scope="module")
def kg_run(spark, pipeline):
    from frog_spark.corpus import transcripts_df
    from frog_spark.kg.materialize import build_graph

    tdf = transcripts_df(spark, n_turns=60).cache()
    base = tempfile.mkdtemp(prefix="frogspark_kg_test_")
    run = build_graph(spark, tdf, base, pipeline)
    yield spark, tdf, base, run
    shutil.rmtree(base, ignore_errors=True)


def test_triple_pr_vs_gold(kg_run, gold):
    spark, tdf, base, run = kg_run
    triples = spark.read.parquet(f"{base}/triples")
    gold_by_text = gold_triples(gold)
    src = {(r["conv_id"], r["turn_idx"]): r["text"] for r in tdf.collect()}
    pred = {}
    for r in triples.collect():
        pred.setdefault((r["conv_id"], r["turn_idx"]), set()).add(
            (r["subj"], r["pred"], r["obj"])
        )
    tp = fp = fn = 0
    for k, text in src.items():
        want = set()
        for stext, ts in gold_by_text.items():
            if stext in text:
                want |= ts
        got = pred.get(k, set())
        tp += len(got & want)
        fp += len(got - want)
        fn += len(want - got)
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    # north rule: P/R >= 0.95
    assert prec >= 0.95, (prec, rec)
    assert rec >= 0.95, (prec, rec)


def test_resume_skips_completed_stages(kg_run, pipeline):
    spark, tdf, base, _ = kg_run
    from frog_spark.kg.materialize import build_graph

    run2 = build_graph(spark, tdf, base, pipeline)
    assert all(r.resumed for r in run2.results.values())
    assert run2.results["triples"].rows > 0


def test_stage_state_has_partition_counters(kg_run):
    _, _, _, run = kg_run
    st = run.results["annotated"]
    assert st.rows == sum(st.counters["per_partition_rows"].values())


def test_connected_components(spark):
    from frog_spark.kg.canonicalize import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["a", "b"]
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert comp["a"] != comp["x"]


def test_merge_components_equals_from_scratch(spark):
    """X47: folding a new edge batch into an existing assignment must
    equal from-scratch components over the full edge log — including
    when the batch BRIDGES two old components, and for nodes the batch
    never touches."""
    from frog_spark.kg.canonicalize import connected_components, merge_components

    base_edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q")], ["a", "b"]
    )
    # bridges {a,b,c} and {x,y}; adds a brand-new component {m,n};
    # leaves {p,q} untouched
    batch = spark.createDataFrame([("c", "x"), ("m", "n")], ["a", "b"])
    assign = connected_components(base_edges)
    merged = {
        r["node"]: r["component"]
        for r in merge_components(assign, batch).collect()
    }
    scratch = {
        r["node"]: r["component"]
        for r in connected_components(base_edges.unionByName(batch)).collect()
    }
    assert merged == scratch
    assert merged["x"] == merged["a"] == "a"
    assert merged["m"] == merged["n"] == "m"
    assert merged["p"] == merged["q"] == "p"
    # empty batch: the assignment is a fixed point
    empty = spark.createDataFrame([], "a string, b string")
    again = {
        r["node"]: r["component"]
        for r in merge_components(assign, empty).collect()
    }
    assert again == {
        r["node"]: r["component"] for r in assign.collect()
    }


def test_minhash_links_near_duplicates(spark):
    from frog_spark.kg.linking import similarity_edges

    forms = spark.createDataFrame(
        [("Jimmy Wales",), ("Jimmy  Wales",), ("Google",), ("Tweede Kamer",)],
        ["form"],
    )
    edges = similarity_edges(forms, threshold=0.8)
    pairs = {(r["a"], r["b"]) for r in edges.collect()}
    assert ("Jimmy  Wales", "Jimmy Wales") in pairs or (
        "Jimmy Wales",
        "Jimmy  Wales",
    ) in pairs
    assert all("Google" not in p for p in pairs)
