"""X49-X51 + X53: graph pattern & constraint mining (kg/mining.py).
Driver-gate parity (full DuckDB oracles over the relational KG) lives
in __spark_entry__; these tests pin the semantics on hand-built graphs
plus the hub-cap scale property.
"""

from pyspark.sql import functions as F


def _edges(spark, rows, cols="subj string, pred string, obj string"):
    return spark.createDataFrame(rows, cols)


def test_link_prediction_path_and_exclusions(spark):
    from frog_spark.kg.mining import link_prediction

    # path a-b-c: (a,c) predicted through b (deg 2, weight 1/log2(2)=1);
    # (a,b)/(b,c) are existing edges and must NOT appear
    rows = [("a", "r", "b"), ("b", "r", "c")]
    got = link_prediction(_edges(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["a"], r["b"], r["common_neighbors"], r["aa_score"]) == (
        "a", "c", 1, 1.0,
    )


def test_link_prediction_direction_multiplicity_ignored(spark):
    from frog_spark.kg.mining import link_prediction

    # same path with reversed + duplicate + multi-predicate edges:
    # identical result (undirected simple graph)
    rows = [
        ("b", "r", "a"), ("a", "q", "b"), ("b", "r", "c"), ("b", "r", "c"),
    ]
    got = link_prediction(_edges(spark, rows)).collect()
    assert [(r["a"], r["b"], r["common_neighbors"]) for r in got] == [
        ("a", "c", 1)
    ]


def test_link_prediction_square_two_common_neighbors(spark):
    from frog_spark.kg.mining import link_prediction

    # 4-cycle 1-2-3-4-1: diagonals (1,3) and (2,4) each close through
    # TWO degree-2 neighbors -> cn=2, aa = 2 * 1/log2(2) = 2.0
    rows = [(a, "r", b) for a, b in
            [("1", "2"), ("2", "3"), ("3", "4"), ("4", "1")]]
    got = {(r["a"], r["b"]): (r["common_neighbors"], r["aa_score"])
           for r in link_prediction(_edges(spark, rows)).collect()}
    assert got == {("1", "3"): (2, 2.0), ("2", "4"): (2, 2.0)}


def test_link_prediction_hub_cap_excludes_celebrity(spark):
    from frog_spark.kg.mining import link_prediction

    # star: hub wired to 5 leaves. Uncapped, every leaf pair is
    # predicted through the hub; with the cap below the hub's degree
    # the wedge join generates NOTHING — the scale property itself.
    rows = [("hub", "r", f"leaf{i}") for i in range(5)]
    uncapped = link_prediction(_edges(spark, rows), max_neighbor_degree=64)
    assert uncapped.count() == 10  # C(5,2) leaf pairs
    capped = link_prediction(_edges(spark, rows), max_neighbor_degree=4)
    assert capped.count() == 0


def test_link_prediction_top_k_total_order(spark):
    from frog_spark.kg.mining import link_prediction

    # two wedge centers of different degree — and the shared leaves p/q
    # are themselves degree-2 wedge centers closing (x, y)
    rows = [("x", "r", "p"), ("x", "r", "q"),  # x: deg 2
            ("y", "r", "p"), ("y", "r", "q"), ("y", "r", "u"), ("y", "r", "v")]
    got = link_prediction(_edges(spark, rows), top_k=3).collect()
    # (x,y) closes through BOTH p and q (each deg 2): 2 * 1/log2(2)
    assert (got[0]["a"], got[0]["b"], got[0]["aa_score"]) == ("x", "y", 2.0)
    # (p,q) through x (deg 2) and y (deg 4): 1/log2(2) + 1/log2(4)
    assert (got[1]["a"], got[1]["b"], got[1]["aa_score"]) == ("p", "q", 1.5)
    # next under (score DESC, a, b): the y-only pairs at 0.5
    assert (got[2]["a"], got[2]["b"], got[2]["aa_score"]) == ("p", "u", 0.5)


def test_pred_profile_functionality(spark):
    from frog_spark.kg.mining import pred_profile

    rows = [
        # 'cap' maps each subject to exactly one object (functional),
        # with a duplicate fact that the distinct must collapse
        ("nl", "cap", "amsterdam"), ("nl", "cap", "amsterdam"),
        ("be", "cap", "brussels"),
        # 'spoke' is multi-valued per subject, objects shared
        ("a", "spoke", "x"), ("a", "spoke", "y"),
        ("b", "spoke", "x"), ("b", "spoke", "y"),
    ]
    got = {r["pred"]: r for r in pred_profile(_edges(spark, rows)).collect()}
    cap = got["cap"]
    assert (cap["n_facts"], cap["n_subj"], cap["n_obj"]) == (2, 2, 2)
    assert cap["functionality"] == 1.0 and cap["inv_functionality"] == 1.0
    sp = got["spoke"]
    assert (sp["n_facts"], sp["n_subj"], sp["n_obj"]) == (4, 2, 2)
    assert sp["functionality"] == 0.5 and sp["inv_functionality"] == 0.5


def test_inverse_preds_detects_inverse_and_symmetric(spark):
    from frog_spark.kg.mining import inverse_preds

    rows = [
        # q is p's exact inverse on 2 of p's 3 facts
        ("a", "p", "b"), ("c", "p", "d"), ("e", "p", "f"),
        ("b", "q", "a"), ("d", "q", "c"),
        # s is symmetric on one unordered pair -> overlap 2 (both
        # directions), |s| = 2, score 1.0
        ("x", "s", "y"), ("y", "s", "x"),
    ]
    got = {(r["p"], r["q"]): r for r in inverse_preds(_edges(spark, rows)).collect()}
    pq = got[("p", "q")]
    assert (pq["overlap"], pq["n_p"], pq["n_q"]) == (2, 3, 2)
    assert pq["score"] == 1.0  # 2 / min(3, 2)
    ss = got[("s", "s")]
    assert (ss["overlap"], ss["score"]) == (2, 1.0)
    # no reversed-pair overlap between p and s -> pair absent
    assert ("p", "s") not in got and ("s", "p") not in got


def test_inverse_preds_min_overlap_and_duplicates(spark):
    from frog_spark.kg.mining import inverse_preds

    rows = [
        ("a", "p", "b"), ("a", "p", "b"),  # duplicate fact collapses
        ("b", "q", "a"),
        ("m", "r", "n"), ("n", "t", "m"),
    ]
    got = inverse_preds(_edges(spark, rows), min_overlap=2)
    assert got.count() == 0  # every true overlap is 1 after distinct
    got1 = {(r["p"], r["q"]) for r in inverse_preds(_edges(spark, rows)).collect()}
    assert got1 == {("p", "q"), ("r", "t")}


def test_mining_empty_and_edgeless_inputs(spark):
    from frog_spark.kg.mining import inverse_preds, link_prediction, pred_profile

    empty = _edges(spark, [])
    assert link_prediction(empty).count() == 0
    assert pred_profile(empty).count() == 0
    assert inverse_preds(empty).count() == 0
    # a single self-loop: no undirected pair survives, profile still counts it
    loop = _edges(spark, [("a", "p", "a")])
    assert link_prediction(loop).count() == 0
    assert pred_profile(loop).count() == 1
    # a self-loop is its own reversal -> symmetric overlap of 1
    assert inverse_preds(loop).collect()[0]["score"] == 1.0


def test_role_signatures_discovers_concepts(spark):
    from frog_spark.kg.mining import role_signatures

    rows = [
        # s1/s2 play identical roles (supply + get bought from);
        # p1/p2 are pure objects of 'supplies'; c1 a pure subject
        ("s1", "supplies", "p1"), ("s1", "supplies", "p2"),
        ("s2", "supplies", "p1"),
        ("c1", "buys_from", "s1"), ("c1", "buys_from", "s2"),
        ("c1", "buys_from", "s2"),  # duplicate fact collapses
    ]
    got = {r["signature"]: (r["n_nodes"], r["sample_node"])
           for r in role_signatures(_edges(spark, rows)).collect()}
    assert got == {
        "in:buys_from,out:supplies": (2, "s1"),
        "in:supplies": (2, "p1"),
        "out:buys_from": (1, "c1"),
    }
