"""X36-X38: graph analytics over the constructed KG
(kg/analytics.py). Driver-gate parity lives in __spark_entry__ (full
DuckDB oracles, including an unrolled-CTE PageRank); these tests pin
the semantics on hand-built graphs plus the degree-ordering scale
property and plan shape.
"""

from pyspark.sql import functions as F


def _edges(spark, rows, cols="subj string, pred string, obj string"):
    return spark.createDataFrame(rows, cols)


def test_degree_profile_counts_and_preds(spark):
    from frog_spark.kg.analytics import degree_profile

    rows = [
        ("a", "p", "b"), ("a", "q", "b"), ("a", "p", "c"),
        ("b", "p", "c"),
    ]
    got = {r["node"]: r for r in degree_profile(_edges(spark, rows)).collect()}
    assert (got["a"]["out_deg"], got["a"]["out_preds"]) == (3, 2)
    assert (got["a"]["in_deg"], got["a"]["in_preds"]) == (0, 0)
    assert (got["b"]["out_deg"], got["b"]["in_deg"], got["b"]["degree"]) == (1, 2, 3)
    # c is sink-only: present via the full-outer join with zeros filled
    assert (got["c"]["out_deg"], got["c"]["in_deg"], got["c"]["in_preds"]) == (0, 2, 1)


def test_triangle_count_k4_square_star(spark):
    from frog_spark.kg.analytics import triangle_count

    def tri(pairs):
        rows = [(a, "r", b) for a, b in pairs]
        return {
            r["node"]: r["n_triangles"]
            for r in triangle_count(_edges(spark, rows)).collect()
        }

    # K4: 4 triangles, every node in exactly 3
    k4 = [("1", "2"), ("1", "3"), ("1", "4"), ("2", "3"), ("2", "4"), ("3", "4")]
    assert tri(k4) == {"1": 3, "2": 3, "3": 3, "4": 3}
    # square with one diagonal: two triangles sharing the diagonal
    sq = [("1", "2"), ("2", "3"), ("3", "4"), ("4", "1"), ("1", "3")]
    assert tri(sq) == {"1": 2, "2": 1, "3": 2, "4": 1}
    # star: no triangles at all
    star = [("hub", f"leaf{i}") for i in range(6)]
    assert tri(star) == {}
    # direction and multiplicity ignored: reversed + duplicate edges
    # must not create or double-count triangles
    noisy = [("2", "1"), ("1", "2"), ("2", "3"), ("3", "1"), ("3", "1")]
    assert tri(noisy) == {"1": 1, "2": 1, "3": 1}


def test_triangle_orientation_points_at_hubs(spark):
    """The scale property itself: with (degree, node) orientation every
    star edge points INTO the hub, so the hub has out-degree 0 and the
    wedge join generates nothing at the celebrity node."""
    from frog_spark.kg.analytics import _oriented, _undirected

    rows = [("hub", "r", f"leaf{i}") for i in range(8)]
    o = _oriented(_undirected(_edges(spark, rows), "subj", "obj")).collect()
    assert all(r["v"] == "hub" for r in o)
    assert all(r["u"].startswith("leaf") for r in o)


def test_pagerank_matches_reference_loop(spark):
    from frog_spark.kg.analytics import pagerank

    # a -> b, a -> c, b -> c, c -> a (classic 3-node example)
    rows = [("a", "r", "b"), ("a", "r", "c"), ("b", "r", "c"), ("c", "r", "a")]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, rows), iters=5).collect()
    }

    # same update in plain python
    d, n = 0.85, 3
    ranks = {v: round(1.0 / n, 12) for v in "abc"}
    out = {"a": 2, "b": 1, "c": 1}
    links = {"b": ["a"], "c": ["a", "b"], "a": ["c"]}
    for _ in range(5):
        ranks = {
            v: round(
                round((1 - d) / n, 12)
                + d * sum(ranks[u] / out[u] for u in links.get(v, [])),
                12,
            )
            for v in "abc"
        }
    want = {v: round(r, 6) for v, r in ranks.items()}
    assert got == want
    # mass conservation: no dangling nodes here, so ranks sum to ~1
    assert abs(sum(got.values()) - 1.0) < 1e-5
    # dangling sink leaks mass (documented): sum < 1
    leak = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges(spark, [("a", "r", "b"), ("b", "r", "c")]), iters=5
        ).collect()
    }
    assert sum(leak.values()) < 1.0
    assert leak["c"] > leak["b"] > leak["a"]


def test_kg_analytics_plans_stay_jvm_side(spark):
    """X36-X38 plan gates: pure JVM (no Python eval anywhere), the
    relational-KG dims broadcast, and no cartesian products in the
    triangle wedge join."""
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

    for name in ("kg_degree_profile", "kg_triangles"):
        p = plan(name)
        assert "BatchEvalPython" not in p and "MapInPandas" not in p, name
        assert "ArrowEvalPython" not in p, name
        assert "CartesianProduct" not in p, name

    p = plan("kg_degree_profile")
    assert p.count("BroadcastHashJoin") >= 4, p


def test_pagerank_checkpointing_preserves_result(spark):
    """The lineage-truncation path (checkpoint_every) must be a pure
    performance knob: ranks identical with and without it, at an
    iteration count that actually triggers mid-loop checkpoints."""
    from frog_spark.kg.analytics import pagerank

    rows = [
        ("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"),
        ("d", "r", "a"), ("a", "r", "c"), ("d", "r", "b"),
    ]
    e = _edges(spark, rows)
    plain = {
        r["node"]: r["rank"]
        for r in pagerank(e, iters=10, checkpoint_every=0).collect()
    }
    ckpt = {
        r["node"]: r["rank"]
        for r in pagerank(e, iters=10, checkpoint_every=3).collect()
    }
    assert plain == ckpt


def test_khop_distances_shortest_paths(spark):
    from frog_spark.kg.analytics import khop_distances

    # diamond with a shortcut: a->b->c->d plus a->c; shortest wins
    rows = [
        ("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"), ("a", "r", "c"),
        # disconnected component: never reached
        ("x", "r", "y"),
    ]
    e = _edges(spark, rows)
    src = spark.createDataFrame([("a",)], "node string")
    got = {
        r["node"]: r["dist"]
        for r in khop_distances(e, src, k=3).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
    # k beyond exhaustion: early exit, identical result (no spin on an
    # empty frontier)
    far = {
        r["node"]: r["dist"]
        for r in khop_distances(e, src, k=10).collect()
    }
    assert far == got
    # cycles terminate: the seen anti-join never re-expands a node
    cyc = _edges(spark, [("a", "r", "b"), ("b", "r", "a")])
    got_c = {
        r["node"]: r["dist"]
        for r in khop_distances(cyc, src, k=5).collect()
    }
    assert got_c == {"a": 0, "b": 1}
    # k=0: sources only
    assert {
        r["node"]: r["dist"]
        for r in khop_distances(e, src, k=0).collect()
    } == {"a": 0}


def test_cooccurrence_pmi_hand_counts(spark):
    import math

    from frog_spark.kg.analytics import cooccurrence_pmi

    rows = [
        ("d1", "x"), ("d1", "y"),
        ("d2", "x"), ("d2", "y"),
        ("d3", "x"), ("d3", "z"),
        ("d4", "y"),
        # duplicate presence row: counts are distinct-presence, not
        # occurrences
        ("d1", "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, item string")
    got = {
        (r["a"], r["b"]): r
        for r in cooccurrence_pmi(df, "doc_id", "item").collect()
    }
    # n=4 docs; n_x=3, n_y=3, n_z=1; (x,y) in 2 docs, (x,z) in 1
    xy = got[("x", "y")]
    assert (xy["n_ab"], xy["n_a"], xy["n_b"]) == (2, 3, 3)
    assert xy["pmi"] == round(math.log2(4 * 2 / (3 * 3)), 6)
    xz = got[("x", "z")]
    assert (xz["n_ab"], xz["n_a"], xz["n_b"]) == (1, 3, 1)
    assert xz["pmi"] == round(math.log2(4 * 1 / (3 * 1)), 6)
    assert ("y", "z") not in got  # never co-present
    # min_pairs prunes singleton pairs
    pruned = cooccurrence_pmi(df, "doc_id", "item", min_pairs=2).collect()
    assert {(r["a"], r["b"]) for r in pruned} == {("x", "y")}


def test_x43_x45_plans_stay_jvm_side(spark):
    import contextlib
    import io

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    qs = entry.queries()
    for name in ("kg_facts_asof", "kg_cooccur_pmi"):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf).explain("formatted")
        p = buf.getvalue()
        assert "BatchEvalPython" not in p and "MapInPandas" not in p, name
        assert "ArrowEvalPython" not in p, name
        assert "CartesianProduct" not in p, name


def test_kg_analytics_degenerate_inputs(spark):
    """Empty edge sets: every operator returns an empty result with its
    schema intact (pagerank must not divide by the zero node count)."""
    from frog_spark.kg.analytics import degree_profile, pagerank, triangle_count

    empty = _edges(spark, [])
    assert degree_profile(empty).count() == 0
    assert triangle_count(empty).count() == 0
    pr = pagerank(empty, iters=3)
    assert pr.columns == ["node", "rank"] and pr.count() == 0
    # self-loops alone: no undirected simple edges -> no triangles
    loops = _edges(spark, [("a", "r", "a"), ("b", "r", "b")])
    assert triangle_count(loops).count() == 0
    # khop: empty source set and empty edge set both yield empty
    from frog_spark.kg.analytics import cooccurrence_pmi, khop_distances

    no_src = spark.createDataFrame([], "node string")
    some = _edges(spark, [("a", "r", "b")])
    assert khop_distances(some, no_src, k=3).count() == 0
    src = spark.createDataFrame([("a",)], "node string")
    only_src = khop_distances(empty, src, k=3)
    assert {(r["node"], r["dist"]) for r in only_src.collect()} == {("a", 0)}
    # pmi: no presence rows, and single-item containers (no pairs)
    no_presence = spark.createDataFrame([], "doc_id string, item string")
    assert cooccurrence_pmi(no_presence, "doc_id", "item").count() == 0
    singles = spark.createDataFrame(
        [("d1", "x"), ("d2", "y")], "doc_id string, item string"
    )
    assert cooccurrence_pmi(singles, "doc_id", "item").count() == 0


def test_label_propagation_triangle_converges(spark):
    from frog_spark.kg.analytics import label_propagation

    rows = [("a", "r", "b"), ("b", "r", "c"), ("a", "r", "c")]
    got = {r["node"]: r["label"]
           for r in label_propagation(_edges(spark, rows), iters=4).collect()}
    # round 1 ties all break to the min absent label, round 2 floods
    # 'a', round 3 is stable: one community labeled by the min node
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_label_propagation_bridged_triangles_two_communities(spark):
    from frog_spark.kg.analytics import label_propagation

    tri1 = [("a", "r", "b"), ("b", "r", "c"), ("a", "r", "c")]
    tri2 = [("x", "r", "y"), ("y", "r", "z"), ("x", "r", "z")]
    bridge = [("c", "r", "x")]
    got = {r["node"]: r["label"]
           for r in label_propagation(
               _edges(spark, tri1 + tri2 + bridge), iters=4).collect()}
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] != got["x"]  # the bridge must not merge the cliques


def test_label_propagation_fixed_iters_deterministic_oscillation(spark):
    from frog_spark.kg.analytics import label_propagation

    # a single edge is the bipartite worst case: synchronous LPA swaps
    # labels every round. Fixed iters makes the output a well-defined
    # function of the input — even counts restore own labels.
    rows = [("a", "r", "b")]
    even = {r["node"]: r["label"]
            for r in label_propagation(_edges(spark, rows), iters=4).collect()}
    odd = {r["node"]: r["label"]
           for r in label_propagation(_edges(spark, rows), iters=3).collect()}
    assert even == {"a": "a", "b": "b"}
    assert odd == {"a": "b", "b": "a"}


def test_label_propagation_ignores_direction_loops_multiplicity(spark):
    from frog_spark.kg.analytics import label_propagation

    # self-loop dropped, reversed duplicate collapsed -> same single
    # edge as above; a loop-only node has no neighbors and is absent
    rows = [("a", "r", "b"), ("b", "q", "a"), ("w", "r", "w")]
    got = {r["node"]: r["label"]
           for r in label_propagation(_edges(spark, rows), iters=2).collect()}
    assert got == {"a": "a", "b": "b"}


def test_metapath_stats_degree_product(spark):
    from frog_spark.kg.analytics import metapath_stats

    rows = [
        # mid m: 2 p-edges in, 3 q-edges out -> 6 paths; mid m2: 1 in,
        # 1 out -> 1 path. (p,q) total: 7 paths over 2 mids.
        ("a", "p", "m"), ("b", "p", "m"),
        ("m", "q", "x"), ("m", "q", "y"), ("m", "q", "z"),
        ("c", "p", "m2"), ("m2", "q", "w"),
        # a duplicate edge must not inflate the counts
        ("a", "p", "m"),
    ]
    got = {(r["p"], r["q"]): (r["n_paths"], r["n_mid"])
           for r in metapath_stats(_edges(spark, rows)).collect()}
    assert got[("p", "q")] == (7, 2)
    # q-edges arrive at x/y/z/w, nothing departs them; p departs a/b/c,
    # nothing arrives there -> no (q, *) or (*, p) rows
    assert all(k == ("p", "q") for k in got)


def test_metapath_stats_chain_same_pred(spark):
    from frog_spark.kg.analytics import metapath_stats

    # a -p-> b -p-> c: one (p,p) path through mid b
    rows = [("a", "p", "b"), ("b", "p", "c")]
    got = {(r["p"], r["q"]): (r["n_paths"], r["n_mid"])
           for r in metapath_stats(_edges(spark, rows)).collect()}
    assert got == {("p", "p"): (1, 1)}


def _tedges(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_time_respecting_paths_forward_only(spark):
    from frog_spark.kg.analytics import time_respecting_paths

    rows = [
        ("a", "p", "m", "2024-01-01"), ("b", "p", "m", "2024-01-03"),
        ("m", "q", "x", "2024-01-02"), ("m", "q", "y", "2024-01-04"),
        ("m", "q", "x", "2024-01-02"),  # duplicate edge collapses
    ]
    got = {(r["p"], r["q"]): (r["n_paths"], r["n_mid"])
           for r in time_respecting_paths(_tedges(spark, rows)).collect()}
    # out@02 sees in@01 (1 path); out@04 sees in@01+in@03 (2 paths);
    # the untimed metapath count would say 2*2 = 4
    assert got == {("p", "q"): (3, 1)}


def test_time_respecting_paths_equal_ts_and_no_backward(spark):
    from frog_spark.kg.analytics import time_respecting_paths

    # same-instant hop counts (t2 >= t1); a strictly earlier out does not
    rows = [
        ("a", "p", "m", "2024-01-05"), ("m", "q", "x", "2024-01-05"),
        ("m", "q", "z", "2024-01-01"),
        # a second mid with only backward flow: no paths at all
        ("c", "p", "n", "2024-02-01"), ("n", "q", "w", "2024-01-15"),
    ]
    got = {(r["p"], r["q"]): (r["n_paths"], r["n_mid"])
           for r in time_respecting_paths(_tedges(spark, rows)).collect()}
    assert got == {("p", "q"): (1, 1)}


def test_personalized_pagerank_hand_computed_chain(spark):
    from frog_spark.kg.analytics import personalized_pagerank

    # S={a}, chain a->b->c, d=0.85, 2 iters:
    # r1 = (a .15, b .85, c 0); r2 = (a .15, b .1275, c .7225)
    rows = [("a", "r", "b"), ("b", "r", "c")]
    srcs = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["rank"]
           for r in personalized_pagerank(
               _edges(spark, rows), srcs, iters=2).collect()}
    assert got == {"a": 0.15, "b": 0.1275, "c": 0.7225}


def test_personalized_pagerank_mass_stays_near_seeds(spark):
    from frog_spark.kg.analytics import personalized_pagerank

    # two disconnected 2-cycles; seeding one leaves the other at 0 —
    # the locality property global pagerank doesn't have
    rows = [("a", "r", "b"), ("b", "r", "a"), ("x", "r", "y"), ("y", "r", "x")]
    srcs = spark.createDataFrame([("a",), ("ghost",)], "node string")
    got = {r["node"]: r["rank"]
           for r in personalized_pagerank(
               _edges(spark, rows), srcs, iters=4).collect()}
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["a"] > 0.0 and got["b"] > 0.0
    # 'ghost' is not a graph node: excluded from the restart vector,
    # so a's restart share is the full 1.0 (not 0.5) — and the seeded
    # 2-cycle has no dangling leak, so its total mass stays exactly 1
    assert abs(got["a"] + got["b"] - 1.0) < 1e-6

    empty_srcs = spark.createDataFrame([("ghost",)], "node string")
    assert personalized_pagerank(_edges(spark, rows), empty_srcs, iters=2).count() == 0


def _wedges(spark, rows):
    return spark.createDataFrame(rows, "subj string, obj string, weight double")


def test_weighted_distances_prefers_cheap_long_paths(spark):
    from frog_spark.kg.analytics import weighted_distances

    rows = [("a", "b", 10.0), ("a", "x", 1.0), ("x", "y", 1.0), ("y", "b", 1.0)]
    srcs = spark.createDataFrame([("a",)], "node string")
    k1 = {r["node"]: r["dist"]
          for r in weighted_distances(_wedges(spark, rows), srcs, k=1).collect()}
    assert k1["b"] == 10.0 and k1["x"] == 1.0 and "y" not in k1
    k3 = {r["node"]: r["dist"]
          for r in weighted_distances(_wedges(spark, rows), srcs, k=3).collect()}
    # the 3-hop detour at total weight 3 beats the direct 10 edge
    assert k3 == {"a": 0.0, "x": 1.0, "y": 2.0, "b": 3.0}


def test_weighted_distances_parallel_edges_and_convergence(spark):
    from frog_spark.kg.analytics import weighted_distances

    # parallel edges collapse to min weight; k far beyond the graph's
    # depth just converges (empty improvement frontier -> early exit)
    rows = [("a", "b", 5.0), ("a", "b", 2.0), ("b", "c", 1.0)]
    srcs = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in weighted_distances(_wedges(spark, rows), srcs, k=10).collect()}
    assert got == {"a": 0.0, "b": 2.0, "c": 3.0}


def test_weighted_distances_rejects_negative(spark):
    import pytest as _pytest

    from frog_spark.kg.analytics import weighted_distances

    rows = [("a", "b", -1.0)]
    srcs = spark.createDataFrame([("a",)], "node string")
    with _pytest.raises(ValueError):
        weighted_distances(_wedges(spark, rows), srcs, k=2)
