"""X57-X58: KG training-data export — deterministic neighbor sampling
and hash-ring negative sampling (kg/sampling.py). Driver-gate parity
(full DuckDB oracles) lives in __spark_entry__; here the hash ring is
replicated in pure Python and the determinism/partition-invariance
properties are pinned.
"""

import hashlib

from pyspark.sql import functions as F


def _edges(spark, rows, cols="subj string, pred string, obj string"):
    return spark.createDataFrame(rows, cols)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_neighbor_sample_caps_and_ranks(spark):
    from frog_spark.kg.sampling import neighbor_sample

    rows = [("hub", "r", f"n{i}") for i in range(5)] + [
        ("hub", "q", "n0"),  # duplicate pair under another pred collapses
        ("x", "r", "hub"),   # in-edge: must not count as hub's out-nbr
    ]
    got = neighbor_sample(_edges(spark, rows), k=3).collect()
    hub = sorted(
        (r["sample_rank"], r["nbr"]) for r in got if r["node"] == "hub"
    )
    assert [rk for rk, _ in hub] == [1, 2, 3]
    # the expected order is the md5 order of 'hub\x1f<nbr>'
    want = sorted((f"n{i}" for i in range(5)), key=lambda n: _md5(f"hub\x1f{n}"))[:3]
    assert [n for _, n in sorted(hub)] == want
    # x has a single out-neighbor; k larger than degree keeps them all
    assert [(r["nbr"], r["sample_rank"]) for r in got if r["node"] == "x"] == [
        ("hub", 1)
    ]


def test_neighbor_sample_partition_invariant(spark):
    from frog_spark.kg.sampling import neighbor_sample

    rows = [(f"s{i % 7}", "r", f"o{i}") for i in range(60)]
    a = neighbor_sample(_edges(spark, rows), k=4)
    b = neighbor_sample(_edges(spark, rows).repartition(13), k=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_negative_samples_match_python_ring(spark):
    from frog_spark.kg.sampling import negative_samples

    rows = [
        ("a", "p", "b"), ("b", "p", "c"), ("c", "q", "a"), ("a", "q", "d"),
    ]
    got = {
        (r["subj"], r["pred"], r["obj"]): r["neg_obj"]
        for r in negative_samples(_edges(spark, rows)).collect()
    }
    nodes = sorted({"a", "b", "c", "d"}, key=_md5)
    for s, p, o in [("a", "p", "b"), ("b", "p", "c"), ("c", "q", "a"), ("a", "q", "d")]:
        g = int(_md5(f"{s}\x1f{p}\x1f{o}#neg")[:15], 16) % len(nodes)
        want = nodes[g]
        if want == o:  # true-object hits are dropped, not re-drawn
            assert (s, p, o) not in got
        else:
            assert got[(s, p, o)] == want


def test_negative_samples_properties(spark):
    from frog_spark.kg.sampling import negative_samples

    rows = [(f"s{i}", "p", f"o{i % 11}") for i in range(50)]
    out = negative_samples(_edges(spark, rows)).collect()
    vocab = {f"s{i}" for i in range(50)} | {f"o{i}" for i in range(11)}
    for r in out:
        assert r["neg_obj"] in vocab
        assert r["neg_obj"] != r["obj"]
    # deterministic under repartitioning
    out2 = negative_samples(_edges(spark, rows).repartition(9)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_sampling_empty_inputs(spark):
    from frog_spark.kg.sampling import negative_samples, neighbor_sample

    empty = _edges(spark, [])
    assert neighbor_sample(empty, k=3).count() == 0
    got = negative_samples(empty)
    assert got.count() == 0
    assert got.columns == ["subj", "pred", "obj", "neg_obj"]


def _py_walk(adjacency: dict, start: str, k: int):
    """Pure-Python replication of random_walks' hash draws."""
    ranked = {
        n: sorted(nbrs, key=lambda x, n=n: _md5(f"{n}\x1f{x}"))
        for n, nbrs in adjacency.items()
    }
    path, cur = [(0, start)], start
    for i in range(1, k + 1):
        nbrs = ranked.get(cur)
        if not nbrs:
            break
        g = int(_md5(f"{start}\x1f{i}\x1f{cur}")[:15], 16) % len(nbrs)
        cur = nbrs[g]  # rank g+1 in 1-based terms
        path.append((i, cur))
    return path


def test_random_walks_match_python_and_stop_at_sinks(spark):
    from frog_spark.kg.sampling import random_walks

    rows = [("a", "r", "b"), ("a", "r", "c"), ("b", "r", "c")]  # c is a sink
    adjacency = {"a": ["b", "c"], "b": ["c"]}
    got = {}
    for r in random_walks(_edges(spark, rows), k=3).collect():
        got.setdefault(r["walk_id"], []).append((r["step"], r["node"]))
    # starts default to out-degreed nodes: a and b, never the sink c
    assert set(got) == {"a", "b"}
    for start in ("a", "b"):
        assert sorted(got[start]) == _py_walk(adjacency, start, 3)
    # b's walk is forced to c and stops there: steps 0 and 1 only
    assert sorted(got["b"]) == [(0, "b"), (1, "c")]


def test_random_walks_sources_and_partition_invariance(spark):
    from frog_spark.kg.sampling import random_walks

    rows = [(f"n{i}", "r", f"n{(i * 3 + 1) % 10}") for i in range(10)]
    srcs = spark.createDataFrame([("n0",), ("n5",)], "node string")
    a = random_walks(_edges(spark, rows), k=5, sources=srcs)
    b = random_walks(_edges(spark, rows).repartition(7), k=5, sources=srcs)
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb
    assert {t[0] for t in ra} == {"n0", "n5"}
    # every walker on this sink-free graph takes all 5 steps
    assert len(ra) == 12


def test_walks_traverse_only_real_edges(spark):
    """Cross-operator consistency: every consecutive (step i -> i+1)
    pair in the walk corpus is an edge of the input graph, and every
    sampled neighbor is a real out-neighbor — the property a
    representation-learning consumer silently depends on."""
    from frog_spark.kg.sampling import neighbor_sample, random_walks

    rows = [(f"n{i}", "r", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    edges = _edges(spark, rows)
    eset = {(s, o) for s, _, o in rows}
    walks = {}
    for r in random_walks(edges, k=4).collect():
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    n_hops = 0
    for path in walks.values():
        for i in range(1, max(path) + 1):
            assert (path[i - 1], path[i]) in eset
            n_hops += 1
    assert n_hops > 0
    for r in neighbor_sample(edges, k=3).collect():
        assert (r["node"], r["nbr"]) in eset
