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
