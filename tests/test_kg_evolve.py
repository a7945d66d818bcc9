"""X41-X42: incremental fact merge + temporal validity windows
(kg/evolve.py). Driver-gate parity lives in __spark_entry__ (full
DuckDB oracles over the orders-derived observation stream); these
tests pin the semantics on hand-built observation sets.
"""

from datetime import datetime

from pyspark.sql import functions as F


def _obs(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, datetime(2024, 1, d)) for s, p, o, d in rows],
        "subj string, pred string, obj string, ts timestamp",
    )


def test_fact_windows_overlap_detection(spark):
    from frog_spark.kg.evolve import fact_windows

    rows = [
        # s/p: A seen days 1-5, B days 3-7 (overlap), C days 10-11 (clear)
        ("s", "p", "A", 1), ("s", "p", "A", 5),
        ("s", "p", "B", 3), ("s", "p", "B", 7),
        ("s", "p", "C", 10), ("s", "p", "C", 11),
        # different pred never conflicts across groups
        ("s", "q", "D", 4),
    ]
    got = {
        (r["subj"], r["pred"], r["obj"]): r
        for r in fact_windows(_obs(spark, rows)).collect()
    }
    a = got[("s", "p", "A")]
    assert (a["n_obs"], a["is_conflicted"]) == (2, True)
    assert a["first_seen"] == datetime(2024, 1, 1)
    assert a["last_seen"] == datetime(2024, 1, 5)
    assert got[("s", "p", "B")]["is_conflicted"] is True
    assert got[("s", "p", "C")]["is_conflicted"] is False
    assert got[("s", "q", "D")]["is_conflicted"] is False


def test_fact_windows_no_hull_false_positive(spark):
    """The case a naive group-envelope check gets wrong: three mutually
    DISJOINT windows where the middle one sits inside the hull of the
    other two — none may be flagged."""
    from frog_spark.kg.evolve import fact_windows

    rows = [
        ("s", "p", "A", 1), ("s", "p", "A", 2),
        ("s", "p", "B", 8), ("s", "p", "B", 9),
        ("s", "p", "C", 4), ("s", "p", "C", 5),
    ]
    got = fact_windows(_obs(spark, rows)).collect()
    assert all(r["is_conflicted"] is False for r in got)
    # and a wide fact covering later narrow ones flags ALL of them
    rows2 = [
        ("s", "p", "A", 1), ("s", "p", "A", 20),
        ("s", "p", "B", 3), ("s", "p", "C", 6),
    ]
    got2 = fact_windows(_obs(spark, rows2)).collect()
    assert all(r["is_conflicted"] is True for r in got2)


def test_merge_triples_labels_and_windows(spark):
    from frog_spark.kg.evolve import merge_triples, summarize_facts

    base_obs = _obs(spark, [
        ("s", "p", "A", 1), ("s", "p", "A", 3),   # updated by batch
        ("s", "p", "B", 2),                         # base-only
    ])
    batch_obs = _obs(spark, [
        ("s", "p", "A", 7),                         # extends A's window
        ("s", "p", "C", 5),                         # new fact
    ])
    got = {
        r["obj"]: r
        for r in merge_triples(
            summarize_facts(base_obs), summarize_facts(batch_obs)
        ).collect()
    }
    a = got["A"]
    assert (a["change"], a["n_obs"]) == ("updated", 3)
    assert a["first_seen"] == datetime(2024, 1, 1)
    assert a["last_seen"] == datetime(2024, 1, 7)
    assert (got["B"]["change"], got["B"]["n_obs"]) == ("unchanged", 1)
    assert (got["C"]["change"], got["C"]["n_obs"]) == ("inserted", 1)


def test_facts_asof_snapshot_and_ranking(spark):
    from frog_spark.kg.evolve import facts_asof, summarize_facts

    rows = [
        # A: window days 1-10, 3 obs; B: days 2-12, 2 obs; C: days 20-21
        ("s", "p", "A", 1), ("s", "p", "A", 5), ("s", "p", "A", 10),
        ("s", "p", "B", 2), ("s", "p", "B", 12),
        ("s", "p", "C", 20), ("s", "p", "C", 21),
        ("t", "p", "D", 5), ("t", "p", "D", 9),
        # a point-window fact observed ONCE before T is not active at
        # T: validity is window containment, not observed-before
        ("t", "q", "E", 4),
    ]
    facts = summarize_facts(_obs(spark, rows))
    got = {
        (r["subj"], r["pred"], r["obj"]): r
        for r in facts_asof(facts, datetime(2024, 1, 6)).collect()
    }
    # C's window doesn't contain day 6; A outranks B on n_obs
    assert set(got) == {("s", "p", "A"), ("s", "p", "B"), ("t", "p", "D")}
    assert got[("s", "p", "A")]["pos"] == 1
    assert got[("s", "p", "B")]["pos"] == 2
    assert got[("t", "p", "D")]["pos"] == 1
    # at day 12 only B remains active for (s, p): it is now pos 1
    later = {
        r["obj"]: r["pos"]
        for r in facts_asof(facts, datetime(2024, 1, 12))
        .filter(F.col("subj") == "s")
        .collect()
    }
    assert later == {"B": 1}
    # equal n_obs: later last_seen wins, then obj asc breaks exact ties
    tie_rows = [
        ("u", "p", "X", 1), ("u", "p", "X", 4),
        ("u", "p", "Y", 1), ("u", "p", "Y", 6),
        ("u", "p", "Z", 1), ("u", "p", "Z", 6),
    ]
    tie = {
        r["obj"]: r["pos"]
        for r in facts_asof(
            summarize_facts(_obs(spark, tie_rows)), datetime(2024, 1, 2)
        ).collect()
    }
    assert tie == {"Y": 1, "Z": 2, "X": 3}


def test_snapshot_diff_labels(spark):
    from frog_spark.kg.evolve import snapshot_diff, summarize_facts

    rows = [
        # (s,p): A wins at day 3 (2 obs), B wins at day 9 -> changed
        ("s", "p", "A", 2), ("s", "p", "A", 4),
        ("s", "p", "B", 8), ("s", "p", "B", 10),
        # (s,q): only active around day 3 -> removed by day 9
        ("s", "q", "C", 2), ("s", "q", "C", 4),
        # (t,p): only active around day 9 -> added
        ("t", "p", "D", 8), ("t", "p", "D", 10),
        # (u,p): same obj active at both -> unchanged
        ("u", "p", "E", 1), ("u", "p", "E", 12),
    ]
    facts = summarize_facts(_obs(spark, rows))
    got = {
        (r["subj"], r["pred"]): r
        for r in snapshot_diff(
            facts, datetime(2024, 1, 3), datetime(2024, 1, 9)
        ).collect()
    }
    r = got[("s", "p")]
    assert (r["obj_before"], r["obj_after"], r["change"]) == ("A", "B", "changed")
    r = got[("s", "q")]
    assert (r["obj_before"], r["obj_after"], r["change"]) == ("C", None, "removed")
    r = got[("t", "p")]
    assert (r["obj_before"], r["obj_after"], r["change"]) == (None, "D", "added")
    r = got[("u", "p")]
    assert (r["obj_before"], r["obj_after"], r["change"]) == ("E", "E", "unchanged")


def test_scd2_history_runs_and_ranges(spark):
    from frog_spark.kg.evolve import SCD2_OPEN_END, scd2_history

    rows = [
        # A,A | B | A  -> three runs, the repeat of A is a NEW run
        ("s", "p", "A", 1), ("s", "p", "A", 3),
        ("s", "p", "B", 5),
        ("s", "p", "A", 8),
        # exact duplicate observations collapse INTO n_obs
        ("t", "p", "X", 2), ("t", "p", "X", 2), ("t", "p", "X", 4),
    ]
    got = sorted(
        (
            (r["subj"], r["run_id"], r["obj"], r["n_obs"],
             r["valid_from"].day, str(r["valid_to"]))
            for r in scd2_history(_obs(spark, rows)).collect()
        )
    )
    open_end = SCD2_OPEN_END
    assert got == [
        ("s", 1, "A", 2, 1, "2024-01-05 00:00:00"),
        ("s", 2, "B", 1, 5, "2024-01-08 00:00:00"),
        ("s", 3, "A", 1, 8, open_end),
        ("t", 1, "X", 3, 2, open_end),
    ]
    # ranges chain gaplessly: every non-open valid_to equals the next
    # run's valid_from
    hist = scd2_history(_obs(spark, rows)).collect()
    by_run = {}
    for r in hist:
        by_run.setdefault((r["subj"], r["pred"]), []).append(r)
    for runs in by_run.values():
        runs.sort(key=lambda r: r["run_id"])
        for a, b in zip(runs, runs[1:]):
            assert a["valid_to"] == b["valid_from"]


def test_scd2_history_same_ts_tie_orders_by_obj(spark):
    """Two different objs at the SAME timestamp: the (ts, obj) order
    puts A before B deterministically, so runs are A then B."""
    from frog_spark.kg.evolve import scd2_history

    rows = [("s", "p", "B", 5), ("s", "p", "A", 5)]
    got = [
        (r["run_id"], r["obj"])
        for r in sorted(
            scd2_history(_obs(spark, rows)).collect(),
            key=lambda r: r["run_id"],
        )
    ]
    assert got == [(1, "A"), (2, "B")]


def test_evolve_degenerate_inputs(spark):
    """Empty sides and out-of-range timestamps: every operator returns
    an empty/one-sided result with its schema intact."""
    from frog_spark.kg.evolve import (
        facts_asof,
        fact_windows,
        merge_triples,
        scd2_history,
        snapshot_diff,
        summarize_facts,
    )

    empty = _obs(spark, [])
    some = _obs(spark, [("s", "p", "A", 1), ("s", "p", "A", 5)])
    f_empty, f_some = summarize_facts(empty), summarize_facts(some)
    # merge with an empty side: everything inserted / unchanged
    ins = merge_triples(f_empty, f_some).collect()
    assert [r["change"] for r in ins] == ["inserted"]
    unch = merge_triples(f_some, f_empty).collect()
    assert [r["change"] for r in unch] == ["unchanged"]
    assert merge_triples(f_empty, f_empty).count() == 0
    # windows / history / snapshot over nothing
    assert fact_windows(empty).count() == 0
    assert scd2_history(empty).count() == 0
    assert snapshot_diff(f_empty, datetime(2024, 1, 1), datetime(2024, 1, 2)).count() == 0
    # as-of outside every window: empty, schema intact
    before = facts_asof(f_some, datetime(2023, 1, 1))
    assert before.count() == 0
    assert before.columns == [
        "subj", "pred", "obj", "n_obs", "first_seen", "last_seen", "pos"
    ]


def test_x41_x42_plans_stay_jvm_side(spark):
    import contextlib
    import io

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    qs = entry.queries()
    for name in ("kg_fact_windows", "kg_merge_triples"):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf).explain("formatted")
        p = buf.getvalue()
        assert "BatchEvalPython" not in p and "MapInPandas" not in p, name
        assert "ArrowEvalPython" not in p, name
        assert "CartesianProduct" not in p, name


def test_fact_churn_periods(spark):
    from frog_spark.kg.evolve import fact_churn

    rows = [
        # fact A: born Jan, last seen Mar; fact B: lives only in Jan;
        # fact C (other pred): born Mar
        ("s", "p", "A", "2024-01-05"), ("s", "p", "A", "2024-03-20"),
        ("s", "p", "B", "2024-01-10"),
        ("s", "q", "C", "2024-03-01"),
    ]
    obs = spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {(r["pred"], str(r["period"])[:7]): (r["n_new"], r["n_last_seen"], r["net"])
           for r in fact_churn(obs).collect()}
    assert got == {
        ("p", "2024-01"): (2, 1, 1),   # A and B born; B's last obs
        ("p", "2024-03"): (0, 1, -1),  # A last seen
        ("q", "2024-03"): (1, 1, 0),   # C born and (so far) last seen
    }
