"""X31-X33: conversation stats, bigram-LM surprisal, canned-response
mining (operators/transcripts.py).

Driver-gate parity lives in __spark_entry__ (each has a full DuckDB
oracle); these tests pin the semantics on hand-built corpora where the
expected numbers are checkable by hand, plus the plan-shape gates.
"""

import math

from pyspark.sql import functions as F


def test_conv_stats_fields(spark):
    from frog_spark.operators.transcripts import conv_stats

    rows = [
        # conv A: turns 0,1,2,4 (gap at 3); roles u,a,a,u (1 violation);
        # one tool call; 2+3+1+2 = 8 tokens
        ("A", 0, "user", "hallo daar", None),
        ("A", 1, "assistant", "dag meneer jansen", "search"),
        ("A", 2, "assistant", "nog", None),
        ("A", 4, "user", "tot ziens", None),
        # conv B: single turn, no violations possible
        ("B", 0, "user", "een twee drie", None),
    ]
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {r["conv_id"]: r for r in conv_stats(tdf).collect()}
    a = got["A"]
    assert a["n_turns"] == 4 and a["n_user"] == 2 and a["n_assistant"] == 2
    assert a["n_tool_calls"] == 1
    assert a["n_tokens"] == 8 and a["mean_turn_tokens"] == 2.0
    assert a["alternation_violations"] == 1
    assert a["missing_turns"] == 1  # the hole at turn 3
    b = got["B"]
    assert b["n_turns"] == 1 and b["alternation_violations"] == 0
    assert b["missing_turns"] == 0


def test_bigram_surprisal_formula(spark):
    from frog_spark.operators.transcripts import bigram_surprisal

    rows = [(0, "a b"), (1, "a c"), (2, "x")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_surprisal(d).collect()}
    # corpus bigrams: 'a b' x1, 'a c' x1 -> c1(a)=2, V(left words)=1, k=0.5
    # s = -log2((1 + .5) / (2 + .5*1)) = -log2(0.6)
    expect = round(-math.log2(1.5 / 2.5), 6)
    assert got[0]["n_bigrams"] == 1 and got[0]["avg_bigram_surprisal"] == expect
    assert got[1]["avg_bigram_surprisal"] == expect
    # single-token doc: no bigrams, surprisal 0.0 (not null, not dropped)
    assert got[2]["n_bigrams"] == 0 and got[2]["avg_bigram_surprisal"] == 0.0
    # repeated bigram is weighted, not deduped: 'a b a b' has 'a b' x2 + 'b a' x1
    d2 = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    r2 = bigram_surprisal(d2).collect()[0]
    assert r2["n_bigrams"] == 3


def test_canned_turns_mining(spark):
    from frog_spark.operators.transcripts import canned_turns

    rows = [
        ("c1", "Bedankt voor uw bericht"),
        ("c2", "bedankt  voor uw bericht"),   # same after normalization
        ("c3", "BEDANKT VOOR UW BERICHT"),
        ("c4", "uniek antwoord hier"),
        ("c5", "dubbel in een conv"),
        ("c5", "dubbel in een conv"),          # same conv twice: 1 distinct
    ]
    tdf = spark.createDataFrame(rows, "conv_id string, text string")
    got = canned_turns(tdf, min_convs=3).collect()
    assert len(got) == 1
    assert got[0]["n_convs"] == 3 and got[0]["n_turns"] == 3
    # example_text is the lexicographically smallest RAW variant
    assert got[0]["example_text"] == "BEDANKT VOOR UW BERICHT"
    # threshold 2 picks up nothing extra (c5's dup is within one conv)
    got2 = canned_turns(tdf, min_convs=2).collect()
    assert len(got2) == 1


def test_transcript_plans_stay_jvm_side(spark):
    """X31-X33 plan-shape gates (mirrors the BASELINE.md audit rows)."""
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

    for name in ("conv_session_stats", "txt_bigram_surprisal",
                 "conv_canned_turns"):
        p = plan(name)
        assert "BatchEvalPython" not in p and "MapInPandas" not in p, name
        assert "ArrowEvalPython" not in p, name

    # conv_stats: the lag window and the per-conv aggregate share ONE
    # conv_id hash partitioning (single shuffle for the whole operator)
    p = plan("conv_session_stats")
    assert p.count("hashpartitioning(conv_id") == 1

    # bigram: after the eager checkpoint of the (doc, bigram) counts,
    # the only parquet read left in the final plan is the id column for
    # the left-join recovery — the corpus text is scanned exactly once
    # (inside the checkpoint job), all model tables derive from the
    # materialized counts
    df = qs["txt_bigram_surprisal"](spark, sf)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "+- == Initial Plan =="
    )[0]
    text_scans = [
        l for l in final.splitlines()
        if "FileScan parquet" in l and "text#" in l
    ]
    assert not text_scans, text_scans


def test_context_windows_straddle_and_fill(spark):
    """X39: stream-offset packing at conversation grain. With
    overhead=2 and max_tokens=10, turn costs 5,5,5,3 give offsets
    0,5,10,15 -> windows 0,0,1,1; the conv is independent of a second
    single-turn conv."""
    from frog_spark.operators.transcripts import context_windows

    rows = [
        ("A", 0, "u", "w w w", None),      # cost 3+2 = 5, offset 0  -> win 0
        ("A", 1, "a", "x x x", None),      # cost 5, offset 5        -> win 0
        ("A", 2, "u", "y y y", None),      # cost 5, offset 10       -> win 1
        ("A", 3, "a", "z", None),          # cost 3, offset 15       -> win 1
        ("B", 0, "u", "een twee", None),   # cost 4, offset 0        -> win 0
    ]
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {
        (r["conv_id"], r["window_id"]): r
        for r in context_windows(tdf, max_tokens=10, overhead=2).collect()
    }
    a0 = got[("A", 0)]
    assert (a0["n_turns"], a0["first_turn"], a0["last_turn"]) == (2, 0, 1)
    assert (a0["cost_tokens"], a0["fill"]) == (10, 1.0)
    a1 = got[("A", 1)]
    assert (a1["n_turns"], a1["cost_tokens"], a1["fill"]) == (2, 8, 0.8)
    assert got[("B", 0)]["n_turns"] == 1
    # deterministic under repartitioning
    got_rep = {
        (r["conv_id"], r["window_id"]): r["cost_tokens"]
        for r in context_windows(
            tdf.repartition(7), max_tokens=10, overhead=2
        ).collect()
    }
    assert got_rep == {k: v["cost_tokens"] for k, v in got.items()}


def test_tool_transitions_markov(spark):
    """X40: action = coalesce(tool, role); per-conv lag; probabilities
    normalize per from_action; conversation boundaries produce no
    transition."""
    from frog_spark.operators.transcripts import tool_transitions

    rows = [
        ("A", 0, "user", "q", None),
        ("A", 1, "assistant", "a", "search"),   # user -> search
        ("A", 2, "assistant", "a", None),       # search -> assistant
        ("A", 3, "user", "q", None),            # assistant -> user
        ("A", 4, "assistant", "a", "search"),   # user -> search
        ("A", 5, "assistant", "a", "code"),     # search -> code
        ("B", 0, "assistant", "hi", None),      # boundary: NO user->assistant
        ("B", 1, "user", "q", None),            # assistant -> user
    ]
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {
        (r["from_action"], r["to_action"]): (r["n"], r["p"])
        for r in tool_transitions(tdf).collect()
    }
    assert got[("user", "search")] == (2, 1.0)
    assert got[("search", "assistant")] == (1, 0.5)
    assert got[("search", "code")] == (1, 0.5)
    assert got[("assistant", "user")] == (2, 1.0)
    # exactly these four: the A-end -> B-start pair never appears
    assert len(got) == 4


def test_x39_x40_plans_single_conv_shuffle(spark):
    """X39/X40 plan gates: pure JVM; X39's running-sum window and
    aggregate share ONE hashpartitioning(conv_id) exchange."""
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

    for name in ("conv_context_windows", "conv_tool_transitions"):
        p = plan(name)
        assert "BatchEvalPython" not in p and "MapInPandas" not in p, name
        assert "ArrowEvalPython" not in p, name

    # X39: the offset window partitions by conv_id and the (conv_id,
    # window_id) aggregate reuses that partitioning — one data shuffle
    p = plan("conv_context_windows")
    assert p.count("hashpartitioning") == 1, p
