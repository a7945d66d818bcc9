"""Golden-parquet regression checks (the Spark analogue of the
reference's tst.sh golden diffs, reference/src/tst.sh:1-4).

The driver's correctness gate compares every kg_* query against the
committed golden at sf0.01; this test repeats the cheapest full-pipeline
one (kg_triples: tokenize -> tag -> lemmatize -> MBMA -> NER -> MWU ->
parse -> triple lift over the synthetic 240-turn corpus) inside pytest so
a regression is caught before the driver ever runs. Regenerate
deliberately with scripts/make_goldens.py after an intentional model or
operator change."""

from __future__ import annotations

import os

import pandas as pd

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources", "golden")


def test_kg_triples_matches_golden(spark):
    import __spark_entry__ as entry

    got = (
        entry.queries()["kg_triples"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .reset_index(drop=True)
    )
    want = pd.read_parquet(os.path.join(GOLDEN_DIR, "kg_triples.parquet"))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_golden_oracle_sql_is_readable():
    """Every golden oracle entry must point at an existing parquet file
    that DuckDB can read with a non-empty result."""
    import duckdb

    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for name in (
        "kg_annotated",
        "kg_entity_spans",
        "kg_triples",
        "kg_canonical_nodes",
        "kg_cooccur_topk",
        "kg_two_hop",
    ):
        assert name in oracles
        df = con.execute(oracles[name]).df()
        assert len(df) > 0, name
