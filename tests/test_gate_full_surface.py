"""Full-surface gate: EVERY __spark_entry__.queries() entry vs its
DuckDB/frozen oracle, in-suite (round-4 verdict #1).

The driver's correctness harness checks only the first 50 registry
queries, so a sixth of the surface used to ship driver-unverified each
round; this module makes `pytest tests/` green MEAN full-surface green.
Runs at sf0.01 — the scale the frozen oracles are pinned at (the
driver's own gate scale). Queries without an oracle_sql entry get the
driver's weaker rows-only check (>=1 row, stable schema)."""

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_QUERIES = list(entrymod.queries())
_ORACLES = entrymod.oracle_sql()


def test_every_oracle_names_a_query():
    """oracle_sql() keys must be a subset of queries() — a stale key
    would silently check nothing."""
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", _QUERIES)
def test_gate_full_surface(spark, duck, name):
    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    if name not in _ORACLES:
        # driver's rows-only fallback for non-SQL-expressible queries
        assert len(got) >= 1
        return
    want = duck.execute(_ORACLES[name]).df()
    g, w = _normalize(got), _normalize(want)
    assert list(g.columns) == list(w.columns)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(
        g, w, check_dtype=False, check_exact=False, atol=1e-6
    )
