"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB —
row count, column names, and (rounded) values must match exactly."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            continue
        if np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].astype(np.float64).round(9)
        elif np.issubdtype(pdf[c].dtype, np.integer):
            pdf[c] = pdf[c].astype(np.int64)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


ALL = sorted(entrymod.queries())
ORACLES = entrymod.oracle_sql()


def test_every_query_has_callable_and_most_have_oracles():
    missing = [k for k in ORACLES if k not in ALL]
    assert not missing, f"oracle without query: {missing}"
    no_oracle = [k for k in ALL if k not in ORACLES]
    # every entry is SQL-checkable now — the stemmed analyzer included,
    # via the (term, stem) side parquet its entry refreshes (r5)
    assert not no_oracle, f"query without oracle: {no_oracle}"


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, con, name):
    fn = entrymod.queries()[name]
    got = fn(spark, SF).toPandas()
    assert got is not None
    if name not in ORACLES:
        assert len(got) > 0, f"{name}: rows-only check empty"
        return
    expect = con.sql(ORACLES[name]).df()
    g, e = _normalize(got), _normalize(expect)
    assert list(g.columns) == list(e.columns), (name, list(g.columns), list(e.columns))
    assert len(g) == len(e), (name, len(g), len(e))
    for c in g.columns:
        if np.issubdtype(np.asarray(g[c]).dtype, np.floating) or np.issubdtype(
            np.asarray(e[c]).dtype, np.floating
        ):
            np.testing.assert_allclose(
                np.asarray(g[c], dtype=np.float64),
                np.asarray(e[c], dtype=np.float64),
                atol=1e-9, err_msg=f"{name}.{c}",
            )
        else:
            assert g[c].tolist() == e[c].tolist(), f"{name}.{c}"


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert {"doc_id", "source", "lang", "score"} <= set(out.columns)
