"""Mimic the driver's correctness gate locally: for every query in the
contract, run the Spark version and the DuckDB oracle at sf0.01 and
compare row count, column names, and (order-insensitively) every value
EXACTLY — stricter than a tolerance check, so anything that passes
here should hash-match in CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from medallion_etl_spark.operators import collect_queries

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        # keep the FLOAT-NESS visible: Python's 1 == 1.0 would hide an
        # engine dtype mismatch (e.g. a DuckDB HUGEINT window sum that
        # pandas renders float64 vs Spark's int64) that a byte-level
        # value hash in the external harness does NOT forgive
        return ("f", float(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


NAMES = sorted(collect_queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_small, name):
    fn, sql = collect_queries()[name]
    got = fn(spark, sf_small).toPandas()
    assert len(got) >= 0
    if sql is None:
        assert len(got) > 0, f"{name}: rows-only check needs >0 rows"
        return
    con = _duck(sf_small)
    exp = con.sql(sql).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows vs oracle {len(exp)}"
    g, e = _canon(got), _canon(exp)
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
    assert not bad, f"{name}: {len(bad)} mismatched rows; first 3: {bad[:3]}"


@pytest.mark.smoke
def test_smoke_one_query_matches_oracle(spark, sf_tiny):
    """The `-m smoke` subset's oracle leg: one representative query
    (scan -> filter -> agg -> sort) against DuckDB at sf0.001, so a
    pre-commit smoke run still exercises the full driver-contract
    compare path without the ~16-minute full parity sweep."""
    fn, sql = collect_queries()["pricing_summary"]
    got = fn(spark, sf_tiny).toPandas()
    con = _duck(sf_tiny)  # keep the connection alive past .sql()
    exp = con.sql(sql).df()
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp) > 0
    assert _canon(got) == _canon(exp)
