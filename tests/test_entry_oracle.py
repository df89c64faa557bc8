"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.001, compare
row-count + column names + order-insensitive value sets."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as ENTRY  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
# data-dependent oracle generators (ann_ivf centroids) read this env var —
# pin it so both engines see the same tables even when it wasn't set
os.environ["ORACLE_SF_DIR"] = SF_DIR


def _duck():
    con = duckdb.connect()
    for t in ENTRY.TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(pdf: pd.DataFrame) -> list:
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for tup in pdf.itertuples(index=False):
        rows.append(tuple(str(v) for v in tup))
    return sorted(rows)


QUERIES = ENTRY.queries()
ORACLES = ENTRY.oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = ENTRY.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    con = _duck()
    want = con.sql(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    g, w = _normalize(got), _normalize(want)
    mismatches = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:5]
    assert g == w, f"{name}: first mismatching rows {[(g[i], w[i]) for i in mismatches]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
