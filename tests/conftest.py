"""Shared test fixtures: one local SparkSession per test run, plus a
DuckDB-oracle comparison helper mirroring the driver's correctness gate."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("KMR_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMALL = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from kmr_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("kmr_spark_tests", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def normalize_rows(rows):
    """Canonical order-insensitive form: list of tuples sorted by repr."""
    out = [tuple(_norm(v) for v in r) for r in rows]
    return sorted(out, key=repr)


def assert_matches_oracle(spark, duck, query_fn, sql, sf_dir=SF_DIR):
    """Run the Spark query and the DuckDB oracle; compare multisets."""
    sdf = query_fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r[c] for c in spark_cols) for r in sdf.collect()]

    rel = duck.execute(sql)
    duck_cols_full = [d[0] for d in rel.description]
    order = sorted(range(len(duck_cols_full)), key=lambda i: duck_cols_full[i])
    duck_cols = [duck_cols_full[i] for i in order]
    duck_rows = [tuple(r[i] for i in order) for r in rel.fetchall()]

    assert spark_cols == duck_cols, f"column mismatch: {spark_cols} vs {duck_cols}"
    a, b = normalize_rows(spark_rows), normalize_rows(duck_rows)
    assert len(a) == len(b), f"row count {len(a)} vs oracle {len(b)}"
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{len(mismatches)} row mismatches; first: {mismatches[:3]}"
