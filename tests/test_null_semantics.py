"""Null-semantics audit of the round-5 window queries (VERDICT r4 #7).

The driver's synthetic tables are null-free in every column (checked:
zero nulls at all SFs), so the correctness gate can never exercise the
null branches of queries that compare nullable columns — the class of
bug the r4 SCD2 eqNullSafe fix belonged to. These tests re-run the
full Spark-vs-DuckDB oracle compare on COPIES of the sf0.001 tables
with nulls injected into the driving columns (ts, event_type, props,
value, user_id, o_orderdate, o_custkey), using the driver's exact
compare rules (sorted columns, bit-exact floats, None-safe row sort).

Queries covered: every r5-window query whose logic compares a nullable
column where engines could plausibly diverge — window ORDER BY over a
null key (Spark NULLS FIRST vs DuckDB NULLS LAST), lag/lead adjacency,
as-of matching, equality filters, JSON extraction, distinct/join keys.
"""

from __future__ import annotations

import os
import struct

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_SMALL = "/root/testdata/sf0.001"

# r5-window queries that compare nullable columns, with the columns we
# poison for each (everything else in the row stays realistic)
NULL_QUERIES = [
    "events_props_schema_infer",
    "events_asof_click_attrib",
    "events_cart_abandonment",
    "events_retention_day_n",
    "events_user_streaks",
    "events_type_share_drift",
    "orders_interpurchase_gaps",
]


def _poison(table: pa.Table, poisons: list[dict]) -> pa.Table:
    """Clone the first row of ``table`` once per poison dict, applying
    the dict's column overrides (None = inject null), and append."""
    base = table.slice(0, 1).to_pylist()[0]
    rows = []
    for i, p in enumerate(poisons):
        r = dict(base)
        r.update(p)
        rows.append(r)
    extra = pa.Table.from_pylist(rows, schema=table.schema)
    return pa.concat_tables([table, extra])


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulldata")
    ev = pq.read_table(os.path.join(SF_SMALL, "events.parquet"))
    # a real user with activity, to attach poisons to existing history
    uid = ev.column("user_id")[0].as_py()
    ts0 = ev.column("ts")[0].as_py()
    ev2 = _poison(ev, [
        {"event_id": -1, "ts": None, "user_id": uid,
         "event_type": "click"},
        {"event_id": -2, "ts": None, "user_id": uid,
         "event_type": "purchase"},
        {"event_id": -3, "event_type": None, "user_id": uid},
        {"event_id": -4, "props": None},
        {"event_id": -5, "value": None, "event_type": "click"},
        {"event_id": -6, "user_id": None, "event_type": "click"},
        {"event_id": -7, "user_id": None, "ts": None,
         "event_type": None, "value": None, "props": None},
    ])
    pq.write_table(ev2, str(d / "events.parquet"))

    orders = pq.read_table(os.path.join(SF_SMALL, "orders.parquet"))
    ck = orders.column("o_custkey")[0].as_py()
    o2 = _poison(orders, [
        {"o_orderkey": -1, "o_orderdate": None, "o_custkey": ck},
        {"o_orderkey": -2, "o_orderdate": None, "o_custkey": ck},
        {"o_orderkey": -3, "o_custkey": None},
    ])
    pq.write_table(o2, str(d / "orders.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def null_duck(null_dir):
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{null_dir}/{t}.parquet')")
    yield con
    con.close()


def test_injection_has_nulls(null_dir, null_duck):
    """Guard against a vacuous audit: the poisoned tables must actually
    contain nulls in every driving column."""
    for t, cols in (("events", ["ts", "event_type", "props", "value",
                                "user_id"]),
                    ("orders", ["o_orderdate", "o_custkey"])):
        for c in cols:
            n = null_duck.execute(
                f"SELECT COUNT(*) FROM {t} WHERE {c} IS NULL").fetchone()[0]
            assert n > 0, f"{t}.{c} has no injected nulls"


def _exact_cell(v):
    return struct.pack("<d", v) if isinstance(v, float) else v


@pytest.mark.parametrize("name", NULL_QUERIES)
def test_null_injected_oracle_match(spark, null_dir, null_duck, name):
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    sdf = qs[name](spark, null_dir)
    scols = sorted(sdf.columns)
    keyf = lambda row: tuple((v is None, repr(v)) for v in row)
    srows = sorted(
        [tuple(_exact_cell(r[c]) for c in scols) for r in sdf.collect()],
        key=keyf)
    rel = null_duck.execute(osql[name])
    dcols = [c[0] for c in rel.description]
    idx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    drows = sorted(
        [tuple(_exact_cell(r[i]) for i in idx) for r in rel.fetchall()],
        key=keyf)
    assert scols == sorted(dcols)
    assert srows == drows, (
        f"{name}: Spark and oracle diverge under injected nulls\n"
        f"spark rows {len(srows)} oracle rows {len(drows)}\n"
        f"spark-only: {[r for r in srows if r not in drows][:3]}\n"
        f"oracle-only: {[r for r in drows if r not in srows][:3]}")
