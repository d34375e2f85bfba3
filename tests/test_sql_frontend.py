"""SQL front-end parity: the ANSI oracle strings run unchanged on
spark.sql() and produce the same results as the DataFrame plans —
users can address the engine through either API (kmr4py's dual-surface
analogue: reference python3/kmr4py.py wraps the same C core)."""

import math

import pytest

from kmr_spark.session import register_views
from tests.conftest import SF_DIR, normalize_rows

# oracle SQL that is pure ANSI (no DuckDB list/epoch functions)
ANSI_QUERIES = [
    "tpch_q7",
    "tpch_q9",
    "tpch_q10",
    "tpch_q13",
    "tpch_q21",
    "nation_balance_full_outer",
    "events_value_histogram",
    "events_exact_percentiles",
    # round-3 families whose oracles are pure ANSI
    "events_funnel",
    "events_incremental_merge",
    "events_value_rank",
    "events_enriched_streamed",
]


@pytest.mark.parametrize("name", ANSI_QUERIES)
def test_spark_sql_matches_dataframe_plan(spark, name):
    import __spark_entry__ as e

    register_views(spark, SF_DIR)
    qs, osql = e.queries(), e.oracle_sql()
    via_sql = spark.sql(osql[name])
    via_df = qs[name](spark, SF_DIR)
    cols = sorted(via_df.columns)
    assert sorted(via_sql.columns) == cols
    a = normalize_rows([tuple(r[c] for c in cols) for r in via_sql.collect()])
    b = normalize_rows([tuple(r[c] for c in cols) for r in via_df.collect()])
    assert a == b
