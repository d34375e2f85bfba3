"""LLM-pipeline operators vs DuckDB oracle at sf0.01."""

import pytest

from kmr_spark.llm_ops import registry
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_llm_op_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, registry.QUERIES[name], registry.ORACLE_SQL[name])


def test_minhash_finds_near_dupes_nonempty(spark, duck):
    """The dedup queries should not be vacuously-empty at sf0.01 —
    verified against the oracle anyway, but check data has signal."""
    from kmr_spark.llm_ops.dedup import MINHASH_SQL

    n = len(duck.execute(MINHASH_SQL).fetchall())
    # informational: if 0, thresholds need tuning for the synthetic corpus
    print(f"minhash candidate near-dup pairs at sf0.01: {n}")
