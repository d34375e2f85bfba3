"""Wordcount / graysort / analytics plans vs DuckDB oracle at sf0.01."""

import pytest

from kmr_spark.plans import analytics, graysort, wordcount
from tests.conftest import assert_matches_oracle


def _all():
    out = {}
    for m in (wordcount, graysort, analytics):
        for name in m.QUERIES:
            out[name] = (m.QUERIES[name], m.ORACLE_SQL[name])
    return out


@pytest.mark.parametrize("name", sorted(_all()))
def test_plan_matches_oracle(spark, duck, name):
    fn, sql = _all()[name]
    assert_matches_oracle(spark, duck, fn, sql)
