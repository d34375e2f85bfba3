"""Cogroup-join family (reference SURVEY.md §2.4).

KMR composes joins from shuffle + concatenate + per-key cross-product
reduce (kmr_match, reference src/kmrmoreops.c:696-728; JOINP driver,
ex/tpch.c:1785-1811). Spark has real join operators; these wrappers keep
the reference surface and add the Q21-style "equi-key + in-group
predicate" semi/anti forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def match(df0: DataFrame, df1: DataFrame, key: str = "key", value: str = "value") -> DataFrame:
    """Inner equi-join emitting per-key value pairs (kmr_match,
    src/kmrmoreops.c:696-728): output is (key, value0, value1), the
    cross product of the two value sets for each key.
    """
    a = df0.select(F.col(key), F.col(value).alias("value0"))
    b = df1.select(F.col(key), F.col(value).alias("value1"))
    return a.join(b, key, "inner")


def equi_join(
    df0: DataFrame,
    df1: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
    extra_predicate: Column | None = None,
) -> DataFrame:
    """JOINP equivalent (ex/tpch.c:1785-1811): equi-join with optional
    extra in-group predicate (the reference evaluates e.g.
    ``l2.l_suppkey <> l1.l_suppkey`` inside the cogroup reduce,
    ex/tpch.c:3147-3160; here it rides the join condition so Catalyst
    still picks a hash join on the equi-part).
    """
    cond = on
    if extra_predicate is not None:
        keys = [on] if isinstance(on, str) else list(on)
        if all(isinstance(k, str) for k in keys):
            eq = None
            for k in keys:
                c = df0[k] == df1[k]
                eq = c if eq is None else (eq & c)
            cond = eq & extra_predicate
        else:
            cond = cond & extra_predicate
    return df0.join(df1, cond, how)


def semi_join(df0: DataFrame, df1: DataFrame, on: str | list[str] | Column, how_extra: Column | None = None) -> DataFrame:
    """EXISTS (reference q21_join_lnos_l2, ex/tpch.c:3417-3458)."""
    return equi_join(df0, df1, on, "left_semi", how_extra)


def anti_join(df0: DataFrame, df1: DataFrame, on: str | list[str] | Column, how_extra: Column | None = None) -> DataFrame:
    """NOT EXISTS (reference q21_join_lnos_l3, ex/tpch.c:3459-3503)."""
    return equi_join(df0, df1, on, "left_anti", how_extra)
