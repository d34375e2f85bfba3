"""Point-lookup operators (reference SURVEY.md §2.8)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_key(df: DataFrame, key_value: Any, key: str = "key") -> list:
    """All values for an exact key (kmr_find_key, src/kmrmoreops.c:43-70).

    A parquet-backed scan gets predicate pushdown, so this is an
    index-less point lookup exactly like the reference's.
    """
    return [r[0] for r in df.filter(F.col(key) == key_value).select(
        *[c for c in df.columns if c != key]).collect()]


def find_string(df: DataFrame, s: str, key: str = "key") -> list:
    """String-key convenience (kmr_find_string, src/kmrmoreops.c:73-94)."""
    return find_key(df, s, key)


def take_one(df: DataFrame):
    """Assert exactly one row and return it (kmr_take_one,
    src/kmrbase.c:1427-1457)."""
    rows = df.limit(2).collect()
    if len(rows) != 1:
        raise ValueError(f"take_one: expected exactly 1 row, found {len(rows)}")
    return rows[0]
