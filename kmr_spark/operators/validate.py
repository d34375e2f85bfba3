"""Declarative data-quality validation (Deequ-style constraint suite).

A production ingest pipeline gates every batch behind constraint
checks; this operator evaluates a whole rule suite in a SINGLE
aggregation pass — each row-level rule becomes one conditional-sum
column, so checking 20 rules costs one scan, not 20. Uniqueness rules
ride the same aggregate as count(*) - count(distinct …).

The result is one row per rule: (rule, violations, n_rows, passed) —
the artifact a pipeline writes next to each batch.

Reference parity: the reference validates externally (GraySort via
valsort, ex/graysort.c:1-10); this is the engine-native generalization.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One constraint: ``violation`` is a boolean Column that is true
    for rows BREAKING the rule (None for table-level rules, which
    instead supply ``table_violations`` — an aggregate Column)."""

    name: str
    violation: Column | None = None
    table_violations: Column | None = field(default=None)


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> Rule:
    c = F.col(col)
    return Rule(f"in_range({col},{lo},{hi})",
                c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))))


def accepted_values(col: str, values: list) -> Rule:
    c = F.col(col)
    return Rule(f"accepted_values({col})",
                c.isNotNull() & ~c.isin(values))


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches({col})", c.isNotNull() & ~c.rlike(pattern))


def unique(col: str) -> Rule:
    return Rule(f"unique({col})",
                table_violations=F.count(col) - F.countDistinct(col))


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate the rule suite in one aggregation pass; returns
    (rule, violations, n_rows, passed) ordered by rule name."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        if r.violation is not None:
            aggs.append(F.sum(r.violation.cast("long")).alias(f"__v{i}"))
        else:
            aggs.append(r.table_violations.cast("long").alias(f"__v{i}"))
    wide = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(r.name).alias("rule"),
                 F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("violations"))
        for i, r in enumerate(rules)
    ])
    return (
        wide.select(F.col("__n").alias("n_rows"), F.explode(rows).alias("r"))
        .select(F.col("r.rule").alias("rule"),
                F.col("r.violations").alias("violations"),
                "n_rows",
                (F.col("r.violations") == 0).alias("passed"))
        .orderBy("rule")
    )
