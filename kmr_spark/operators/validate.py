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


def referential(col: str, dim: DataFrame, dim_col: str) -> "RefRule":
    """Foreign-key constraint: every non-null ``col`` value must exist
    in ``dim[dim_col]``. Evaluated as a left-anti join (one shuffle,
    broadcastable when the dimension is small) — the one rule class
    that can't ride the single-pass aggregate."""
    return RefRule(f"referential({col})", col, dim, dim_col)


@dataclass(frozen=True)
class RefRule:
    name: str
    col: str
    dim: DataFrame
    dim_col: str


def check(df: DataFrame, rules: list[Rule | RefRule]) -> DataFrame:
    """Evaluate the rule suite; row-level and uniqueness rules share ONE
    aggregation pass, referential rules each add one anti-join count.
    Returns (rule, violations, n_rows, passed) ordered by rule name."""
    ref_rules = [r for r in rules if isinstance(r, RefRule)]
    rules = [r for r in rules if not isinstance(r, RefRule)]
    if rules:
        out = _check_agg(df, rules)
    else:  # explode of a zero-element array has VOID type — skip it
        out = df.sparkSession.createDataFrame(
            [], "rule string, violations long, n_rows long, passed boolean")
    if ref_rules:
        n = df.count()
        for rr in ref_rules:
            probe = df.select(F.col(rr.col).alias("__k")).filter(
                F.col("__k").isNotNull())
            dim_keys = rr.dim.select(F.col(rr.dim_col).alias("__k")).distinct()
            viol = probe.join(dim_keys, "__k", "left_anti").count()
            row = df.sparkSession.createDataFrame(
                [(rr.name, viol, n, viol == 0)],
                "rule string, violations long, n_rows long, passed boolean")
            out = out.unionByName(row)
    return out.orderBy("rule")


def _check_agg(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """The single-pass aggregate for row-level + uniqueness rules."""
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
