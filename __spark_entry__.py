"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``kmr_spark`` package; this module only
aggregates the per-plan QUERIES / ORACLE_SQL registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make `import kmr_spark` work regardless of the driver's cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _registries():
    """Collect (QUERIES, ORACLE_SQL) from every plan module."""
    import kmr_spark.plans.tpch as tpch

    modules = [tpch]
    try:
        import kmr_spark.plans.tpch_extra as tpch_extra
        modules.append(tpch_extra)
    except ImportError:
        pass
    try:
        import kmr_spark.plans.wordcount as wordcount
        modules.append(wordcount)
    except ImportError:
        pass
    try:
        import kmr_spark.plans.graysort as graysort
        modules.append(graysort)
    except ImportError:
        pass
    try:
        import kmr_spark.plans.analytics as analytics
        modules.append(analytics)
    except ImportError:
        pass
    try:
        import kmr_spark.plans.iterative as iterative
        modules.append(iterative)
    except ImportError:
        pass
    try:
        import kmr_spark.plans.linalg as linalg
        modules.append(linalg)
    except ImportError:
        pass
    try:
        import kmr_spark.plans.generate as generate
        modules.append(generate)
    except ImportError:
        pass
    try:
        import kmr_spark.plans.sampling as sampling
        modules.append(sampling)
    except ImportError:
        pass
    try:
        import kmr_spark.plans.layout as layout
        modules.append(layout)
    except ImportError:
        pass
    try:
        import kmr_spark.llm_ops.registry as llm_registry
        modules.append(llm_registry)
    except ImportError:
        pass
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        queries.update(getattr(m, "QUERIES", {}))
        oracles.update(getattr(m, "ORACLE_SQL", {}))
    return queries, oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q9 profit rollup) on /root/testdata/sf0.001.

    Q9 exercises the widest pipeline (5-table join with two broadcast
    sides, decimal-exact aggregation, multi-key sort) and is non-empty
    at every scale factor.
    """
    from kmr_spark.plans.tpch import q9

    return q9(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column names)."""
    return _registries()[1]
