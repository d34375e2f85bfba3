"""Data-quality gate over the events table (operators/validate.py).

The query every ingest batch runs before publishing: a declarative
rule suite evaluated in one aggregation pass, emitting the per-rule
violation report the pipeline stores next to the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kmr_spark.operators.validate import (accepted_values, check, in_range,
                                          matches, not_null, referential,
                                          unique)
from kmr_spark.session import load_tables

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def validate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir)
    ev = tables["events"]
    rules = [
        referential("user_id", tables["customer"], "c_custkey"),
        not_null("event_id"),
        not_null("ts"),
        not_null("user_id"),
        accepted_values("event_type", EVENT_TYPES),
        in_range("value", 0.0, 1_000_000.0),
        matches("props", r"^\{.*\}$"),
        unique("event_id"),
    ]
    return check(ev, rules)


_TYPES = ", ".join(f"'{t}'" for t in EVENT_TYPES)

VALIDATE_EVENTS_SQL = f"""
WITH wide AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_eid,
         SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_ts,
         SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_uid,
         SUM(CASE WHEN event_type IS NOT NULL
                   AND event_type NOT IN ({_TYPES}) THEN 1 ELSE 0 END)::BIGINT AS v_type,
         SUM(CASE WHEN value IS NOT NULL
                   AND (value < 0.0 OR value > 1000000.0) THEN 1 ELSE 0 END)::BIGINT AS v_range,
         SUM(CASE WHEN props IS NOT NULL
                   AND NOT regexp_matches(props, '^\\{{.*\\}}$') THEN 1 ELSE 0 END)::BIGINT AS v_props,
         COUNT(event_id) - COUNT(DISTINCT event_id)::BIGINT AS v_uniq,
         SUM(CASE WHEN user_id IS NOT NULL AND user_id NOT IN
                  (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END)::BIGINT
           AS v_ref
  FROM events)
SELECT r.rule, r.violations, w.n_rows, r.violations = 0 AS passed
FROM wide w, LATERAL (VALUES
  ('not_null(event_id)', w.v_eid),
  ('not_null(ts)', w.v_ts),
  ('not_null(user_id)', w.v_uid),
  ('accepted_values(event_type)', w.v_type),
  ('in_range(value,0.0,1000000.0)', w.v_range),
  ('matches(props)', w.v_props),
  ('unique(event_id)', w.v_uniq),
  ('referential(user_id)', w.v_ref)) AS r(rule, violations)
ORDER BY r.rule
"""


QUERIES = {"validate_events": validate_events}
ORACLE_SQL = {"validate_events": VALIDATE_EVENTS_SQL}
