"""Sampling queries over the driver testdata (operators/sample.py).

Two pipeline staples:
- ``sample_events_stratified`` — per-event-type mixture weights (the
  "rebalance sources before training" step): keep 50% of purchases,
  25% of clicks, 10% of views, drop the rest.
- ``sample_docs_holdout`` — a deterministic ~20% held-out document
  split with a salt decorrelating it from any other draw on doc_id.

Both return the surviving rows themselves (not counts) so the oracle
comparison is row-for-row: the DuckDB twin recomputes the identical
hash arithmetic, proving the sample is a pure function of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.operators.sample import (_P_MOD, hash_sample,
                                        sample_k_per_group, sql_bucket,
                                        sql_weighted_key, stratified_sample,
                                        weighted_sample_key)
from kmr_spark.session import load_tables

EVENT_RATES = {"purchase": 0.5, "click": 0.25, "view": 0.1}
HOLDOUT_RATE = 0.2
HOLDOUT_SALT = 7


def sample_events_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    out = stratified_sample(
        ev, EVENT_RATES, stratum="event_type", key="event_id")
    return out.select("event_id", "user_id", "event_type", "value")


def sample_docs_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    out = hash_sample(docs, HOLDOUT_RATE, key="doc_id", salt=HOLDOUT_SALT)
    return out.select("doc_id", "lang", "source", "n_chars")


def _case_thresholds() -> str:
    arms = "\n    ".join(
        f"WHEN event_type = '{v}' THEN {int(r * _P_MOD)}"
        for v, r in sorted(EVENT_RATES.items()))
    return f"CASE {arms} ELSE 0 END"


SAMPLE_EVENTS_SQL = f"""
SELECT event_id, user_id, event_type, value
FROM events
WHERE {sql_bucket('event_id')} < {_case_thresholds()}
"""

SAMPLE_DOCS_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {sql_bucket('doc_id', HOLDOUT_SALT)} < {int(HOLDOUT_RATE * _P_MOD)}
"""


K_PER_USER = 5


def sample_k_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 5 events per user, chosen by key hash — the per-group
    reservoir-sample shape (e.g. 'at most k examples per source')."""
    ev = load_tables(spark, sf_dir)["events"]
    out = sample_k_per_group(ev, K_PER_USER, group="user_id", key="event_id")
    return out.select("event_id", "user_id", "event_type")


SAMPLE_K_PER_USER_SQL = f"""
SELECT event_id, user_id, event_type
FROM (
  SELECT event_id, user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
           ORDER BY {sql_bucket('event_id')} ASC, event_id ASC) AS rn
  FROM events)
WHERE rn <= {K_PER_USER}
"""


WEIGHTED_K = 50
WEIGHTED_SALT = 13


def sample_docs_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted sample WITHOUT replacement (Efraimidis–Spirakis
    reservoir): the 50 docs with the largest ln(u)/n_chars keys — long
    documents proportionally likelier, yet the draw is a pure function
    of doc_id (retry/AQE/engine stable). Plan: a narrow key expression
    + TakeOrderedAndProject (per-partition heap, driver merge of 50) —
    the distributed form of a weighted reservoir, no global sort."""
    from kmr_spark.operators.sort import top_k

    docs = load_tables(spark, sf_dir)["documents"].filter(F.col("n_chars") > 0)
    keyed = docs.select(
        "doc_id", "source", "n_chars",
        weighted_sample_key(
            F.col("doc_id"), F.col("n_chars").cast("double"),
            WEIGHTED_SALT).alias("wkey"))
    return top_k(keyed, WEIGHTED_K, F.desc("wkey"), F.col("doc_id"))


SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, source, n_chars,
       {sql_weighted_key('doc_id', 'CAST(n_chars AS DOUBLE)', WEIGHTED_SALT)}
         AS wkey
FROM documents
WHERE n_chars > 0
ORDER BY wkey DESC, doc_id
LIMIT {WEIGHTED_K}
"""


QUERIES = {
    "sample_events_stratified": sample_events_stratified,
    "sample_docs_holdout": sample_docs_holdout,
    "sample_k_per_user": sample_k_per_user,
    "sample_docs_weighted": sample_docs_weighted,
}

ORACLE_SQL = {
    "sample_events_stratified": SAMPLE_EVENTS_SQL,
    "sample_docs_holdout": SAMPLE_DOCS_SQL,
    "sample_k_per_user": SAMPLE_K_PER_USER_SQL,
    "sample_docs_weighted": SAMPLE_WEIGHTED_SQL,
}
