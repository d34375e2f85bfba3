"""LSH parameter tuning — measure, don't guess, the band/row trade.

``dedup_band_tuning`` reports, for each banding configuration of the
same 8 minhash signatures, the bucket count, the candidate-pair volume
(sum over buckets of C(size, 2) — exactly the number of pairs the
verify join would score), and the largest bucket. Run it BEFORE a
100 TB dedup pass: candidate volume is the pass's cost driver, and
the max bucket bounds its skew.

One signature scan, one count-per-bucket aggregate per config, then a
|buckets|-sized rollup — never materializes a single candidate pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.functions import hashing as H
from kmr_spark.llm_ops.dedup import _docs_with_sigs, _sql_sigs_cte
from kmr_spark.session import materialize_release

#: (config name, bands of signature-index tuples)
BAND_CONFIGS = [
    ("4x2", [(0, 1), (2, 3), (4, 5), (6, 7)]),
    ("2x4", [(0, 1, 2, 3), (4, 5, 6, 7)]),
]


def dedup_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs, th_table = _docs_with_sigs(spark, sf_dir)
    keys = sigs.select(
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(name), F.lit(b),
                        *[F.col(f"sig{j}") for j in band])
            for name, bands in BAND_CONFIGS
            for b, band in enumerate(bands)
        ])).alias("cfg_key"))
    config = F.split(F.col("cfg_key"), ":").getItem(0)
    buckets = (
        keys.groupBy("cfg_key").agg(F.count("*").alias("sz"))
        .select(config.alias("config"), "sz"))
    out = buckets.groupBy("config").agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.expr("sz * (sz - 1) DIV 2")).alias("candidate_pairs"),
        F.max("sz").alias("max_bucket"))
    return materialize_release(out, sigs, th_table)


def _band_tuning_sql() -> str:
    key_exprs = ", ".join(
        "'{name}:{b}:' || {sig_cat}".format(
            name=name, b=b,
            sig_cat=" || ':' || ".join(
                f"CAST(sig{j} AS VARCHAR)" for j in band))
        for name, bands in BAND_CONFIGS
        for b, band in enumerate(bands))
    return f"""
WITH {_sql_sigs_cte()},
keys AS (
  SELECT unnest([{key_exprs}]) AS cfg_key FROM sigs),
buckets AS (
  SELECT string_split(cfg_key, ':')[1] AS config, COUNT(*) AS sz
  FROM keys GROUP BY cfg_key),
rolled AS (
  SELECT config, COUNT(*) AS n_buckets,
         CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs,
         MAX(sz) AS max_bucket
  FROM buckets GROUP BY config)
SELECT * FROM rolled
"""


BAND_TUNING_SQL = _band_tuning_sql()

QUERIES = {"dedup_band_tuning": dedup_band_tuning}
ORACLE_SQL = {"dedup_band_tuning": BAND_TUNING_SQL}
