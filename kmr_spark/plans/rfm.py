"""RFM customer segmentation over orders.

The classic scoring rollup: each customer gets recency / frequency /
monetary quartile scores, and the output is the 4x4x4 segment census —
how many customers land in each (r, f, m) cell and the cell's total
spend.

Exactness: recency is an integer day difference against the dataset's
max order date (computed, not wall clock — deterministic), frequency
an integer count, monetary a DECIMAL sum; every quartile cut orders by
(metric, o_custkey) so ranks are total-ordered and both engines cut
identically (exact NTILE reconstruction, ntile_from_rank).

Scale shape: one per-customer aggregate (map-side combinable), then
three distributed exscan rankings of the CUSTOMER table
(:func:`kmr_spark.operators.sort.ranking_per_group` — range-partition
sort + per-partition count exscan + narrow Arrow offset pass;
reference analog KMR's sampling sort, src/kmrmoreops.c:469-536) —
NOT three unpartitioned ntile windows, which would funnel every
customer through a single task. Each ranking materializes a narrow
(custkey, score) table; a 3-way equi-join on custkey and a 64-cell
census finish the job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from kmr_spark.operators.sort import ntile_from_rank, ranking_per_group
from kmr_spark.session import load_tables


def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    maxd = orders.agg(F.max(F.to_date("o_orderdate")).alias("d"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.max(F.to_date("o_orderdate")).alias("last_day"),
             F.count("*").alias("freq"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("mon"))
        .crossJoin(F.broadcast(maxd))
        .select("o_custkey",
                F.datediff("d", "last_day").cast("long").alias("recency_days"),
                "freq", "mon")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def quartiles(order: list[Column], name: str, keep: list[str]) -> DataFrame:
        # materialize=True: cuts lineage + releases the internal sort
        # cache immediately, so the three rankings never hold three
        # sorted copies of the customer table at once
        ranked = ranking_per_group(per_cust, [], order, materialize=True)
        score = ntile_from_rank(
            F.col("rank") + F.lit(1), F.col("n_group"), 4)
        return ranked.select("o_custkey", *keep, score.alias(name))

    r = quartiles([F.col("recency_days").asc(), F.col("o_custkey").asc()],
                  "r", [])
    f = quartiles([F.col("freq").desc(), F.col("o_custkey").asc()], "f", [])
    m = quartiles([F.col("mon").desc(), F.col("o_custkey").asc()], "m",
                  ["mon"])
    per_cust.unpersist()
    scored = m.join(r, "o_custkey").join(f, "o_custkey")
    return (
        scored.groupBy("r", "f", "m")
        .agg(F.count("*").alias("n_customers"),
             F.sum("mon").cast("double").alias("total_spend"))
        .orderBy("r", "f", "m")
    )


RFM_SQL = """
WITH maxd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS d FROM orders),
per_cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                        (SELECT d FROM maxd)) AS BIGINT) AS recency_days,
         COUNT(*) AS freq,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
  FROM orders GROUP BY o_custkey),
scored AS (
  SELECT o_custkey, mon,
         CAST(NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC)
              AS BIGINT) AS r,
         CAST(NTILE(4) OVER (ORDER BY freq DESC, o_custkey ASC)
              AS BIGINT) AS f,
         CAST(NTILE(4) OVER (ORDER BY mon DESC, o_custkey ASC)
              AS BIGINT) AS m
  FROM per_cust)
SELECT r, f, m, COUNT(*) AS n_customers,
       CAST(SUM(mon) AS DOUBLE) AS total_spend
FROM scored GROUP BY r, f, m ORDER BY r, f, m
"""


QUERIES = {"orders_rfm_segments": orders_rfm_segments}
ORACLE_SQL = {"orders_rfm_segments": RFM_SQL}
