"""RFM customer segmentation over orders.

The classic scoring rollup: each customer gets recency / frequency /
monetary quartile scores (ntile over per-customer aggregates), and the
output is the 4x4x4 segment census — how many customers land in each
(r, f, m) cell and the cell's total spend.

Exactness: recency is an integer day difference against the dataset's
max order date (computed, not wall clock — deterministic), frequency
an integer count, monetary a DECIMAL sum; every ntile orders by
(metric, o_custkey) so ranks are total-ordered and both engines cut
identically.

Scale shape: one per-customer aggregate (map-side combinable), three
ntile windows over the CUSTOMER table (not orders — |customers| rows),
one 64-cell census. The windows are global per metric; at extreme
customer counts swap ntile for the histogram-quantile sketch cuts
(plans/sketches.py) — same output contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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
    )
    wr = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey").asc())
    wf = Window.orderBy(F.col("freq").desc(), F.col("o_custkey").asc())
    wm = Window.orderBy(F.col("mon").desc(), F.col("o_custkey").asc())
    scored = per_cust.select(
        "o_custkey", "mon",
        F.ntile(4).over(wr).alias("r"),
        F.ntile(4).over(wf).alias("f"),
        F.ntile(4).over(wm).alias("m"))
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
         NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r,
         NTILE(4) OVER (ORDER BY freq DESC, o_custkey ASC) AS f,
         NTILE(4) OVER (ORDER BY mon DESC, o_custkey ASC) AS m
  FROM per_cust)
SELECT r, f, m, COUNT(*) AS n_customers,
       CAST(SUM(mon) AS DOUBLE) AS total_spend
FROM scored GROUP BY r, f, m ORDER BY r, f, m
"""


QUERIES = {"orders_rfm_segments": orders_rfm_segments}
ORACLE_SQL = {"orders_rfm_segments": RFM_SQL}
