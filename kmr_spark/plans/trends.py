"""Trend analytics: month-over-month growth over orders.

Integer-cents revenue and integer-permille growth, so the oracle is
exact (both engines' integer division truncates toward zero). The
growth window runs over the |months| series — bounded by the time
range, never by order volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmr_spark.session import load_tables


def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    monthly = (
        orders.groupBy(
            F.trunc(F.to_date("o_orderdate"), "month").alias("month"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
             .alias("rev_cents"),
             F.count("*").alias("n_orders")))
    w = Window.orderBy("month")  # |months| rows — calendar-bounded
    prev = F.lag("rev_cents").over(w)
    return monthly.select(
        "month", "n_orders", "rev_cents",
        prev.alias("prev_cents"),
        F.expr("(1000 * (rev_cents - lag(rev_cents) OVER (ORDER BY month)))"
               " DIV lag(rev_cents) OVER (ORDER BY month)")
        .alias("growth_permille"))


MONTHLY_GROWTH_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
         CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT month, n_orders, rev_cents,
       LAG(rev_cents) OVER (ORDER BY month) AS prev_cents,
       (1000 * (rev_cents - LAG(rev_cents) OVER (ORDER BY month)))
         // LAG(rev_cents) OVER (ORDER BY month) AS growth_permille
FROM monthly
"""


QUERIES = {"orders_monthly_growth": orders_monthly_growth}
ORACLE_SQL = {"orders_monthly_growth": MONTHLY_GROWTH_SQL}
