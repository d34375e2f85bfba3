"""Window-function parity audit: every rank/offset window primitive
(row_number, lag, lead, ntile, percent_rank, cume_dist) in one
user-keyed query, value-oracled against DuckDB.

The reference's sorted-KVS iteration surface (kmr_sort +
kmr_map_rank_by_rank, /root/reference/src/kmrbase.c:1987) is what a
user reaches for to compute "previous record", "quartile", "position
in group" — here they are declared as window expressions over a
KEYED partition (user_id), so Spark executes them after one hash
shuffle with no global ordering bottleneck at any scale.

Exactness: the ordering (ts, event_id) is unique per user, so ranks
are deterministic; percent_rank/cume_dist are rank-derived doubles —
(rank-1)/(n-1) and rank/n computed from exact integers with one
division, bit-identical across engines (the rfm recipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmr_spark.session import load_tables


def events_window_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user in event-time order: position, previous value (cents),
    next event type, quartile, percent_rank, cume_dist."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.floor(F.col("value") * 100).cast("long")
    return ev.select(
        "user_id", "event_id",
        F.row_number().over(w).alias("rn"),
        F.lag(cents).over(w).alias("prev_value_cents"),
        F.lead("event_type").over(w).alias("next_type"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


WINDOW_PARITY_SQL = """
SELECT user_id, event_id,
       ROW_NUMBER() OVER w AS rn,
       LAG(CAST(floor(value * 100) AS BIGINT)) OVER w AS prev_value_cents,
       LEAD(event_type) OVER w AS next_type,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


QUERIES = {"events_window_parity": events_window_parity}
ORACLE_SQL = {"events_window_parity": WINDOW_PARITY_SQL}
