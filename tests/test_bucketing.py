"""Bucketed co-located joins: verify the exchange disappears."""

import contextlib
import io

from pyspark.sql import functions as F

from kmr_spark.session import load_tables
from kmr_spark.sources.bucketing import join_bucketed, save_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    t = load_tables(spark, "/root/testdata/sf0.001")
    save_bucketed(t["lineitem"].select("l_orderkey", "l_quantity")
                  .withColumnRenamed("l_orderkey", "okey"), "b_lineitem", "okey", 8)
    save_bucketed(t["orders"].select("o_orderkey", "o_totalprice")
                  .withColumnRenamed("o_orderkey", "okey"), "b_orders", "okey", 8)

    # disable auto-broadcast: the point is the big-big SMJ path where
    # bucketing removes the shuffle (at sf0.001 Catalyst would broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = join_bucketed(spark, "b_lineitem", "b_orders", "okey")
        plan = _plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:1500]}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")

    # and the result is correct vs the plain join
    plain = (
        t["lineitem"].join(t["orders"],
                           F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("l_orderkey").alias("okey"), "l_quantity", "o_totalprice")
    )
    a = sorted(map(tuple, joined.select("okey", "l_quantity", "o_totalprice").collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b


def test_bucketed_groupby_has_no_exchange(spark):
    agg = (
        __import__("kmr_spark.sources.bucketing", fromlist=["read_table"])
        .read_table(spark, "b_lineitem")
        .groupBy("okey").agg(F.sum("l_quantity").alias("q"))
    )
    assert "Exchange" not in _plan(agg)
