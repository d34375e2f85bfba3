"""Date codec parity (reference ex/tpch.c date handling).

The reference packs dates into an order-preserving, invertible 8-byte
integer so they can ride integer sort keys (decode_date,
ex/tpch.c:878-911; format_date 915-945; year_value 949-992). Spark's
DateType/TimestampType already order correctly, so these functions exist
for (a) parity, (b) pipelines that genuinely want integer date keys
(e.g. byte-packed composite sort keys).

Encoding: days since 1970-01-01 (DateType's own physical value), which
is order-preserving and invertible like the reference's packing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decode_date(col: str | Column) -> Column:
    """date/timestamp -> order-preserving int64 (reference decode_date)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")


def format_date(col: str | Column) -> Column:
    """int64 day-number -> 'YYYY-MM-DD' (reference format_date)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.date_add(F.lit("1970-01-01").cast("date"), c.cast("int")), "yyyy-MM-dd")


def year_value(col: str | Column) -> Column:
    """date/timestamp -> year int (reference year_value)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.year(c).cast("int")


def date_between(col: str | Column, lo: str, hi_exclusive: str) -> Column:
    """Half-open date-range predicate (the reference's BETWEEN filters,
    e.g. q7_select_by_date ex/tpch.c:2050-2094, made exclusive-upper so
    timestamp columns can't leak a boundary day)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c >= F.lit(lo).cast("timestamp")) & (c < F.lit(hi_exclusive).cast("timestamp"))
