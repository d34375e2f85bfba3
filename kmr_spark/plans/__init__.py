"""Full query pipelines — the engine-level equivalent of the reference's
example programs (``ex/tpch.c``, ``ex/wordcount.c``, ``ex/graysort.c``).

Each plan module exposes:

- ``QUERIES``: dict of name -> callable(spark, sf_dir) -> DataFrame
- ``ORACLE_SQL``: dict of name -> ANSI SQL string (DuckDB oracle)

Column names are aliased identically on both sides so the driver's
order-insensitive value-hash comparison is meaningful.
"""
