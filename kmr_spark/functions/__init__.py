"""Scalar/array function helpers shared by plans and llm_ops.

- :mod:`.hashing` — deterministic rolling/minhash/simhash arithmetic with
  twin Spark-expression and DuckDB-SQL generators (one source of truth so
  engine and oracle agree bit-for-bit)
- :mod:`.dates`   — date codec parity with the reference's packed dates
- :mod:`.vectors` — embedding math (dot/norm/cosine) with twin generators
"""
