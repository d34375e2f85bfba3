"""kmr_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of RIKEN-RCCS/kmr.

Not a port: KMR's eager, bulk-synchronous KVS pipeline (map -> shuffle ->
reduce -> sort, see /root/reference/src/kmrbase.c) is re-expressed as lazy
DataFrame lineage optimized by Catalyst. The public surface:

- :mod:`kmr_spark.session`   — SparkSession factory tuned for the engine
- :mod:`kmr_spark.kvs`       — typed key-value stream facade (KMR_KVS parity)
- :mod:`kmr_spark.operators` — map/shuffle/reduce/sort/join/scan/ranking ops
- :mod:`kmr_spark.sources`   — table/text/file-name/pipe sources and sinks
- :mod:`kmr_spark.functions` — date codec, hashing, vector helpers
- :mod:`kmr_spark.plans`     — full query pipelines (TPC-H, wordcount, ...)
- :mod:`kmr_spark.llm_ops`   — dedup / similarity / text analysis at scale
- :mod:`kmr_spark.streaming` — Structured Streaming extensions (beyond ref)
"""

from kmr_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
