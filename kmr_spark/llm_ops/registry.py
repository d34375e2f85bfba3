"""Aggregated QUERIES / ORACLE_SQL for all llm_ops modules."""

from kmr_spark.llm_ops import (chunking, corpus, dedup, lexical, multimodal,
                               packing, pipeline, similarity, spans,
                               textstats, tuning)

QUERIES = {}
ORACLE_SQL = {}
for _m in (chunking, dedup, multimodal, packing, pipeline, similarity,
           textstats, corpus, spans, lexical, tuning):
    QUERIES.update(_m.QUERIES)
    ORACLE_SQL.update(_m.ORACLE_SQL)
