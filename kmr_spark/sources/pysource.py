"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic document generator, registered as format("kmr_docs").

This is the Spark-4-native answer to KMR's pluggable input surface
(kmr_read_files_* and the mapper-program sources, reference
src/kmrfiles.c): a first-class source the planner schedules like any
other — it reports partitions, each executor reads only its split,
and options flow through the normal reader API. Unlike an RDD-based
generator, the result participates in column pruning and AQE.

The generator is a pure function of (partition, row index), so every
read — any engine, any retry — produces identical rows; the test
pins the content against plans/generate.py-style arithmetic.

Usage::

    register_kmr_docs(spark)
    df = (spark.read.format("kmr_docs")
          .option("rows", 1000).option("partitions", 8).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)
from pyspark.sql.types import StructType

#: tiny vocabulary, mirrors the testdata documents' register
_VOCAB = ("spark scan table value row key join filter agg window "
          "batch stream sort merge hash column query data").split()

SCHEMA_DDL = "doc_id bigint, part int, text string, n_tokens int"


class _DocsPartition(InputPartition):
    def __init__(self, pid: int, start: int, end: int):
        self.pid, self.start, self.end = pid, start, end


def _gen_row(i: int, pid: int) -> tuple:
    """Pure function of (row index, partition) — the determinism both
    the batch reader and the stream reader share."""
    n = (i * 7) % 13 + 3
    toks = [_VOCAB[(i * 31 + j * 17) % len(_VOCAB)] for j in range(n)]
    return (i, pid, " ".join(toks), n)


class KmrDocsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.nparts = max(1, int(options.get("partitions", 4)))

    def partitions(self):
        per = -(-self.rows // self.nparts)
        return [
            _DocsPartition(p, p * per, min((p + 1) * per, self.rows))
            for p in range(self.nparts)
            if p * per < self.rows
        ]

    def read(self, partition: _DocsPartition):
        for i in range(partition.start, partition.end):
            yield _gen_row(i, partition.pid)


class KmrDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source (Spark 4 Python streaming
    DataSource API): emits deterministic rowsPerBatch-row micro-batches
    up to maxRows, with replayable offsets — readBetweenOffsets
    regenerates any batch bit-identically, so checkpoint recovery and
    the batch reader agree on every row."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 500))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        s = start["offset"]
        e = min(s + self.rows_per_batch, self.max_rows)
        return iter([_gen_row(i, 0) for i in range(s, e)]), {"offset": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_gen_row(i, 0)
                     for i in range(start["offset"], end["offset"])])


class KmrDocsDataSource(DataSource):
    """format("kmr_docs") — deterministic synthetic documents."""

    @classmethod
    def name(cls) -> str:
        return "kmr_docs"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return KmrDocsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> KmrDocsStreamReader:
        return KmrDocsStreamReader(self.options)


def register_kmr_docs(spark) -> None:
    spark.dataSource.register(KmrDocsDataSource)
