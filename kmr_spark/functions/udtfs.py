"""Native Python UDTFs (Spark 4) — the 0..n-rows-out-per-row-in user
function surface.

KMR's map function signature IS a UDTF: ``kmr_mapfn_t`` may emit any
number of pairs per input pair (reference src/kmr.h:725-738). The
engine's hot paths express that shape with codegen ``explode``/Arrow
``mapInPandas`` (kvs.py), which are faster; these registered UDTFs are
the ergonomic SQL-addressable form — ``SELECT t.* FROM tbl, LATERAL
split_words(tbl.text) t`` — for user logic that genuinely needs
imperative Python. Registered per-session via :func:`register_udtfs`.

Keep UDTFs OFF the hot path at scale: each row crosses the JVM/Python
boundary; prefer built-in generators unless the logic can't be
expressed with them (the tests pin parity between this UDTF and the
explode form so the trade is visible, not silent).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="word string, pos int")
class SplitWords:
    """One row per whitespace token with its position."""

    def eval(self, text: str):
        for i, w in enumerate((text or "").split()):
            yield w, i


@udtf(returnType="ngram string")
class CharNgrams:
    """Character n-grams of the input (n fixed at 3 to keep the SQL
    call signature single-argument)."""

    N = 3

    def eval(self, text: str):
        t = text or ""
        for i in range(max(0, len(t) - self.N + 1)):
            yield (t[i:i + self.N],)


def register_udtfs(spark: SparkSession) -> None:
    """Make the UDTFs callable from SQL in this session."""
    spark.udtf.register("split_words", SplitWords)
    spark.udtf.register("char_ngrams", CharNgrams)
