"""Custom aggregate (UDAF) surface: Arrow-batched grouped-agg
pandas_udf — the KMR redfn shape (whole value array per key, reference
src/kmrbase.c:2607 kmr_reduce9) for aggregates Spark can't express as
a single built-in.

``trimmed_mean`` needs the group's sorted value array (drop the top and
bottom tails, average the middle) — a classic robust statistic that is
NOT a one-pass algebraic aggregate. Spark's native route would be two
window passes + a filtered avg; the UDAF form is one grouped Arrow
transfer per key, which is the right trade when the group fits memory
(per-key arrays are exactly what kmr_reduce hands its redfn).

Scale note: grouped-agg pandas_udf holds ONE group's column in memory
per call — safe for keyed groups with bounded cardinality per key
(events per user/type); for corpus-sized groups use the two-pass
window form instead. That boundary is documented here on purpose.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

TRIM_FRAC = 0.1


@pandas_udf("double")
def trimmed_mean(v: pd.Series) -> float:
    """Mean of the middle (1 - 2*TRIM_FRAC) of the group's values:
    sort, drop floor(n*TRIM_FRAC) from each end, average the rest.
    Falls back to the plain mean for groups too small to trim."""
    s = v.dropna().sort_values().reset_index(drop=True)
    n = len(s)
    if n == 0:
        return float("nan")
    k = int(n * TRIM_FRAC)
    if 2 * k >= n:
        k = 0
    return float(s.iloc[k:n - k].mean())


def trimmed_mean_col(col: Column) -> Column:
    """Aggregate-position column: ``df.groupBy(...).agg(trimmed_mean_col(F.col('v')))``."""
    return trimmed_mean(col)
