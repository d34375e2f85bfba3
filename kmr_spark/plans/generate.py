"""R-MAT graph generation (reference ex/mrmpi-crmat.c, SURVEY.md §2.12)
— the map_once/generator pattern: data from nothing, distributed.

Each edge id independently walks LEVELS quadrant choices of the
recursive matrix (probabilities a=0.57 b=0.19 c=0.19 d=0.05, the
Graph500 defaults the reference's MR-MPI port uses). The "random"
stream is a deterministic integer hash of (edge_id, level), so Spark
and DuckDB generate the identical graph — spark.range is the engine
surface (kmr_map_once parity, reference src/kmrbase.c:1460).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEVELS = 10  # 2^10 x 2^10 adjacency matrix
N_EDGES = 20_000
BIGP = 1_000_003
H_A = 427_799
H_B = 40_503
H_C = 12_345
H_MOD = 10_000
TH_A, TH_B, TH_C = 5_700, 7_600, 9_500  # cumulative a/b/c thresholds


def _bits(level: int):
    # square-and-multiply mixing: a purely linear hash of (id, level)
    # keeps its arithmetic-progression structure through the mods and
    # collapses the bit patterns to a handful of arcs; the quadratic
    # step breaks it while every intermediate stays under 2^63
    x = (F.col("id") + F.lit(level * H_B)) % BIGP
    x = (x * x) % BIGP
    h = ((x * H_A + H_C) % BIGP) % H_MOD
    row_bit = (h >= TH_B).cast("long")
    col_bit = (((h >= TH_A) & (h < TH_B)) | (h >= TH_C)).cast("long")
    return row_bit * (1 << level), col_bit * (1 << level)


def rmat_raw_edges(spark: SparkSession) -> DataFrame:
    """The raw (src, dst) edge stream, one row per generated edge —
    shared by the multigraph query and the graph-analytics plans.

    Size is pinned at (N_EDGES, LEVELS) for the driver/oracle contract
    (RMAT_RAW_SQL bakes the same constants in, so Spark and DuckDB
    always generate the identical graph under a vanilla environment).
    The KMR_RMAT_EDGES / KMR_RMAT_LEVELS env vars override the size at
    CALL time for the scale-law harness only (scripts/scale_bench.py
    graph subcommand: Graph500-style weak scaling, nodes growing with
    edges) — never set them in a driver/oracle run, the oracle stays
    at the pinned size.

    KMR_RMAT_MIX=xxhash (scale harness only) swaps the quadrant hash
    for xxhash64(id, level): the default BIGP-modular quadratic keeps
    DuckDB-replayable integer arithmetic but its trajectory space
    collapses at scale — measured: 2M edge ids at 16 levels produce
    only ~9.8k DISTINCT edges, so a large "sweep" would mostly time
    multigraph dedup rather than graph algorithms on a grown graph.
    xxhash64 gives real per-(id, level) entropy; the at-scale checks
    are engine-invariant (CC labeling invariants), so no SQL twin is
    needed at sweep sizes."""
    import os

    n_edges = int(os.environ.get("KMR_RMAT_EDGES", N_EDGES))
    levels = int(os.environ.get("KMR_RMAT_LEVELS", LEVELS))
    ids = spark.range(n_edges)
    if os.environ.get("KMR_RMAT_MIX") == "xxhash":
        def bits(level):
            h = F.pmod(F.xxhash64(F.col("id"), F.lit(level)), F.lit(H_MOD))
            row_bit = (h >= TH_B).cast("long")
            col_bit = (((h >= TH_A) & (h < TH_B))
                       | (h >= TH_C)).cast("long")
            return row_bit * (1 << level), col_bit * (1 << level)
    else:
        bits = _bits
    src = sum((bits(l)[0] for l in range(levels)), F.lit(0))
    dst = sum((bits(l)[1] for l in range(levels)), F.lit(0))
    return ids.select(src.alias("src"), dst.alias("dst"))


def rmat_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate the R-MAT multigraph and return (src, dst, multiplicity).

    ``sf_dir`` is unused (generator), kept for the queries() signature.
    """
    return (
        rmat_raw_edges(spark)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("multiplicity"))
        .orderBy("src", "dst")
    )


def _rmat_raw_sql() -> str:
    src_terms = []
    dst_terms = []
    for level in range(LEVELS):
        x = f"((id + {level * H_B}) % {BIGP})"
        h = f"(((({x} * {x}) % {BIGP}) * {H_A} + {H_C}) % {BIGP} % {H_MOD})"
        src_terms.append(f"(CASE WHEN {h} >= {TH_B} THEN {1 << level} ELSE 0 END)")
        dst_terms.append(
            f"(CASE WHEN ({h} >= {TH_A} AND {h} < {TH_B}) OR {h} >= {TH_C} "
            f"THEN {1 << level} ELSE 0 END)")
    return f"""
SELECT CAST({' + '.join(src_terms)} AS BIGINT) AS src,
       CAST({' + '.join(dst_terms)} AS BIGINT) AS dst
FROM range({N_EDGES}) t(id)
"""


RMAT_RAW_SQL = _rmat_raw_sql()

RMAT_SQL = f"""
SELECT src, dst, COUNT(*) AS multiplicity
FROM ({RMAT_RAW_SQL}) raw
GROUP BY 1, 2 ORDER BY src, dst
"""

QUERIES = {"gen_rmat": rmat_edges}
ORACLE_SQL = {"gen_rmat": RMAT_SQL}
