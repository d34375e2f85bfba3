"""Guards on the scale-law harness (scripts/scale_bench.py).

The generator's whole value is that ONLY volume changes: replica k's
rows must join replica k's rows and nothing else, so join selectivity
and per-key fan-out match the base corpus exactly.  These tests pin
that property at replicas=2 over sf0.001 (seconds, not minutes).
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import scale_bench

SF_SMALL = "/root/testdata/sf0.001"


def test_scale_table_family_mapping():
    assert scale_bench.scale_table("events_funnel") == "events"
    assert scale_bench.scale_table("graysort_rank") == "events"
    assert scale_bench.scale_table("text_stats") == "documents"
    assert scale_bench.scale_table("dedup_minhash_lsh") == "documents"
    assert scale_bench.scale_table("sim_ann_ivf") == "embeddings"
    assert scale_bench.scale_table("tpch_q9") == "lineitem"


def test_key_domains_cover_every_int64_key_column():
    """Every int64 key column of the fact tables must be offset, or
    replicas would share keys and join fan-out would multiply."""
    import pyarrow.parquet as pq

    for table, cols in scale_bench.KEY_DOMAINS.items():
        schema = pq.ParquetFile(
            os.path.join(SF_SMALL, f"{table}.parquet")).schema_arrow
        names = {f.name for f in schema}
        assert set(cols) <= names, (table, set(cols) - names)
    # lineitem's join keys all covered
    assert set(scale_bench.KEY_DOMAINS["lineitem"]) == {
        "l_orderkey", "l_partkey", "l_suppkey"}
    # same domain name => same stride across tables (join alignment)
    assert scale_bench.KEY_DOMAINS["orders"]["o_custkey"] == \
        scale_bench.KEY_DOMAINS["customer"]["c_custkey"]
    assert scale_bench.KEY_DOMAINS["lineitem"]["l_orderkey"] == \
        scale_bench.KEY_DOMAINS["orders"]["o_orderkey"]


@pytest.fixture(scope="module")
def replicated(tmp_path_factory, spark):
    out = str(tmp_path_factory.mktemp("scale") / "sf2x")
    scale_bench.generate(out, SF_SMALL, replicas=2, parts=4)
    return out


def test_generate_doubles_fact_tables(replicated):
    from kmr_spark.session import parquet_num_rows

    for t, base in (("lineitem", 6000), ("orders", 1500),
                    ("customer", 150), ("events", 1000),
                    ("documents", 500), ("embeddings", 500)):
        assert parquet_num_rows(replicated, t) == 2 * base, t
    # dims copied, not replicated
    assert parquet_num_rows(replicated, "nation") == 25
    assert parquet_num_rows(replicated, "region") == 5


def test_generate_preserves_referential_integrity(replicated):
    con = duckdb.connect()
    li = f"read_parquet('{replicated}/lineitem.parquet/*.parquet')"
    od = f"read_parquet('{replicated}/orders.parquet/*.parquet')"
    cu = f"read_parquet('{replicated}/customer.parquet/*.parquet')"
    # every lineitem joins exactly one order: join count == row count
    n_li, = con.execute(f"SELECT COUNT(*) FROM {li}").fetchone()
    n_join, = con.execute(
        f"SELECT COUNT(*) FROM {li} l JOIN {od} o"
        " ON l.l_orderkey = o.o_orderkey").fetchone()
    assert n_join == n_li == 12000
    # no orphans in either direction of orders->customer
    n_orph, = con.execute(
        f"SELECT COUNT(*) FROM {od} o WHERE NOT EXISTS"
        f" (SELECT 1 FROM {cu} c WHERE c.c_custkey = o.o_custkey)"
    ).fetchone()
    assert n_orph == 0
    # replicas are key-disjoint: replica 1's keys all sit above the
    # base table's max key (stride >= next power of ten past the max)
    base_od = f"read_parquet('{SF_SMALL}/orders.parquet')"
    base_max, = con.execute(
        f"SELECT MAX(o_orderkey) FROM {base_od}").fetchone()
    n_above, = con.execute(
        f"SELECT COUNT(*) FROM {od} WHERE o_orderkey > {base_max}"
    ).fetchone()
    assert n_above == 1500  # exactly the replica-1 copy


@pytest.fixture(scope="module")
def bounded_docs(tmp_path_factory, spark):
    out = str(tmp_path_factory.mktemp("scale") / "sf4x_cap2")
    scale_bench.generate(out, SF_SMALL, replicas=4, parts=4,
                         dup_cap=2, only_tables=["documents"])
    return out


def test_dup_cap_bounds_duplicate_multiplicity(bounded_docs):
    """--dup-cap C: every distinct text's multiplicity is C x its base
    multiplicity (bounded duplicate mass), group vocabularies are
    disjoint, group 0 embeds the base corpus verbatim, and n_chars
    tracks the salted text."""
    con = duckdb.connect()
    doc = f"read_parquet('{bounded_docs}/documents.parquet/*.parquet')"
    base = f"read_parquet('{SF_SMALL}/documents.parquet')"
    # volume still grows by the full replica count
    n, = con.execute(f"SELECT COUNT(*) FROM {doc}").fetchone()
    assert n == 4 * 500
    # multiplicity of every text = dup_cap x its base multiplicity:
    # the max per-text count is 2 x the base max, not 4 x
    base_max, = con.execute(
        f"SELECT MAX(c) FROM (SELECT COUNT(*) c FROM {base} "
        "GROUP BY text)").fetchone()
    cap_max, = con.execute(
        f"SELECT MAX(c) FROM (SELECT COUNT(*) c FROM {doc} "
        "GROUP BY text)").fetchone()
    assert cap_max == 2 * base_max
    # only the fact table was written (plus dims)
    assert not os.path.exists(
        os.path.join(bounded_docs, "lineitem.parquet"))
    assert os.path.exists(os.path.join(bounded_docs, "nation.parquet"))
    # group 0 (replicas 0-1) verbatim: every base text appears exactly
    # 2 x its base multiplicity among unsalted rows
    n_verbatim, = con.execute(
        f"SELECT COUNT(*) FROM {doc} d JOIN {base} b"
        " ON d.text = b.text").fetchone()
    n_base_pairs, = con.execute(
        f"SELECT SUM(c * c) FROM (SELECT COUNT(*) c FROM {base}"
        " GROUP BY text)").fetchone()
    assert n_verbatim == 2 * n_base_pairs
    # group 1 (replicas 2-3): every token carries the §1§ salt, so
    # vocabularies are disjoint across groups
    mk = scale_bench._SALT_MARKER
    n_g1_bad, = con.execute(
        f"SELECT COUNT(*) FROM {doc} WHERE text NOT IN"
        f" (SELECT text FROM {base}) AND len(list_filter("
        f"string_split(text, ' '), t -> t <> '' AND t NOT LIKE '%{mk}1{mk}'))"
        " > 0").fetchone()
    assert n_g1_bad == 0
    # BASE disjointness (the other direction — the r9 advice gap): no
    # unsalted row may contain the marker, or a base token would alias
    # a salted group's vocabulary and reintroduce cross-group affinity
    n_base_marked, = con.execute(
        f"SELECT COUNT(*) FROM {doc} WHERE text IN (SELECT text FROM {base})"
        f" AND contains(text, '{mk}')").fetchone()
    assert n_base_marked == 0
    # n_chars recomputed everywhere
    n_chars_bad, = con.execute(
        f"SELECT COUNT(*) FROM {doc} WHERE n_chars <> len(text)"
    ).fetchone()
    assert n_chars_bad == 0


def test_dup_cap_rejects_marker_in_base_corpus(tmp_path, spark):
    """generate() must fail LOUDLY when the base corpus already
    contains the salt marker — silent acceptance would produce a
    corpus whose cross-group disjointness (the whole point of
    --dup-cap) is broken."""
    base = str(tmp_path / "base")
    mk = scale_bench._SALT_MARKER
    poisoned = spark.createDataFrame(
        [(1, f"hello{mk}1{mk} world", "en", "web", 17)],
        "doc_id long, text string, lang string, source string, n_chars long")
    os.makedirs(base, exist_ok=True)
    poisoned.write.mode("overwrite").parquet(f"{base}/documents.parquet")
    for dim in ("region", "nation"):
        (spark.read.parquet(f"{SF_SMALL}/{dim}.parquet")
         .write.mode("overwrite").parquet(f"{base}/{dim}.parquet"))
    with pytest.raises(AssertionError, match="salt marker"):
        scale_bench.generate(str(tmp_path / "out"), base, replicas=4,
                             parts=2, dup_cap=2, only_tables=["documents"])
