"""Unit tests: chunking, deterministic sampling, bucketed range join."""

import pytest
from pyspark.sql import functions as F

from kmr_spark.llm_ops.chunking import chunk_documents
from kmr_spark.operators.interval import range_join
from kmr_spark.operators.sample import (hash_bucket, hash_sample,
                                        stratified_sample)


# ---------------------------------------------------------------- chunking

def test_chunk_covers_text_with_overlap(spark):
    text = "abcdefghij" * 10  # 100 chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, size=40, overlap=10).orderBy("chunk_id").collect()
    # stride 30: starts 0, 30, 60, 90
    assert [r.chunk_start for r in rows] == [0, 30, 60, 90]
    assert [r.chunk_len for r in rows] == [40, 40, 40, 10]
    # reassembling from strides reproduces the text exactly
    assert "".join(r.chunk_text[: 30] if r.chunk_id < len(rows) - 1
                   else r.chunk_text for r in rows) == text
    # consecutive chunks agree on the overlap region
    for a, b in zip(rows, rows[1:]):
        assert a.chunk_text[-10:] == b.chunk_text[:10] or len(b.chunk_text) < 10


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, "")], "doc_id long, text string")
    rows = chunk_documents(df, size=100, overlap=0).collect()
    by_id = {r.doc_id: r for r in rows}
    assert len(rows) == 2  # one chunk each; empty doc still appears
    assert by_id[1].chunk_text == "short" and by_id[1].chunk_len == 5
    assert by_id[2].chunk_text == "" and by_id[2].chunk_len == 0


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, size=10, overlap=10)


# ---------------------------------------------------------------- sampling

def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in hash_sample(df, 0.3, "k").collect())
    b = sorted(r.k for r in hash_sample(df.repartition(17), 0.3, "k").collect())
    assert a == b and a  # same rows regardless of partitioning
    frac = len(a) / 5000
    assert 0.25 < frac < 0.35


def test_hash_sample_salt_decorrelates(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = set(r.k for r in hash_sample(df, 0.5, "k", salt=0).collect())
    b = set(r.k for r in hash_sample(df, 0.5, "k", salt=99).collect())
    assert a != b
    # overlap near rate product, far from identical
    assert len(a & b) < 0.8 * len(a)


def test_stratified_rates(spark):
    df = spark.range(0, 9000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("s"))
    out = stratified_sample(df, {"0": 1.0, "1": 0.2}, "s", "k").collect()
    per = {str(i): sum(1 for r in out if r.s == str(i)) for i in range(3)}
    assert per["0"] == 3000           # rate 1.0 keeps everything
    assert 450 < per["1"] < 750       # ~600
    assert per["2"] == 0              # default rate 0


def test_hash_bucket_matches_oracle_formula(spark):
    from kmr_spark.operators.sample import _A, _P_MOD, _P_PRE
    df = spark.createDataFrame([(123456789,)], "k long")
    got = df.select(hash_bucket(F.col("k"), salt=7).alias("h")).first().h
    assert got == ((123456789 % _P_PRE + 7) * _A) % _P_MOD


def test_hash_bucket_negative_keys(spark, duck):
    from kmr_spark.operators.sample import sql_bucket
    # negative keys must land in [0, P) — a sign-following % would give
    # a negative bucket below every threshold (100% kept at any rate)
    df = spark.createDataFrame([(-5,), (-123456789,), (0,), (42,)], "k long")
    got = {r.k: r.h for r in
           df.select("k", hash_bucket(F.col("k"), salt=3).alias("h")).collect()}
    assert all(h >= 0 for h in got.values())
    # DuckDB twin agrees bit-for-bit on the same negatives
    for k, h in got.items():
        (dh,) = duck.execute(f"SELECT {sql_bucket(str(k), salt=3)}").fetchone()
        assert dh == h


def test_hash_sample_negative_keys_respect_rate(spark):
    df = spark.range(0, 4000).select((F.col("id") - 2000).alias("k"))
    frac = hash_sample(df, 0.3, "k").count() / 4000
    assert 0.25 < frac < 0.35


# --------------------------------------------------------------- range join

def _pts(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                 "pid long, p long")


def _ivs(spark, spans):
    return spark.createDataFrame([(i, lo, hi) for i, (lo, hi) in enumerate(spans)],
                                 "iid long, lo long, hi long")


def test_range_join_basic_and_boundaries(spark):
    pts = _pts(spark, [5, 10, 19, 20, 35])
    ivs = _ivs(spark, [(10, 20), (30, 40)])
    got = sorted((r.p, r.iid) for r in
                 range_join(pts, ivs, "p", "lo", "hi", 7).collect())
    # lo inclusive (10), hi exclusive (20 out), 5 matches nothing
    assert got == [(10, 0), (19, 0), (35, 1)]


def test_range_join_overlapping_intervals_no_duplicates(spark):
    pts = _pts(spark, list(range(0, 100)))
    ivs = _ivs(spark, [(0, 50), (25, 75), (40, 41)])
    out = range_join(pts, ivs, "p", "lo", "hi", 13).collect()
    pairs = [(r.p, r.iid) for r in out]
    assert len(pairs) == len(set(pairs))  # each pair meets in exactly 1 bucket
    # exhaustive check against the naive definition
    want = {(p, i) for p in range(100)
            for i, (lo, hi) in enumerate([(0, 50), (25, 75), (40, 41)])
            if lo <= p < hi}
    assert set(pairs) == want


def test_range_join_interval_on_bucket_boundary(spark):
    # hi == bucket edge: the interval must NOT reach into the next bucket
    pts = _pts(spark, [10])
    ivs = _ivs(spark, [(0, 10)])
    assert range_join(pts, ivs, "p", "lo", "hi", 10).count() == 0


def test_range_join_rejects_bad_width(spark):
    pts = _pts(spark, [1])
    ivs = _ivs(spark, [(0, 2)])
    with pytest.raises(ValueError):
        range_join(pts, ivs, "p", "lo", "hi", 0)


def test_auto_bucket_width_is_mean_span(spark):
    from kmr_spark.operators.interval import auto_bucket_width

    ivs = _ivs(spark, [(0, 10), (100, 121)])  # spans 10, 21 -> mean 15.5
    assert auto_bucket_width(ivs, "lo", "hi") == 16
    # inverted/empty spans are excluded from the stat; all-bad -> 1
    assert auto_bucket_width(_ivs(spark, [(5, 5), (9, 2)]), "lo", "hi") == 1


def test_range_join_drops_inverted_intervals(spark):
    # hi <= lo matches nothing under [lo, hi); before the guard, such a
    # row hit sequence(start > stop) which auto-steps -1 and explodes
    pts = _pts(spark, [5, 500])
    ivs = _ivs(spark, [(1_000_000, 0), (7, 7), (0, 10)])
    got = sorted((r.p, r.iid) for r in
                 range_join(pts, ivs, "p", "lo", "hi", 7).collect())
    assert got == [(5, 2)]


# ----------------------------------------------------------------- packing

def test_derive_n_shards_scales_with_corpus():
    from kmr_spark.llm_ops.packing import (MIN_SHARDS, TOKENS_PER_SHARD,
                                           derive_n_shards)

    assert derive_n_shards(0) == MIN_SHARDS
    assert derive_n_shards(MIN_SHARDS * TOKENS_PER_SHARD) == MIN_SHARDS
    # past the floor, shard payload stays bounded at TOKENS_PER_SHARD
    # regardless of corpus size: 1000x the corpus -> 1000x the shards
    big = 1000 * MIN_SHARDS * TOKENS_PER_SHARD
    assert derive_n_shards(big) == 1000 * MIN_SHARDS
    assert derive_n_shards(big + 1) == 1000 * MIN_SHARDS + 1


def test_pack_chunks_derives_shards_from_size(spark):
    from kmr_spark.llm_ops.packing import MIN_SHARDS, pack_chunks

    df = spark.createDataFrame(
        [(i, 0, 100) for i in range(50)],
        "doc_id long, chunk_id long, chunk_len long")
    shards = {r.shard for r in pack_chunks(df).select("shard").distinct().collect()}
    assert shards <= set(range(MIN_SHARDS))  # small corpus -> floor count


def test_pack_chunks_fills_bins_in_order(spark):
    from kmr_spark.llm_ops.packing import pack_chunks

    rows = [(1, i, 100) for i in range(10)]  # one shard (single doc)
    df = spark.createDataFrame(rows, "doc_id long, chunk_id long, chunk_len long")
    out = pack_chunks(df, capacity=256, n_shards=4).orderBy("chunk_id").collect()
    # 100-char chunks, 256-cap bins, bin = cum_before DIV 256: chunks
    # straddle bin edges (stream-concat semantics), so chunk i sits in
    # bin 100i DIV 256
    assert [r.bin_id for r in out] == [100 * i // 256 for i in range(10)]
    assert [r.offset for r in out][:4] == [0, 100, 200, 44]
    assert len({r.shard for r in out}) == 1  # same doc -> same shard


def test_pack_chunks_oversized_chunk_gets_own_bin(spark):
    from kmr_spark.llm_ops.packing import pack_chunks

    rows = [(1, 0, 50), (1, 1, 999), (1, 2, 50)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id long, chunk_len long")
    out = {r.chunk_id: r for r in pack_chunks(df, capacity=256).collect()}
    assert out[1].bin_id == 0          # starts in bin 0 at offset 50
    assert out[2].bin_id == 4          # floor-div advanced past the giant
    assert out[2].offset == (50 + 999) % 256


def test_pack_shards_are_deterministic_and_partition_invariant(spark):
    from kmr_spark.llm_ops.packing import pack_chunks

    rows = [(d, c, 80) for d in range(40) for c in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id long, chunk_len long")
    a = sorted(map(tuple, pack_chunks(df).collect()))
    b = sorted(map(tuple, pack_chunks(df.repartition(13)).collect()))
    assert a == b


# ------------------------------------------------- stream-stream attribution

def test_attribution_join_matches_batch(spark, tmp_path):
    """The streamed purchase<-click join over a bounded replay must equal
    the batch join with the identical predicate."""
    from pyspark.sql import functions as F

    from kmr_spark.session import load_tables
    from kmr_spark.streaming.windows import (attribution_join_stream,
                                             run_available_now, stream_events)

    sf = "/root/testdata/sf0.001"
    ev = stream_events(spark, sf)
    pairs = attribution_join_stream(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"))
    got = run_available_now(pairs, "attr_test_sink", str(tmp_path / "ck"),
                            output_mode="append")
    got_set = {(r.purchase_id, r.click_id) for r in got.collect()}

    bev = load_tables(spark, sf)["events"]
    p = bev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"))
    c = bev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"))
    want = p.join(c, (F.col("pu") == F.col("cu"))
                  & (F.col("cts") < F.col("pts"))
                  & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")))
    want_set = {(r.pid, r.cid) for r in want.collect()}
    assert got_set == want_set and got_set


def test_chunk_null_text_yields_empty_chunk(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    rows = chunk_documents(df, size=100, overlap=0).collect()
    assert len(rows) == 1 and rows[0].chunk_len == 0 and rows[0].chunk_text == ""


def test_sample_k_per_group_exact_k_and_stable(spark):
    from kmr_spark.operators.sample import sample_k_per_group

    df = spark.range(0, 1000).select(
        (F.col("id") % 10).alias("g"), F.col("id").alias("k"))
    out = sample_k_per_group(df, 7, "g", "k").collect()
    per = {}
    for r in out:
        per.setdefault(r.g, []).append(r.k)
    assert all(len(v) == 7 for v in per.values()) and len(per) == 10
    out2 = sample_k_per_group(df.repartition(13), 7, "g", "k").collect()
    assert sorted((r.g, r.k) for r in out) == sorted((r.g, r.k) for r in out2)


def test_range_join_negative_domain(spark):
    # truncating DIV gives uneven buckets around zero but the
    # monotonicity argument still holds: exhaustive check on negatives
    pts = _pts(spark, list(range(-30, 5)))
    ivs = _ivs(spark, [(-25, -10), (-3, 4)])
    got = {(r.p, r.iid) for r in range_join(pts, ivs, "p", "lo", "hi", 7).collect()}
    want = {(p, i) for p in range(-30, 5)
            for i, (lo, hi) in enumerate([(-25, -10), (-3, 4)]) if lo <= p < hi}
    assert got == want


# ------------------------------------------------------- zorder / profile

def test_zbucket_folds_into_domain(spark, duck):
    from kmr_spark.functions.zorder import ZBITS, sql_zbucket, zbucket

    vals = [-1, -65536, 0, 65535, 65536, 1 << 40]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r.x: r.z for r in df.select("x", zbucket(F.col("x")).alias("z")).collect()}
    assert all(0 <= z < (1 << ZBITS) for z in got.values())
    for v, z in got.items():
        (dz,) = duck.execute(f"SELECT {sql_zbucket(str(v))}").fetchone()
        assert dz == z == v % (1 << ZBITS)


def test_connected_components_rejects_bad_limits(spark):
    from kmr_spark.operators.graph import connected_components

    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError):
        connected_components(pairs, max_jumps=0)
    with pytest.raises(ValueError):
        connected_components(pairs, max_rounds=0)


def test_zorder_write_prunes_both_dims(spark, tmp_path):
    """The layout must DEMONSTRABLY prune: write events z-ordered on
    (user_id, vbucket), and for a range predicate on EITHER column the
    parquet min/max footer stats must rule out most row-groups — while
    the round-robin baseline layout prunes none. This is the property
    the zkey exists for; stats-overlap counting is exactly the pruning
    decision Spark's parquet reader (and any lakehouse scanner) makes."""
    import glob

    import pyarrow.parquet as pq

    from kmr_spark.functions.zorder import zorder_write
    from kmr_spark.session import load_tables
    from tests.conftest import SF_DIR

    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_id", "user_id", F.floor("value").cast("long").alias("vbucket"))
    zpath, upath = str(tmp_path / "zorder"), str(tmp_path / "rr")
    # 64 files -> ~8x8 quad grid in (user_id, vbucket) space: fine
    # enough that a 10%-of-domain strip touches only 1-2 quad columns
    zorder_write(ev, zpath, "user_id", "vbucket", target_files=64)
    ev.repartition(64).write.mode("overwrite").parquet(upath)

    def overlapping_row_groups(path, col, lo, hi):
        total = hit = 0
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = md.schema.to_arrow_schema().names
            ci = names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit, total

    # ~10%-of-domain range predicates, one per dimension
    for col, lo, hi in (("user_id", 30, 44), ("vbucket", 100, 148)):
        zhit, ztotal = overlapping_row_groups(zpath, col, lo, hi)
        uhit, utotal = overlapping_row_groups(upath, col, lo, hi)
        assert uhit == utotal  # round-robin: every row-group overlaps
        assert zhit < ztotal / 2, (
            f"{col}: z-layout kept {zhit}/{ztotal} row-groups")
        assert zhit < uhit

    # the clustered table still holds exactly the same rows
    assert spark.read.parquet(zpath).count() == ev.count()


def test_zorder_key_interleaves_bits(spark):
    from kmr_spark.functions.zorder import zorder_key

    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    got = df.select(zorder_key(F.col("a"), F.col("b")).alias("z")).first().z
    # a bits -> odd positions, b bits -> even: a=101, b=011
    want = (1 << 5) | (0 << 3) | (1 << 1) | (0 << 4) | (1 << 2) | (1 << 0)
    assert got == want


def test_zorder_clusters_quadrants(spark):
    """All rows of the low quadrant (a<8, b<8) must sort before any row
    with a>=16 and b>=16 — the locality property layout relies on."""
    from kmr_spark.functions.zorder import zorder_key

    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = {(r.a, r.b): r.z for r in
         df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()}
    lo = max(z[(a, b)] for a in range(8) for b in range(8))
    hi = min(z[(a, b)] for a in range(16, 32) for b in range(16, 32))
    assert lo < hi


def test_profile_counts_nulls_and_distinct(spark):
    from kmr_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (None, "x")], "k long, s string")
    out = {r.col_name: r for r in profile_table(df, ["k", "s"]).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_null == 1
    assert out["k"].n_distinct == 2            # NULL not counted
    assert out["k"].min_s == "1" and out["k"].max_s == "2"
    assert out["s"].n_null == 1 and out["s"].n_distinct == 2
