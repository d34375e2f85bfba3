"""End-to-end kmrrun pipeline: external mapper/kv-gen/reducer programs
(awk/cat/tr) through pipe -> shuffle -> pipe -> per-key sink.
Commands are shlex-tokenized by RDD.pipe, so shell-style quoting works.
"""

from kmr_spark.sources.pipe import kmrrun_pipeline

KVGEN = """awk '{for(i=1;i<=NF;i++) print $i "\\t" 1}'"""
REDUCER = """awk -F'\\t' '{s[$1]+=$2} END {for (k in s) print k "\\t" s[k]}'"""


def test_kmrrun_wordcount_e2e(spark, tmp_path):
    inp = tmp_path / "in.txt"
    inp.write_text("alpha beta beta\ngamma alpha\n" * 50)
    out = kmrrun_pipeline(spark, str(inp), mapper="cat",
                          kvgen=KVGEN, reducer=REDUCER)
    got = {r["key"]: int(r["value"]) for r in out.collect()}
    assert got == {"alpha": 100, "beta": 100, "gamma": 50}


def test_kmrrun_map_only_with_sink(spark, tmp_path):
    inp = tmp_path / "in.txt"
    inp.write_text("x 1\ny 2\n")
    out_dir = str(tmp_path / "sink")
    kmrrun_pipeline(spark, str(inp), mapper="tr ' ' '\t'", out_dir=out_dir)
    back = spark.read.parquet(out_dir)
    got = {r["key"]: r["value"] for r in back.collect()}
    assert got == {"x": "1", "y": "2"}
