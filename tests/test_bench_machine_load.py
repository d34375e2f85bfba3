"""bench.py ambient-load recording (VERDICT r8 ask #2): the machine
block in bench_detail.json must let a reader distinguish engine CPU
from other processes' CPU without re-timing anything."""

import time


def test_load_sample_fields():
    import bench

    s = bench._load_sample()
    assert len(s["loadavg"]) == 3
    assert s["cpu_total"] >= s["cpu_idle"] >= 0
    assert s["self_cpu_sec"] >= 0


def test_machine_load_report_attributes_own_cpu():
    import bench

    s = bench._load_sample()
    t0 = time.time()
    x = 0
    while time.time() - t0 < 0.5:
        x += sum(i * i for i in range(1000))
    rep = bench.machine_load_report(s, bench._load_sample())
    assert 0.0 <= rep["machine_busy_frac"] <= 1.0
    assert 0.0 <= rep["other_busy_frac"] <= 1.0
    # the spin loop above is ~0.5 CPU-sec of SELF time, not ambient
    assert rep["self_cpu_sec"] >= 0.3
    assert rep["wall_sec"] >= 0.5
    # other = busy - self can never exceed total busy
    assert rep["other_cpu_sec"] <= (rep["machine_busy_frac"]
                                    * rep["n_cpus"] * rep["wall_sec"] + 1e-6)


def test_machine_load_report_is_compact_json():
    import json

    import bench

    s = bench._load_sample()
    rep = bench.machine_load_report(s, bench._load_sample())
    assert len(json.dumps(rep)) < 400  # stays artifact-friendly
