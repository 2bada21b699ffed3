"""Host-telemetry helpers in bench.py — the self-diagnosing parts of the
bench record (VERDICT r9 item #1).  These run without a SparkSession."""

import bench


def test_cpu_probe_is_fixed_and_bounded():
    # a fixed workload: strictly positive, and sane even on a loaded host
    t = bench._cpu_probe()
    assert 0.0 < t < 10.0


def test_psi_totals_shape():
    psi = bench._psi_totals()
    # kernels without PSI return None; with PSI, totals are monotonic ints
    if psi is not None:
        assert set(psi) <= {"cpu", "io", "memory"}
        assert all(isinstance(v, int) and v >= 0 for v in psi.values())
        later = bench._psi_totals()
        assert all(later[k] >= psi[k] for k in psi)


def test_proc_stat_counters():
    s = bench._proc_stat()
    if s is not None:
        assert s["total"] >= s["idle"] + s["iowait"] + s["steal"]
