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


def test_contention_guard_thresholds():
    """r12 VERDICT item #1: the guard must flag every contaminated r12 run
    profile (steal to 5.56%, load1-at-start to 5.7) and pass the clean r11
    envelope (steal <=0.64%, load1 <=~1)."""
    import bench

    assert bench._contended({"steal_pct": 5.56, "load1_at_start": 0.5})
    assert bench._contended({"steal_pct": 0.1, "load1_at_start": 2.16})
    assert not bench._contended({"steal_pct": 0.64, "load1_at_start": 1.0})
    assert not bench._contended({})          # missing telemetry != breach
    assert not bench._contended({"steal_pct": None, "load1_at_start": None})
