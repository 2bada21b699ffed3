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
    """r12 VERDICT item #1: the per-run guard must flag the contaminated
    r12 steal profile (to 5.56%) and pass the clean r11 envelope (steal
    <=0.64%).  load1_at_start must NOT breach — the committed r11 CLEAN
    record started its steady runs at load1 3.39-6.6 (self-residue from
    the bench's own prior child), so it cannot discriminate."""
    import bench

    assert bench._contended({"steal_pct": 5.56, "load1_at_start": 0.5})
    assert not bench._contended({"steal_pct": 0.1, "load1_at_start": 6.6})
    assert not bench._contended({"steal_pct": 0.64, "load1_at_start": 1.0})
    # r13 ADVICE recalibration: the threshold sits BETWEEN the measured
    # populations, so the contaminated minimum (1.2%) must breach per-run
    # — under the old 2.0 threshold it passed and only the wall-spread
    # backstop could catch it
    assert bench._contended({"steal_pct": 1.2})
    assert bench.CONTENTION_STEAL_PCT > 0.64
    assert bench.CONTENTION_STEAL_PCT < 1.2
    assert not bench._contended({})          # missing telemetry != breach
    assert not bench._contended({"steal_pct": None, "load1_at_start": None})


def test_wall_spread_dispersion_signal():
    """Record-level signal: the clean r11 walls (61-64 s) spread 1.05;
    the contaminated r12 walls (72.6-125.2) spread 1.72 — the threshold
    1.25 separates them with margin on both sides."""
    import bench

    r11 = [{"wall_sec": w} for w in (62.9, 61.0, 63.0, 62.8, 64.0)]
    r12 = [{"wall_sec": w} for w in (72.6, 118.8, 76.6, 86.2, 125.2)]
    assert bench._wall_spread(r11) <= bench.CONTENTION_WALL_SPREAD
    assert bench._wall_spread(r12) > bench.CONTENTION_WALL_SPREAD
    assert bench._wall_spread([{"wall_sec": 60}]) is None
    assert bench._wall_spread([]) is None
