"""Property tests for the later round-8 waves (19-26): invariants the
row-hash oracle can't express — bounds, monotonicity, and accounting
identities of the statistical/operational queries."""

import pytest
from pyspark.sql import functions as F

from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES


def _run(name, spark, sf_dir):
    return R8B_QUERIES[name][0](spark, sf_dir).collect()


def test_newsvendor_service_level_at_least_fractile(spark, sf_dir):
    rows = _run("brand_newsvendor_stock", spark, sf_dir)
    assert rows
    for r in rows:
        assert r["service_level"] >= 0.8 - 1e-9
        assert 1 <= r["q_star"] <= 50


def test_fisher_index_between_laspeyres_and_paasche(spark, sf_dir):
    (r,) = _run("lineitem_price_index", spark, sf_dir)
    lo, hi = sorted([r["laspeyres"], r["paasche"]])
    assert lo - 1e-6 <= r["fisher"] <= hi + 1e-6
    assert r["n_parts"] > 0


def test_silhouette_bounded(spark, sf_dir):
    rows = _run("embedding_label_silhouette", spark, sf_dir)
    assert len(rows) == 10
    for r in rows:
        assert -1.0 <= r["silhouette"] <= 1.0
        assert r["mean_intra"] >= 0.0 and r["mean_nearest_other"] >= 0.0


def test_dau_wau_stickiness_bounded(spark, sf_dir):
    rows = _run("events_dau_wau_stickiness", spark, sf_dir)
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau"]
        assert 0.0 < r["stickiness"] <= 1.0


def test_conformal_qhat_positive_and_coverage_bounded(spark, sf_dir):
    (r,) = _run("orders_conformal_interval", spark, sf_dir)
    assert r["q_hat"] > 0.0
    assert 0.0 <= r["coverage"] <= 1.0
    assert r["n_cal"] > 0 and r["n_eval"] > 0


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = _run("corpus_vocab_coverage", spark, sf_dir)
    ks = [r["vocab_k"] for r in rows]
    assert ks == sorted(ks)
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs)          # more vocab covers more mass
    assert all(0.0 < c <= 1.0 for c in covs)


def test_decile_migration_accounting(spark, sf_dir):
    rows = _run("customer_decile_migration", spark, sf_dir)
    assert rows
    for r in rows:
        assert r["n_stay"] + r["n_up"] + r["n_down"] == r["n"]
        assert 0.0 <= r["mean_dec_1997"] <= 9.0


def test_entity_blocking_reduces_pairs(spark, sf_dir):
    (r,) = _run("customer_entity_blocking", spark, sf_dir)
    naive = r["n_customers"] * (r["n_customers"] - 1) // 2
    assert 0 < r["cand_pairs"] < naive
    assert 0.0 < r["reduction_ratio"] < 1.0


def test_assoc_rules_measure_consistency(spark, sf_dir):
    rows = _run("brand_assoc_rules", spark, sf_dir)
    assert len(rows) == 15
    for r in rows:
        assert 0.0 < r["support"] <= r["confidence"] <= 1.0
        assert r["lift"] > 0.0
        # leverage sign agrees with lift vs 1
        if r["lift"] > 1.0:
            assert r["leverage"] > 0.0


def test_markov_stationary_is_distribution(spark, sf_dir):
    rows = _run("events_markov_stationary", spark, sf_dir)
    ps = [r["stationary_p"] for r in rows]
    assert all(p > 0.0 for p in ps)
    assert sum(ps) == pytest.approx(1.0, abs=1e-4)


def test_zorder_stats_structural(spark, sf_dir):
    (r,) = _run("spatial_zorder_stats", spark, sf_dir)
    # NOTE: custkey order is nearly x-sorted by construction (x = key %
    # 360), so the ratio is a report, not guaranteed < 1 at tiny SF —
    # assert the structural invariants instead
    assert r["n_points"] > 0
    for c in ("x_span_z", "y_span_z", "x_span_seq", "y_span_seq"):
        assert 0.0 <= r[c] <= 360.0
    assert r["locality_ratio"] > 0.0


# -- wave 27-29 invariants -------------------------------------------------------

def test_ndcg_bounded(spark, sf_dir):
    (r,) = _run("alsobought_ndcg_eval", spark, sf_dir)
    assert r["n_eval_pairs"] > 0
    assert 0.0 < r["mean_ndcg"] <= 1.0


def test_brier_bounded_by_base_rate_variance(spark, sf_dir):
    (r,) = _run("events_purchase_brier", spark, sf_dir)
    # a calibrated segment model's Brier is at most p*(1-p) <= 0.25
    assert 0.0 <= r["brier"] <= 0.25


def test_rich_club_phi_bounded_and_monotone_k(spark, sf_dir):
    rows = _run("part_rich_club", spark, sf_dir)
    assert [r["k"] for r in rows] == [25, 50, 100]
    for r in rows:
        assert 0.0 <= r["phi"] <= 1.0
        assert r["e_club"] <= r["k"] * (r["k"] - 1) // 2


def test_rdd_sides_populated(spark, sf_dir):
    (r,) = _run("lineitem_discount_rdd", spark, sf_dir)
    assert r["n_left"] > 0 and r["n_right"] > 0
    assert r["rdd_jump"] == pytest.approx(
        r["right_at_cutoff"] - r["left_at_cutoff"], abs=2e-6)


def test_adamic_adar_positive_and_sorted(spark, sf_dir):
    rows = _run("part_adamic_adar", spark, sf_dir)
    assert rows
    scores = [r["adamic_adar"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    assert all(r["part_a"] < r["part_b"] for r in rows)


def test_lexical_richness_bounds(spark, sf_dir):
    rows = _run("doc_lexical_richness", spark, sf_dir)
    assert rows
    for r in rows:
        assert r["n_hapax"] <= r["n_types"] <= r["n_tokens"]
        assert 0.0 < r["ttr"] <= 1.0
        assert 0.0 < r["herdan_c"] <= 1.0


def test_ipw_between_group_means_sanity(spark, sf_dir):
    (r,) = _run("events_ipw_ate", spark, sf_dir)
    assert 0.0 <= r["mean_outcome_treated_ipw"] <= 1.0 + 1e-9
    assert 0.0 <= r["mean_outcome_control_ipw"] <= 1.0 + 1e-9


def test_caliper_match_att_consistency(spark, sf_dir):
    (r,) = _run("events_caliper_match_att", spark, sf_dir)
    if r["n_matched"] == 0:
        # tiny SFs have no never-clicked controls: the degenerate row is
        # (0, NULL, NULL, NULL) on both engines
        assert r["att"] is None
    else:
        assert r["att"] == pytest.approx(r["y_treated"] - r["y_control"],
                                         abs=2e-6)


def test_simhash_bit_balance_complete(spark, sf_dir):
    rows = _run("simhash_bit_balance", spark, sf_dir)
    assert len(rows) == 60
    for r in rows:
        assert 0.0 <= r["ones_rate"] <= 1.0
        assert r["bias"] <= 0.5


def test_seasonality_strength_bounded(spark, sf_dir):
    (r,) = _run("events_seasonality_strength", spark, sf_dir)
    assert 0.0 <= r["strength_seasonal"] <= 1.0
    assert 0.0 <= r["strength_trend"] <= 1.0


# -- wave 30-33 invariants ---------------------------------------------------------

def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    rows = _run("customer_neyman_allocation", spark, sf_dir)
    assert rows
    assert sum(r["neyman_n"] for r in rows) == pytest.approx(1000.0,
                                                             abs=0.5)
    assert sum(r["proportional_n"] for r in rows) == pytest.approx(
        1000.0, abs=0.5)


def test_corr_matrix_bounded(spark, sf_dir):
    rows = _run("orders_corr_matrix", spark, sf_dir)
    assert len(rows) == 3
    for r in rows:
        assert -1.0 <= r["pearson_r"] <= 1.0


def test_haar_energy_structure(spark, sf_dir):
    rows = _run("events_haar_energy", spark, sf_dir)
    assert [r["level"] for r in rows] == [1, 2, 3, 4]
    assert [r["n_details"] for r in rows] == [8, 4, 2, 1]
    assert [r["divisor"] for r in rows] == [4, 16, 64, 256]
    assert all(r["energy_num"] >= 0 for r in rows)


def test_croston_positive(spark, sf_dir):
    rows = _run("brand_croston_forecast", spark, sf_dir)
    assert rows
    for r in rows:
        assert r["size_hat"] > 0 and r["interval_hat"] >= 1.0
        assert r["croston_rate"] == pytest.approx(
            r["size_hat"] / r["interval_hat"], rel=1e-4)


def test_kalman_gain_bounded(spark, sf_dir):
    (r,) = _run("events_kalman_level", spark, sf_dir)
    assert 0.0 < r["last_gain"] < 1.0
    assert r["error_var"] > 25.0  # steady-state P > Q


def test_pvm_bridge_reconciles(spark, sf_dir):
    rows = _run("brand_price_volume_mix", spark, sf_dir)
    assert rows
    for r in rows:
        total = (r["price_effect_k"] + r["volume_effect_k"]
                 + r["mix_effect_k"])
        assert total == pytest.approx(r["revenue_delta_k"], abs=2e-3)


def test_littles_law_identity(spark, sf_dir):
    (r,) = _run("orders_littles_law", spark, sf_dir)
    assert r["littles_ratio"] == pytest.approx(1.0, abs=1e-6)


def test_otsu_splits_population(spark, sf_dir):
    (r,) = _run("events_otsu_threshold", spark, sf_dir)
    assert r["n_low"] > 0 and r["n_high"] > 0
    assert 0 <= r["otsu_bin"] <= 254


def test_fosd_gaps_bracket_zero_or_verdict(spark, sf_dir):
    (r,) = _run("orders_stochastic_dominance", spark, sf_dir)
    assert r["min_gap"] <= r["max_gap"]
    if r["fosd_verdict"] == "cdfs_cross":
        assert r["min_gap"] < 0 < r["max_gap"]


def test_gains_chart_monotone_and_ends_at_one(spark, sf_dir):
    rows = _run("events_gains_chart", spark, sf_dir)
    gains = [r["cum_gain"] for r in rows]
    assert gains == sorted(gains)
    assert gains[-1] == pytest.approx(1.0, abs=1e-9)
    assert all(r["lift"] > 0 for r in rows)


def test_effect_size_hedges_smaller_than_cohens(spark, sf_dir):
    (r,) = _run("lineitem_effect_size", spark, sf_dir)
    assert abs(r["hedges_g"]) <= abs(r["cohens_d"]) + 1e-9


def test_circular_stats_bounded(spark, sf_dir):
    rows = _run("events_circular_hour_stats", spark, sf_dir)
    for r in rows:
        assert 0.0 <= r["circular_mean_hour"] < 24.0
        assert 0.0 <= r["resultant_length"] <= 1.0


def test_gpd_moments_fit_sane(spark, sf_dir):
    (r,) = _run("events_pot_gpd_fit", spark, sf_dir)
    assert r["n_excesses"] > 0
    assert r["gpd_sigma"] > 0.0
    assert r["gpd_xi"] < 1.0


def test_heaps_law_sublinear(spark, sf_dir):
    (r,) = _run("doc_heaps_law", spark, sf_dir)
    if r["n_checkpoints"] >= 2:
        # sublinear growth; == 0 when the synthetic vocab saturates in
        # the first checkpoint window (sf0.001 has 500 docs over a
        # fixed small vocabulary)
        assert 0.0 <= r["heaps_beta"] < 1.0
        assert r["heaps_k"] > 0.0


def test_burrows_delta_nonnegative_sorted(spark, sf_dir):
    rows = _run("source_burrows_delta", spark, sf_dir)
    assert rows
    deltas = [r["delta"] for r in rows]
    assert all(d >= 0 for d in deltas)
    assert deltas == sorted(deltas)


# -- wave 34-36 invariants ---------------------------------------------------------

def test_pr_curve_bounds_and_monotone_pred(spark, sf_dir):
    rows = _run("minhash_threshold_pr_curve", spark, sf_dir)
    assert [r["threshold"] for r in rows] == [0.5, 0.625, 0.75]
    preds = [r["n_pred"] for r in rows]
    acts = [r["n_actual"] for r in rows]
    assert preds == sorted(preds, reverse=True)   # higher cut, fewer pairs
    assert acts == sorted(acts, reverse=True)
    for r in rows:
        assert r["n_hit"] <= min(r["n_pred"], r["n_actual"])
        if r["precision"] is not None:
            assert 0.0 <= r["precision"] <= 1.0
        if r["recall"] is not None:
            assert 0.0 <= r["recall"] <= 1.0


def test_fiscal_445_covers_full_year(spark, sf_dir):
    rows = _run("orders_fiscal_445_rollup", spark, sf_dir)
    assert [r["fp"] for r in rows] == list(range(1, 13))
    # 4 quarters x 3 periods, quarter ids consistent with period ids
    for r in rows:
        assert r["fq"] == (r["fp"] - 1) // 3 + 1
        assert r["n_orders"] > 0


def test_shot_boundaries_above_threshold(spark, sf_dir):
    rows = _run("multimodal_shot_boundaries", spark, sf_dir)
    for r in rows:
        assert r["jump"] > 600
        assert 1 <= r["boundary_frame"] <= 3


def test_cross_correlation_bounded(spark, sf_dir):
    rows = _run("events_cross_correlation", spark, sf_dir)
    assert [r["lag"] for r in rows] == [0, 1, 2, 3]
    for r in rows:
        assert -1.0 <= r["cross_corr"] <= 1.0


def test_gap_sensitivity_monotone(spark, sf_dir):
    rows = _run("events_session_gap_sensitivity", spark, sf_dir)
    assert [r["gap_min"] for r in rows] == [10, 30, 60]
    ns = [r["n_sessions"] for r in rows]
    assert ns == sorted(ns, reverse=True)  # longer gap, fewer sessions
    means = [r["mean_events_per_session"] for r in rows]
    assert means == sorted(means)          # ... and longer sessions


def test_jackknife_stability_bounded(spark, sf_dir):
    rows = _run("customer_topk_jackknife", spark, sf_dir)
    assert len(rows) == 12
    for r in rows:
        assert 0 <= r["n_overlap"] <= 10
        assert 0.0 <= r["stability"] <= 1.0


def test_mann_kendall_s_within_pair_bound(spark, sf_dir):
    (r,) = _run("orders_mann_kendall", spark, sf_dir)
    max_pairs = r["n_days"] * (r["n_days"] - 1) // 2
    assert abs(r["mk_s"]) <= max_pairs
    assert r["sd_s"] > 0


def test_set_cover_gains_monotone_decreasing(spark, sf_dir):
    rows = _run("supplier_set_cover", spark, sf_dir)
    assert rows
    gains = [r["newly_covered"] for r in rows]
    assert gains == sorted(gains, reverse=True)  # greedy gain shrinks
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs)
    assert covs[-1] <= 1.0
    # cum_covered accounting
    cum = 0
    for r in rows:
        cum += r["newly_covered"]
        assert r["cum_covered"] == cum


# -- RLE boundary stitch vs definitional Python runs --------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
             min_size=1, max_size=40),
    st.sampled_from([1, 3, 64]))
def test_rle_estimate_matches_python_mirror(spark, priorities, n_parts):
    """orders_rle_encoding_estimate's range-partitioned lag + driver-side
    boundary stitch must count exactly the runs a single sequential scan
    counts, for ANY range-partition count — including counts far above
    the row count, which force empty range partitions through the stitch
    (the regime ADVICE r9 flagged as never exercised by the shuffle-only
    rehearsal axis).  Mirror: runs = 1 + #(adjacent unequal) over the
    sorted sequence, per layout."""
    import os
    import tempfile

    from sedona_iceberg_extension_spark.plans.queries import QUERIES

    def runs_of(seq):
        return 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)

    n = len(priorities)
    by_key = priorities                              # orderkey = list index
    by_val = [p for p, _ in sorted(zip(priorities, range(n)))]
    want = {"natural": (n, runs_of(by_key)),
            "sorted_by_column": (n, runs_of(by_val))}

    with tempfile.TemporaryDirectory() as d:
        (spark.createDataFrame(list(enumerate(priorities)),
                               "o_orderkey long, o_orderpriority string")
         .write.mode("overwrite").parquet(f"{d}/orders.parquet"))
        old = os.environ.get("SPARK_GRAFT_RLE_RANGE_PARTS")
        os.environ["SPARK_GRAFT_RLE_RANGE_PARTS"] = str(n_parts)
        try:
            rows = QUERIES["orders_rle_encoding_estimate"].fn(
                spark, d).collect()
        finally:
            if old is None:
                del os.environ["SPARK_GRAFT_RLE_RANGE_PARTS"]
            else:
                os.environ["SPARK_GRAFT_RLE_RANGE_PARTS"] = old
    got = {r["layout"]: (r["n"], r["runs"]) for r in rows}
    assert got == want


# --- independent Python mirrors for the iterative graph queries -----------
#
# part_kcore and part_label_propagation are the two declared queries whose
# DuckDB oracles are UNROLLINGS of the same algorithm (the oracle restates
# the rounds as CTEs), so engine and oracle could in principle share a
# misunderstanding.  These mirrors recompute both queries from the raw
# (l_orderkey, l_partkey) pairs in plain imperative Python — a third,
# independently-derived implementation — on the real sf0.001 table.

def _copurchase_adj(pairs):
    """Symmetric adjacency of the co-purchase graph: parts sharing >= 2
    distinct orders (the support rule every graph query uses)."""
    from collections import defaultdict

    by_order = defaultdict(set)
    for ok, pk in pairs:
        by_order[ok].add(pk)
    supp = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                supp[(ps[i], ps[j])] += 1
    adj = defaultdict(set)
    for (u, v), c in supp.items():
        if c >= 2:
            adj[u].add(v)
            adj[v].add(u)
    return adj


def _lineitem_pairs(spark, sf_dir):
    from sedona_iceberg_extension_spark.sources.tables import load_table

    return [(r["l_orderkey"], r["l_partkey"])
            for r in load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey").distinct().collect()]


def test_kcore_matches_python_mirror(spark, sf_dir):
    from sedona_iceberg_extension_spark.plans.queries_r8 import R8_QUERIES

    adj = _copurchase_adj(_lineitem_pairs(spark, sf_dir))
    cur = {u: set(vs) for u, vs in adj.items()}
    for _ in range(3):
        keep = {u for u, vs in cur.items() if len(vs) >= 4}
        cur = {u: {v for v in vs if v in keep}
               for u, vs in cur.items() if u in keep}
    want = {u: len(vs) for u, vs in cur.items() if vs}
    got = {r["p_partkey"]: r["core_deg"]
           for r in R8_QUERIES["part_kcore"][0](spark, sf_dir).collect()}
    assert got == want
    assert want, "sf0.001 co-purchase graph unexpectedly has no 4-core"


def test_label_propagation_matches_python_mirror(spark, sf_dir):
    from collections import Counter

    from sedona_iceberg_extension_spark.plans.queries_r8 import R8_QUERIES

    adj = _copurchase_adj(_lineitem_pairs(spark, sf_dir))
    labels = {u: u for u in adj}
    for _ in range(3):
        labels = {v: min(Counter(labels[u] for u in adj[v]).items(),
                         key=lambda kv: (-kv[1], kv[0]))[0]
                  for v in adj}
    got = {r["p_partkey"]: r["label"]
           for r in R8_QUERIES["part_label_propagation"][0](
               spark, sf_dir).collect()}
    assert got == labels
    # the tie rule must actually have merged something
    assert len(set(labels.values())) < len(labels)


def test_fiscal_445_rollup_matches_python_mirror(spark, sf_dir):
    """orders_fiscal_445_rollup re-derived with datetime.date arithmetic
    and Decimal cent-sums (engine and oracle both restate the same integer
    formulas; this mirror derives the calendar independently).  revenue_k
    = cents/1e5 carries at most 5 decimals, so the 6-digit ROUND is exact
    and rounding-mode-free."""
    import datetime
    from decimal import Decimal, ROUND_HALF_UP

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    base = datetime.date(1996, 2, 1)
    agg = {}
    for r in (load_table(spark, sf_dir, "orders")
              .select("o_orderdate", "o_totalprice").collect()):
        d = r["o_orderdate"]
        if isinstance(d, datetime.datetime):
            d = d.date()
        off = (d - base).days
        if not (364 <= off < 728):
            continue
        within = off % 364
        q, dq = within // 91, within % 91
        p_in_q = 0 if dq < 28 else (1 if dq < 56 else 2)
        key = (q + 1, q * 3 + p_in_q + 1)
        cents = int((Decimal(str(r["o_totalprice"])) * 100)
                    .to_integral_value(ROUND_HALF_UP))
        n, c = agg.get(key, (0, 0))
        agg[key] = (n + 1, c + cents)
    want = {k: (n, c / 100000) for k, (n, c) in agg.items()}
    got = {(r["fq"], r["fp"]): (r["n_orders"], r["revenue_k"])
           for r in R8B_QUERIES["orders_fiscal_445_rollup"][0](
               spark, sf_dir).collect()}
    assert got == want
    assert len(got) == 12, "FY1997 must produce all 12 fiscal periods"


def test_compaction_bin_packing_matches_python_mirror(spark, sf_dir):
    """compaction_bin_packing re-derived imperatively: sort the derived
    file inventory largest-first, walk the cumulative offset, assign bins
    — the shape a planner-side unit test would use, independent of the
    window-function restatement both engine and oracle share."""
    import math

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    inv = {}
    for r in (load_table(spark, sf_dir, "lineitem")
              .select(F.year("l_shipdate").alias("y"),
                      F.month("l_shipdate").alias("m")).collect()):
        inv[(r["y"], r["m"])] = inv.get((r["y"], r["m"]), 0) + 1
    files = sorted(((s, y, m) for (y, m), s in inv.items()),
                   key=lambda t: (-t[0], t[1], t[2]))
    total = sum(s for s, _, _ in files)
    target = math.ceil(total / 8.0)
    bins, off = {}, 0
    for s, _, _ in files:
        b = off // target
        n, rows = bins.get(b, (0, 0))
        bins[b] = (n + 1, rows + s)
        off += s
    got = {r["bin"]: (r["n_files"], r["bin_rows"], r["fill_ratio"])
           for r in R8B_QUERIES["compaction_bin_packing"][0](
               spark, sf_dir).collect()}
    assert set(got) == set(bins)
    for b, (n, rows) in bins.items():
        gn, grows, gfill = got[b]
        assert (gn, grows) == (n, rows)
        assert gfill == pytest.approx(rows / target, abs=1e-6)


def _copurchase_edges(pairs):
    """Directed (u < v) co-purchase edge set with support >= 2."""
    from collections import defaultdict

    by_order = defaultdict(set)
    for ok, pk in pairs:
        by_order[ok].add(pk)
    supp = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                supp[(ps[i], ps[j])] += 1
    return {e for e, c in supp.items() if c >= 2}


def test_rich_club_matches_python_mirror(spark, sf_dir):
    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES

    edges = _copurchase_edges(_lineitem_pairs(spark, sf_dir))
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    ranked = sorted(deg, key=lambda p: (-deg[p], p))
    want = {}
    for k in (25, 50, 100):
        club = set(ranked[:k])
        e_club = sum(1 for u, v in edges if u in club and v in club)
        want[k] = (e_club, round(2.0 * e_club / (k * (k - 1)), 6))
    got = {r["k"]: (r["e_club"], r["phi"])
           for r in R8B_QUERIES["part_rich_club"][0](spark, sf_dir).collect()}
    assert got == want


def test_adamic_adar_matches_python_mirror(spark, sf_dir):
    import math
    from collections import defaultdict

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES

    edges = _copurchase_edges(_lineitem_pairs(spark, sf_dir))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    scored = {}
    for w, nbrs in adj.items():
        if len(nbrs) <= 1:          # deg>1 filter is per shared neighbor
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                cn, aa = scored.get(key, (0, 0.0))
                scored[key] = (cn + 1, aa + 1.0 / math.log(len(nbrs)))
    non_edges = {k: v for k, v in scored.items() if k not in edges}
    order = sorted(non_edges,
                   key=lambda k: (-round(non_edges[k][1], 6), k[0], k[1]))
    rows = R8B_QUERIES["part_adamic_adar"][0](spark, sf_dir).collect()
    assert [(r["part_a"], r["part_b"]) for r in rows] == order[:20]
    for r in rows:
        cn, aa = non_edges[(r["part_a"], r["part_b"])]
        assert r["cn"] == cn
        assert r["adamic_adar"] == pytest.approx(round(aa, 6), abs=2e-6)
        assert r["rank"] == rows.index(r) + 1


def _avg_ranks(values):
    """value -> average rank (1-based, ties averaged) — the textbook
    definition, independent of the doubled-rank prefix-sum identity the
    engine and oracle both use."""
    from collections import Counter

    cnt = Counter(values)
    ranks, start = {}, 1
    for v in sorted(cnt):
        t = cnt[v]
        ranks[v] = start + (t - 1) / 2.0
        start += t
    return ranks, cnt


def test_mann_whitney_matches_python_mirror(spark, sf_dir):
    import math

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    rows = (load_table(spark, sf_dir, "lineitem")
            .select("l_extendedprice", "l_returnflag").collect())
    vals = [r["l_extendedprice"] for r in rows]
    ranks, cnt = _avg_ranks(vals)
    g1 = [r["l_extendedprice"] for r in rows if r["l_returnflag"] == "R"]
    n1, n2 = len(g1), len(rows) - len(g1)
    r1 = sum(ranks[v] for v in g1)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    tt = sum(t ** 3 - t for t in cnt.values())
    var_u = n1 * n2 / 12.0 * ((n + 1) - tt / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var_u)
    (got,) = R8B_QUERIES["lineitem_mann_whitney"][0](spark, sf_dir).collect()
    assert (got["n_returned"], got["n_kept"]) == (n1, n2)
    assert got["u_stat"] == round(u1, 1)          # .5-quantized, exact
    assert got["z_stat"] == pytest.approx(round(z, 4), abs=2e-4)


def test_kruskal_wallis_matches_python_mirror(spark, sf_dir):
    from collections import defaultdict

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    rows = (load_table(spark, sf_dir, "orders")
            .select("o_totalprice", "o_orderpriority").collect())
    ranks, cnt = _avg_ranks([r["o_totalprice"] for r in rows])
    groups = defaultdict(list)
    for r in rows:
        groups[r["o_orderpriority"]].append(r["o_totalprice"])
    n = len(rows)
    tt = sum(t ** 3 - t for t in cnt.values())
    s = sum(sum(ranks[v] for v in vs) ** 2 / len(vs)
            for vs in groups.values())
    h = (12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)) \
        / (1.0 - tt / (n ** 3 - n))
    got = R8B_QUERIES["orders_kruskal_wallis"][0](spark, sf_dir).collect()
    assert len(got) == len(groups) == 5
    for r in got:
        vs = groups[r["pri"]]
        assert r["nj"] == len(vs)
        mean_rank = sum(ranks[v] for v in vs) / len(vs)
        assert r["mean_rank"] == pytest.approx(round(mean_rank, 6), abs=2e-6)
        assert r["h_stat"] == pytest.approx(round(h, 4), abs=2e-4)


def test_decile_migration_matches_python_mirror(spark, sf_dir):
    import datetime
    from decimal import Decimal, ROUND_HALF_UP

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    rows = (load_table(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderdate", "o_totalprice").collect())

    def deciles(year):
        cents = {}
        for r in rows:
            d = r["o_orderdate"]
            y = d.year if isinstance(d, (datetime.date, datetime.datetime)) \
                else int(str(d)[:4])
            if y != year:
                continue
            c = int((Decimal(str(r["o_totalprice"])) * 100)
                    .to_integral_value(ROUND_HALF_UP))
            cents[r["o_custkey"]] = cents.get(r["o_custkey"], 0) + c
        ranked = sorted(cents, key=lambda k: (-cents[k], k))
        n = len(ranked)
        return {ck: (rk * 10) // n for rk, ck in enumerate(ranked)}

    d94, d95 = deciles(1996), deciles(1997)
    agg = {}
    for ck, a in d94.items():
        if ck not in d95:
            continue
        b = d95[ck]
        n, stay, up, down, s = agg.get(a, (0, 0, 0, 0, 0))
        agg[a] = (n + 1, stay + (b == a), up + (b < a), down + (b > a),
                  s + b)
    got = {r["decile_1996"]: r for r in R8B_QUERIES[
        "customer_decile_migration"][0](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for dec, (n, stay, up, down, s) in agg.items():
        r = got[dec]
        assert (r["n"], r["n_stay"], r["n_up"], r["n_down"]) \
            == (n, stay, up, down)
        assert r["mean_dec_1997"] == pytest.approx(round(s / n, 6),
                                                   abs=2e-6)


def test_type_overlap_jaccard_matches_python_mirror(spark, sf_dir):
    from collections import defaultdict

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    users = defaultdict(set)
    for r in (load_table(spark, sf_dir, "events")
              .select("event_type", "user_id").collect()):
        users[r["event_type"]].add(r["user_id"])
    types = sorted(users)
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            ni = len(users[a] & users[b])
            if ni:
                want[(a, b)] = (len(users[a]), len(users[b]), ni,
                                round(ni / len(users[a] | users[b]), 6))
    got = {(r["type_a"], r["type_b"]):
           (r["n_users_a"], r["n_users_b"], r["n_both"], r["jaccard"])
           for r in R8B_QUERIES["events_type_overlap_jaccard"][0](
               spark, sf_dir).collect()}
    assert set(got) == set(want)
    for k, (na, nb, ni, j) in want.items():
        gna, gnb, gni, gj = got[k]
        assert (gna, gnb, gni) == (na, nb, ni)
        assert gj == pytest.approx(j, abs=2e-6)


def test_cramers_v_matches_python_mirror(spark, sf_dir):
    import math
    from collections import Counter

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    cells = Counter((r["l_returnflag"], r["l_linestatus"])
                    for r in load_table(spark, sf_dir, "lineitem")
                    .select("l_returnflag", "l_linestatus").collect())
    rows = Counter()
    cols = Counter()
    for (rf, ls), o in cells.items():
        rows[rf] += o
        cols[ls] += o
    n = sum(cells.values())
    chi2 = sum((o - rows[rf] * cols[ls] / n) ** 2 / (rows[rf] * cols[ls] / n)
               for (rf, ls), o in cells.items())
    k = min(len(rows), len(cols)) - 1
    (got,) = R8B_QUERIES["lineitem_cramers_v"][0](spark, sf_dir).collect()
    assert got["n_rows"] == n
    assert got["dof"] == (len(rows) - 1) * (len(cols) - 1)
    assert got["chi2"] == pytest.approx(round(chi2, 4), abs=2e-3)
    assert got["cramers_v"] == pytest.approx(
        round(math.sqrt(chi2 / (n * k)), 6), abs=2e-6)


def test_also_bought_topk_matches_python_mirror(spark, sf_dir):
    from collections import defaultdict

    from sedona_iceberg_extension_spark.plans.queries_r8 import R8_QUERIES

    by_order = defaultdict(set)
    for ok, pk in _lineitem_pairs(spark, sf_dir):
        by_order[ok].add(pk)
    supp = defaultdict(int)
    for parts in by_order.values():
        for p in parts:
            for q in parts:
                if p != q:
                    supp[(p, q)] += 1
    want = []
    for p in sorted({p for p, _ in supp if p <= 50}):
        cands = sorted(((q, s) for (pp, q), s in supp.items() if pp == p),
                       key=lambda t: (-t[1], t[0]))[:3]
        want += [(p, q, s, i + 1) for i, (q, s) in enumerate(cands)]
    got = [(r["p_partkey"], r["also_bought"], r["supp"], r["rank"])
           for r in R8_QUERIES["part_also_bought_topk"][0](
               spark, sf_dir).collect()]
    assert got == want


def test_feature_hashing_collisions_matches_python_mirror(spark, sf_dir):
    """The hashing-trick audit re-derived with hashlib.md5 and Python
    Counter arithmetic (the portable 60-bit hash is defined as the first
    15 md5 hex chars — reproduced here from the definition, not the SQL)."""
    import hashlib
    import re
    from collections import Counter

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    terms = set()
    for r in (load_table(spark, sf_dir, "documents")
              .select("text").collect()):
        for t in re.split(r"\s+", r["text"].strip().lower()):
            if t:
                terms.add(t)
    loads = Counter(
        int(hashlib.md5(f"{t}#feat".encode()).hexdigest()[:15], 16) % 4096
        for t in terms)
    n_terms = sum(loads.values())
    (got,) = R8B_QUERIES["feature_hashing_collisions"][0](
        spark, sf_dir).collect()
    assert got["n_terms"] == n_terms
    assert got["n_buckets_used"] == len(loads)
    assert got["max_load"] == max(loads.values())
    assert got["n_singletons"] == sum(1 for v in loads.values() if v == 1)
    assert got["collision_rate"] == pytest.approx(
        round(1.0 - len(loads) / n_terms, 6), abs=2e-6)


def test_blocklist_rate_matches_python_mirror(spark, sf_dir):
    import re
    from collections import defaultdict

    from sedona_iceberg_extension_spark.plans.queries_r8 import R8_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    pat = re.compile(r"\b(danger|risk|attack|broken|fail)\w*")
    agg = defaultdict(lambda: [0, 0])
    for r in (load_table(spark, sf_dir, "documents")
              .select("source", "text").collect()):
        a = agg[r["source"]]
        a[0] += 1
        a[1] += 1 if pat.search(r["text"].lower()) else 0
    got = {r["source"]: (r["n_docs"], r["n_hits"], r["hit_rate"])
           for r in R8_QUERIES["doc_blocklist_rate"][0](
               spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for src, (n, h) in agg.items():
        gn, gh, grate = got[src]
        assert (gn, gh) == (n, h)
        assert grate == pytest.approx(round(h / n, 9), abs=2e-9)


def test_assoc_rules_matches_python_mirror(spark, sf_dir):
    """Directed brand association rules re-derived from per-order brand
    sets with dict arithmetic: every measure (support, confidence, lift,
    leverage, conviction) and the lift-ranked top-15."""
    from collections import defaultdict

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    brand = {r["p_partkey"]: r["p_brand"]
             for r in load_table(spark, sf_dir, "part")
             .select("p_partkey", "p_brand").collect()}
    baskets = defaultdict(set)
    for r in (load_table(spark, sf_dir, "lineitem")
              .select("l_orderkey", "l_partkey").collect()):
        if r["l_partkey"] in brand:
            baskets[r["l_orderkey"]].add(brand[r["l_partkey"]])
    n = len(baskets)
    nb = defaultdict(int)
    nab = defaultdict(int)
    for bs in baskets.values():
        for x in bs:
            nb[x] += 1
            for y in bs:
                if x != y:
                    nab[(x, y)] += 1
    rules = {}
    for (x, y), c in nab.items():
        supp, conf, supb = c / n, c / nb[x], nb[y] / n
        lift = supp / ((nb[x] / n) * supb)
        lev = supp - (nb[x] / n) * supb
        conv = None if c == nb[x] else (1.0 - supb) / (1.0 - conf)
        rules[(x, y)] = (c, round(supp, 6), round(conf, 6), round(lift, 6),
                         round(lev, 6),
                         None if conv is None else round(conv, 6))
    order = sorted(rules, key=lambda k: (-rules[k][3], k[0], k[1]))[:15]
    rows = R8B_QUERIES["brand_assoc_rules"][0](spark, sf_dir).collect()
    assert [(r["antecedent"], r["consequent"]) for r in rows] == order
    for r in rows:
        c, supp, conf, lift, lev, conv = rules[(r["antecedent"],
                                                r["consequent"])]
        assert r["n_both"] == c
        for gcol, wval in (("support", supp), ("confidence", conf),
                           ("lift", lift), ("leverage", lev),
                           ("conviction", conv)):
            if wval is None:
                assert r[gcol] is None
            else:
                assert r[gcol] == pytest.approx(wval, abs=2e-6)


def test_three_way_split_matches_python_mirror(spark, sf_dir):
    """The deterministic 90/5/5 split re-derived from hashlib.md5 over the
    stringified doc_id — the split a user reproduces outside either
    engine, which is the whole point of the portable hash."""
    import hashlib
    from collections import defaultdict

    from sedona_iceberg_extension_spark.plans.queries_r8 import R8_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    cnt = defaultdict(int)
    tot = defaultdict(int)
    for r in (load_table(spark, sf_dir, "documents")
              .select("doc_id", "lang").collect()):
        h = int(hashlib.md5(f"{r['doc_id']}#split".encode())
                .hexdigest()[:15], 16) % 100
        split = "train" if h < 90 else ("val" if h < 95 else "test")
        cnt[(r["lang"], split)] += 1
        tot[r["lang"]] += 1
    got = {(r["lang"], r["split"]): (r["n"], r["share"])
           for r in R8_QUERIES["dataset_three_way_split"][0](
               spark, sf_dir).collect()}
    assert set(got) == set(cnt)
    for (lang, split), n in cnt.items():
        gn, gshare = got[(lang, split)]
        assert gn == n
        assert gshare == pytest.approx(round(n / tot[lang], 9), abs=2e-9)
    # the split must actually be three-way somewhere
    assert {s for _, s in cnt} == {"train", "val", "test"}


def test_doc_stitch_pairs_matches_python_mirror(spark, sf_dir):
    import re
    from collections import defaultdict

    from sedona_iceberg_extension_spark.plans.queries_r8 import R8_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    base = {}
    for r in (load_table(spark, sf_dir, "documents")
              .select("doc_id", "text").collect()):
        tk = re.split(r"\s+", r["text"].strip().lower())
        if len(tk) >= 10:
            base[r["doc_id"]] = tk
    allv = dict(base)
    for did, tk in base.items():
        if did < 20:
            allv[did + 2000000] = tk[-5:] + ["synthetic", "continuation",
                                             "marker"]
    heads = defaultdict(list)
    for did, tk in allv.items():
        heads[" ".join(tk[:5])].append(did)
    want = sorted((a, b, k)
                  for did_a, tk in allv.items()
                  for k in [" ".join(tk[-5:])]
                  for b in heads.get(k, [])
                  for a in [did_a] if a != b)
    got = [(r["a_doc"], r["b_doc"], r["boundary"])
           for r in R8_QUERIES["doc_stitch_pairs"][0](spark, sf_dir).collect()]
    assert got == want
    # every planted continuation is found (recall of the planted truth)
    planted = {(d, d + 2000000) for d in base if d < 20}
    assert planted <= {(a, b) for a, b, _ in got}


def test_entity_blocking_matches_python_mirror(spark, sf_dir):
    import math
    from collections import Counter

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    rows = (load_table(spark, sf_dir, "customer")
            .select("c_mktsegment", "c_acctbal").collect())
    blocks = Counter((r["c_mktsegment"],
                      math.floor(r["c_acctbal"] / 1000.0)) for r in rows)
    n = len(rows)
    cand = sum(b * (b - 1) // 2 for b in blocks.values())
    (got,) = R8B_QUERIES["customer_entity_blocking"][0](
        spark, sf_dir).collect()
    assert got["n_customers"] == n
    assert got["n_blocks"] == len(blocks)
    assert got["max_block"] == max(blocks.values())
    assert got["cand_pairs"] == cand
    assert got["mean_block"] == pytest.approx(
        round(n / len(blocks), 6), abs=2e-6)
    assert got["reduction_ratio"] == pytest.approx(
        round(1.0 - cand / (n * (n - 1) / 2), 6), abs=2e-6)


def test_autocomplete_matches_python_mirror(spark, sf_dir):
    from collections import Counter, defaultdict

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    tc = Counter(t for r in load_table(spark, sf_dir, "part")
                 .select("p_name").collect()
                 for t in r["p_name"].lower().split(" ") if len(t) >= 4)
    ptot = defaultdict(int)
    for tok, c in tc.items():
        ptot[tok[:4]] += c
    top_pre = sorted(ptot, key=lambda p: (-ptot[p], p))[:10]
    want = []
    for p in sorted(top_pre):
        comps = sorted(((t, c) for t, c in tc.items() if t[:4] == p),
                       key=lambda tcp: (-tcp[1], tcp[0]))[:3]
        want += [(p, ptot[p], i + 1, t, c)
                 for i, (t, c) in enumerate(comps)]
    got = [(r["prefix"], r["prefix_freq"], r["rk"], r["completion"],
            r["completion_freq"])
           for r in R8B_QUERIES["part_name_autocomplete"][0](
               spark, sf_dir).collect()]
    assert got == want


def test_rake_keywords_match_python_mirror(spark, sf_dir):
    """RAKE re-derived imperatively: maximal non-stopword runs per doc,
    degree/frequency word scores over all phrase instances, additive
    phrase scores, lexicographic-tie top-15."""
    import re
    from collections import Counter

    from sedona_iceberg_extension_spark.plans.queries_r8b import (
        R8B_QUERIES, _RAKE_STOPS)
    from sedona_iceberg_extension_spark.sources.tables import load_table

    stops = set(_RAKE_STOPS)
    instances = []
    for r in (load_table(spark, sf_dir, "documents")
              .select("text").collect()):
        tk = re.split(r"\s+", r["text"].strip().lower())
        run = []
        prev = None
        for i, t in enumerate(tk):
            if t and t not in stops:
                if prev is not None and i != prev + 1:
                    instances.append(run)
                    run = []
                run.append(t)
                prev = i
        if run:
            instances.append(run)
    instances = [p for p in instances if len(p) <= 4]
    freq = Counter(w for p in instances for w in p)
    deg = Counter()
    for p in instances:
        for w in p:
            deg[w] += len(p)
    scores = {}
    for p in {" ".join(p) for p in instances}:
        scores[p] = round(sum(deg[w] / freq[w] for w in p.split(" ")), 6)
    order = sorted(scores, key=lambda p: (-scores[p], p))[:15]
    rows = R8B_QUERIES["doc_keyword_rake"][0](spark, sf_dir).collect()
    assert [r["phrase"] for r in rows] == order
    for r in rows:
        assert r["score"] == pytest.approx(scores[r["phrase"]], abs=2e-6)
        assert r["rank"] == rows.index(r) + 1


def test_partition_skew_audit_matches_python_mirror(spark, sf_dir):
    import hashlib
    from collections import Counter

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    rows = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source").collect())
    key = Counter(r["source"] for r in rows)
    hsh = Counter(
        int(hashlib.md5(f"{r['doc_id']}#part".encode()).hexdigest()[:15], 16)
        % 32 for r in rows)
    got = {r["strategy"]: r for r in R8B_QUERIES[
        "doc_partition_skew_audit"][0](spark, sf_dir).collect()}
    for tag, per in (("key_by_source", key), ("hash_32", hsh)):
        g = got[tag]
        assert g["n_parts"] == len(per)
        assert g["n_rows"] == sum(per.values())
        assert g["max_rows"] == max(per.values())
        assert g["skew_factor"] == pytest.approx(
            round(max(per.values()) * len(per) / sum(per.values()), 6),
            abs=2e-6)


def test_scan_pruning_stats_matches_python_mirror(spark, sf_dir):
    """The manifest-pruning simulation re-derived by sorting the rows in
    Python and chunking into 32 equal files — both layouts' per-file
    min/max stats and the one-month predicate's read set."""
    import datetime

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    rows = []
    for r in (load_table(spark, sf_dir, "lineitem")
              .select("l_orderkey", "l_linenumber", "l_shipdate").collect()):
        d = r["l_shipdate"]
        if isinstance(d, datetime.datetime):
            d = d.date()
        rows.append((r["l_orderkey"], r["l_linenumber"], d))
    n = len(rows)
    p_lo, p_hi = datetime.date(1994, 3, 1), datetime.date(1994, 4, 1)

    def audit(ordered):
        stats = {}
        for i, (_, _, sd) in enumerate(ordered):
            f = i * 32 // n
            lo, hi = stats.get(f, (sd, sd))
            stats[f] = (min(lo, sd), max(hi, sd))
        read = sum(1 for lo, hi in stats.values()
                   if lo < p_hi and hi >= p_lo)
        return len(stats), read

    want = {
        "natural": audit(sorted(rows, key=lambda t: (t[0], t[1]))),
        "shipdate_sorted": audit(sorted(rows,
                                        key=lambda t: (t[2], t[0], t[1]))),
    }
    got = {r["layout"]: r for r in R8B_QUERIES["scan_pruning_stats"][0](
        spark, sf_dir).collect()}
    assert set(got) == set(want)
    for tag, (nf, nr) in want.items():
        g = got[tag]
        assert (g["n_files"], g["n_files_read"]) == (nf, nr)
        assert g["read_fraction"] == pytest.approx(round(nr / nf, 6),
                                                   abs=2e-6)
    # the sorted layout never reads MORE files (at sf0.001 the one-month
    # predicate can select zero files in both layouts — equality is fine)
    assert want["shipdate_sorted"][1] <= want["natural"][1]


def test_sentence_dedup_matches_python_mirror(spark, sf_dir):
    """CCNet-grain sentence dedup re-derived with re.split + hashlib.md5.
    Spark's trim removes ASCII spaces only, so the mirror strips ' '
    (not all whitespace) to stay faithful."""
    import hashlib
    import re
    from collections import Counter, defaultdict

    from sedona_iceberg_extension_spark.plans.queries_r8b import R8B_QUERIES
    from sedona_iceberg_extension_spark.sources.tables import load_table

    per = defaultdict(Counter)
    for r in (load_table(spark, sf_dir, "documents")
              .select("source", "text").collect()):
        for s in re.split(r"[.!?]+", r["text"]):
            s = s.strip(" ")
            if len(s) >= 20:
                h = int(hashlib.md5(f"{s}#sent".encode())
                        .hexdigest()[:15], 16)
                per[r["source"]][h] += 1
    got = {r["source"]: r for r in R8B_QUERIES["doc_sentence_dedup"][0](
        spark, sf_dir).collect()}
    assert set(got) == set(per)
    for src, cnt in per.items():
        g = got[src]
        n, d = sum(cnt.values()), len(cnt)
        assert (g["n_sentences"], g["n_distinct"],
                g["max_multiplicity"]) == (n, d, max(cnt.values()))
        assert g["dup_rate"] == pytest.approx(round(1.0 - d / n, 6),
                                              abs=2e-6)
