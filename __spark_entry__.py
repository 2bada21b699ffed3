"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship query smoke (sf0.001).
``queries``  — every implemented operator from SURVEY.md §2, spatial Tier A–D
               parity + Tier E pipeline operators (see
               sedona_iceberg_extension_spark/plans/queries.py).
``oracle_sql`` — exactly-mirrored DuckDB SQL per query: ALL declared
               queries carry an exact oracle (including the approximate
               paths — LSH/IVF ANN regenerate their hash-derived planes/
               codebooks in SQL; the HLL estimate is value-checked via
               portable-hash registers; multimodal's deterministic fake
               decode is mirrored byte-for-byte).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prepare(spark: SparkSession) -> SparkSession:
    from sedona_iceberg_extension_spark.session import register_all

    # the driver may hand us a session it built itself — make sure the
    # engine's function catalog and the nanos-parquet escape hatch are set
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    return register_all(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's own first
    real query shape (App.scala:55-56) — spatial range filter + projection
    over points derived from customer, fully native plan."""
    from sedona_iceberg_extension_spark.plans.queries import q_spatial_range_contains

    _prepare(spark)
    return q_spatial_range_contains(spark, "/root/testdata/sf0.001")


# Highest-value queries for the driver's rotating correctness sample,
# listed first so an order-respecting sampler hashes them before
# re-checking known-green ones.  Round-8 refresh (VERDICT r7 item #2):
#   1. the two r07 red hashes — both were oracle-side HUGEINT typing bugs
#      (DuckDB widens SUM(BIGINT) to HUGEINT, the driver's pandas path
#      renders it float64), fixed with explicit CASTs and a repo-wide
#      type gate (tests/test_oracle_types.py) — need a green re-hash;
#   2. the five queries no driver round has ever sampled;
#   3. four rows whose only driver record is a stale r01 "no_oracle" —
#      they gained exact oracles in later rounds but were never in this
#      list, so the sampler kept skipping them;
#   4. round-8 additions (never sampled by construction).
# All pass the local differential gate (tools/diff_oracle.py, bitwise
# float canon + HUGEINT/DECIMAL type gate).
_NEVER_DRIVER_SAMPLED = [
    # r07 red hashes, oracle-side CASTs applied this round
    "grouping_sets_revenue", "ship_survival_km",
    # never driver-sampled
    "embedding_logreg_irls", "nb_lang_classifier", "spatial_areal_interp",
    "dq_profile_lineitem", "multimodal_resize",
    # stale r01 "no_oracle" rows — exact oracles added later, never re-hashed
    "lsh_ann_topk", "ivf_ann_topk", "multimodal_features",
    "multimodal_frame_sample",
    # DECIMAL-typed oracle output fixed this round (was driver-green only
    # because the value happened to render identically)
    "spatial_split_boxes",
    # round-8 additions (never sampled by construction)
    "scd2_customer_history", "source_capped_sample", "order_interval_overlap",
    "attribution_last_touch", "events_psi_drift", "lineitem_robust_stats",
    "kmv_intersection_estimate", "part_bfs_distance",
    "dsir_importance_weights", "semdedup_prune", "embedding_pca_power",
    "streaming_outer_join_watermark", "value_equidepth_histogram",
    "join_cardinality_sketch", "partkey_skew_gini", "bpe_merge_rounds",
    "part_label_propagation", "orders_forecast_seasonal",
    "session_funnel_conversion", "jl_projection_distortion",
    "embedding_int8_quant_error", "doc_stitch_pairs",
    "colbert_maxsim_topk", "source_lang_kl", "snapshot_files_stats",
    "spatial_hexbin_density", "events_ks_test", "lineitem_group_ols",
    "part_also_bought_topk", "user_transition_entropy",
    "multimodal_audio_chunks", "part_link_prediction", "ivm_orders_agg",
    "lineitem_discount_did", "events_rate_intervals",
    "doc_blocklist_rate", "events_changepoint_binseg",
    "embedding_matryoshka_recall", "part_kcore",
    "tfidf_cosine_pairs", "dataset_three_way_split",
    "spatial_box_overlay_matrix", "orders_weekday_anova",
    "lineitem_spearman", "lang_source_mutual_info", "price_benford",
    "part_degree_assortativity", "cohort_ltv_matrix",
    "part_graph_modularity",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sedona_iceberg_extension_spark.plans.queries import QUERIES

    front = [n for n in _NEVER_DRIVER_SAMPLED if n in QUERIES]
    names = front + [n for n in QUERIES if n not in set(front)]
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in names:
        def run(spark: SparkSession, sf_dir: str,
                _fn=QUERIES[name].fn) -> DataFrame:
            _prepare(spark)
            return _fn(spark, sf_dir)
        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    from sedona_iceberg_extension_spark.plans.queries import QUERIES

    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
