"""Driver-facing query registry.

Every operator from SURVEY.md §2 (plus the implied relational surface
and the LLM-pipeline extensions) registers one named query here, with a
DuckDB oracle SQL string where the semantics are SQL-expressible.
``/root/repo/__spark_entry__.py`` re-exports this registry.
"""

from .base import ORACLES, QUERIES, REGISTRY

# importing the modules populates the registry
from . import reference_ops  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import extended  # noqa: E402,F401
from . import tpch_shapes  # noqa: E402,F401
from . import tpch_more  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401
from . import llm2  # noqa: E402,F401
from . import analytics3  # noqa: E402,F401
from . import analytics4  # noqa: E402,F401
from . import llm3  # noqa: E402,F401
from . import modern_sql  # noqa: E402,F401
from . import analytics5  # noqa: E402,F401
from . import analytics6  # noqa: E402,F401
from . import analytics7  # noqa: E402,F401
from . import analytics8  # noqa: E402,F401
from . import llm4  # noqa: E402,F401
from . import analytics9  # noqa: E402,F401
from . import privacy  # noqa: E402,F401
from . import analytics10  # noqa: E402,F401
from . import analytics11  # noqa: E402,F401
from . import llm5  # noqa: E402,F401
from . import analytics12  # noqa: E402,F401
from . import analytics13  # noqa: E402,F401
from . import analytics14  # noqa: E402,F401
from . import analytics15  # noqa: E402,F401
from . import analytics16  # noqa: E402,F401
from . import llm6  # noqa: E402,F401
from . import analytics17  # noqa: E402,F401
from . import analytics18  # noqa: E402,F401

# --- driver-window ordering --------------------------------------------------
# The verify driver checks the FIRST 50 registry entries per round
# (CORRECTNESS_r01/r02/r03.json == first 50 of insertion order).
# Rounds 1-3 drove 143 distinct queries green (CORRECTNESS_r0{1,2,3});
# the one red row was embedding_covariance (float summation order —
# fixed to exact-integer Gram algebra this round). Round 4's window is
# exactly the 40 queries with no driver-green row yet: the 36 round-3
# additions, the 3 round-3 deferrals, and the re-checked
# embedding_covariance. ≤50, so this round closes the ledger: every
# registered query driver-checked. All 40 are additionally pre-flighted
# for partition-order determinism by
# tests/test_partitioning_robustness.py (the r03 covariance flake was
# local-green but driver-red; that class of bug is now caught locally).
_ROUND4_WINDOW = [
    # the fixed red row first
    "embedding_covariance",
    # round-3 deferrals
    "dedup_jaccard_capped", "embedding_pca_project",
    "multimodal_audio_windows",
    # round-3 additions, in registry order
    "asof_forward_next_purchase", "sketch_hll_time_merge",
    "event_path_transitions", "ts_anomaly_zscore", "events_dau_wau",
    "dedup_normalized_exact", "embedding_norm_stats",
    "stat_ab_proportion_ztest", "session_paths_top",
    "funnel_3step_conversion", "events_hourly_seasonality",
    "interval_join_session_overlap", "graph_pagerank_transitions",
    "orders_ship_latency", "ts_moving_avg_pct_change",
    "pareto_top_parts", "customer_order_gap_stats",
    "supplier_part_hhi", "events_value_outliers_iqr",
    "events_user_entropy", "window_funnel_levels",
    "nation_trade_balance", "text_zipf_slope", "events_burstiness_fano",
    "brand_revenue_share", "domain_mix_rebalance", "sim_hard_negatives",
    "multimodal_image_resize", "dedup_containment",
    "dedup_minhash_estimate", "dedup_cluster_keep_best",
    "embedding_label_centroids", "embedding_quantile_bins",
    "json_variant_extract", "string_collation_ci_group",
    "ansi_try_arithmetic",
    # positions 40-47: round-4 additions (new operators, pre-flighted by
    # the same parity + partitioning-robustness gates) — the driver cap
    # is 50, so these get checked alongside the 40 above
    "doc_quality_rules_gate", "split_stratified_hash",
    "embedding_centroid_classify", "graph_triangle_count",
    "agg_cube_status_priority", "lateral_topk_suppliers",
    "events_gap_sessionize", "events_outliers_mad",
    "recursive_trade_reach", "bitmap_user_segments",
]

# --- round-5 window plan (do NOT reorder this round: the r04 driver
# check must see _ROUND4_WINDOW as the first 50) -----------------------
# After VERDICT_r04, rotate the window to the oldest 50 queries with
# no driver CORRECTNESS row. The never-checked backlog (registration
# order): the 7 analytics6 additions + sketch_countmin_words, the 29
# round-4-continuation additions (analytics7-9, llm4, analytics8
# append, privacy), the wave-10/11 additions (analytics10/11,
# dedup_simhash_hamming), and the wave-12..17 additions (llm5 PQ/
# DBSCAN/IVFADC, analytics12-16, bpe_encode_apply, sql_group_by_all)
# and the wave-19..28 additions (llm6 eval harnesses + funnel,
# analytics17/18, eigvec/OLS/periodogram/IVFADC) — 93 total after a
# green r04 (286 registered − 143 driver-green − 50 in the r04
# window), so r05 takes the first 50 in registration order and r06
# closes the ledger. ALL of them are pre-flighted: parity-green at
# sf0.001/0.01/0.1, green under TZ=America/New_York, and bit-stable
# under hostile partitioning
# (tests/test_partitioning_robustness.py WINDOW list).


def _reorder() -> None:
    missing = [n for n in _ROUND4_WINDOW if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    ordered = {n: REGISTRY[n] for n in _ROUND4_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "QUERIES", "ORACLES"]
