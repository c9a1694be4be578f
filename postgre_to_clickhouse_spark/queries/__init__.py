"""Driver-facing query battery (SURVEY.md §2 inventory → `queries()`).

Importing this package populates the registry from the tier modules,
then reorders it so the driver's CORRECTNESS window (the first 50
registered queries) covers every SURVEY §2 operator class — the CDC
spine, all 22 TPC-H shapes, one representative per Tier B family
(composites pack the scalar-function families into single slots), and
the full Tier C training-data battery including the golden-backed
hash-family operators and the multimodal codec path. Everything after
slot 50 stays registered and oracle-gated in pytest.
"""

from postgre_to_clickhouse_spark.queries.registry import ORACLES, QUERIES

# Populate registries.
from postgre_to_clickhouse_spark.queries import tiera  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierb  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierb2  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierb3  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tpch_extra  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tpch_suite  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc2  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc3  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import composites  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc5  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc6  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc7  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierb4  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import goldens  # noqa: E402,F401

# The driver checks the FIRST 50 registered queries; this is the curated
# window. r5 rotation (VERDICT r4 #1): the 22 TPC-H shapes are green in
# BOTH r1/r2-era and r4 windows, so all but three representatives
# rotate out to seat the 27 queries that had never had a driver-green
# CORRECTNESS row, plus the two new r5 operators. Queries whose
# semantics changed in r5 (funnel default mode, PNG-mix image stats,
# BM25 precision, int8 top-k shape) stay/enter the window so the change
# itself gets re-verified by the driver. Everything rotated out remains
# registered and oracle-gated in pytest.
_WINDOW = [
    # Tier A — CDC spine (A11–A21)
    "cdc_full_scan",
    "cdc_mv_transform",
    "cdc_dedup_redelivery",
    "cdc_latest_state",
    "cdc_users_pipeline",         # A11-A20 composed end-to-end (never windowed)
    # Tier B — TPC-H representatives (full suite green r1+r4; rest rotated out)
    "q1_pricing_summary",         # B1/B2/B7 scan+filter+agg
    "q4_order_priority",          # B4 semi join
    "q9_product_profit",          # B3 multi-join profit
    # Tier B — one per remaining family
    "band_join_acctbal",          # B5 theta/range
    "asof_events_last_order",     # B6 as-of
    "percentiles_quantity",       # B8 quantiles
    "grouping_sets_sql",          # B9 + A22 SQL surface
    "window_rank_family",         # B10
    "setop_nation_presence",      # B12
    "scalar_funcs_composite",     # B13+B14+B15+conditional+try_cast
    "safe_cast_funcs",            # B13 try_cast family (never windowed)
    "json_typed_extraction",      # B16
    "array_manipulation",         # B17
    "session_window_native",      # B18 native session windows
    "pandas_udf_zscore",          # B19 Arrow path (golden)
    "skew_salted_agg_events",     # B7 skew salting (never windowed)
    # ClickHouse endpoint analytics (r4/r5 operators)
    "funnel_view_click_purchase",  # B21 windowFunnel default (r5: >= semantics)
    "funnel_strict_modes",        # B21 strict_increase/dedup/order (new r5)
    "sequence_match_view_purchase",  # B21 sequenceMatch 2-step (never windowed)
    "sequence_match_3step",       # B21 guarded 3-step DP (new r5)
    "retention_view_cohorts",     # B21 retention (never windowed)
    "histogram_event_values",     # B21 histogram (never windowed)
    # Tier C — training-data pipeline (never-windowed set + changed-in-r5)
    "bm25_topk",                  # C11 lexical retrieval (r5: precision 28)
    "vector_int8_topk",           # C3 quantized top-k (r5: salted two-phase)
    "embedding_quantize_int8",    # C3 int8 quantization
    "embedding_random_projection",  # C3 JL projection
    "embedding_near_dup_pairs",   # C2 embedding-cosine near-dup
    "dedup_incremental_batch",    # C1 incremental digest anti-join
    "dedup_pipeline_canonical",   # C2 LSH→verify→CC→survivor (golden)
    "decontaminate_eval_overlap",  # C4 eval-set decontamination
    "lm_unigram_nll",             # C4 unigram-LM scoring
    "quality_filter_documents",   # C4 quality scoring
    "text_clean_documents",       # C4 cleaning
    "text_repetition_stats",      # C4 repetition stats
    "vocabulary_top_terms",       # C4 vocabulary
    "document_chunks",            # C4 chunking
    "shuffle_training_order",     # C6 deterministic epoch shuffle
    "split_train_val_test",       # C6 content-addressed splits
    "stratified_sample_documents",  # C6 stratified sampling
    "cap_per_source_skewsafe",    # C6 per-source cap
    "mix_rebalance_lang",         # C6 mixture rebalancing
    "token_budget_per_lang",      # C6 token-budget sampling
    "multimodal_image_stats",     # C5 real codec path (r5: BMP+PNG mix)
    "multimodal_audio_stats",     # C5 real WAV path (never windowed)
    "multimodal_video_frames",    # C5 video frame path (never windowed)
]
# r6 rotation candidates (registered after the window, all oracle-backed,
# never driver-checked): dup_span_coverage, ccnet_perplexity_buckets,
# summap_event_values, approx_topk_tokens, mixture_sample_weights,
# semantic_decontaminate_eval, weighted_quantile_events,
# argminmax_events, minhash_incremental_candidates,
# dataset_card_summary, timeseries_gap_fill, multimodal_audio_dsp,
# uniq_merge_rollup, approx_topk_weighted_tokens, interleave_datasets_order.
# Evict TPC-H/CDC
# slots that are double-green after r5 confirms this window.


def _reorder() -> None:
    missing = [n for n in _WINDOW if n not in QUERIES]
    if missing:
        raise KeyError(f"window names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in _WINDOW}
    for n, fn in QUERIES.items():
        if n not in ordered:
            ordered[n] = fn
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
