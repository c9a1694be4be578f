"""Driver-facing query battery (SURVEY.md §2 inventory → `queries()`).

Importing this package populates the registry from the tier modules,
then reorders it so the driver's CORRECTNESS window (the first 50
registered queries) covers every SURVEY §2 operator class. Everything
after slot 50 stays registered and oracle-gated in pytest.

ROTATION POLICY (r9, VERDICT r8 #2 — a standing rule, not a per-round
judgment call):

1. Every query that is NEW this round, has NEVER been driver-checked,
   or whose SEMANTICS or implementation internals changed this round
   (including operators it transitively exercises) is seated.
2. Remaining slots backfill OLDEST-GREEN-FIRST from the per-query
   last-driver-green ledger (reconstructable from CORRECTNESS_r*.json;
   ties broken alphabetically), so no query's latest green row ages
   beyond a few rounds and a silent regression has nowhere to hide.
3. Everything rotated out stays registered, oracle-gated in pytest
   (tests/test_oracle_correctness.py runs the FULL battery), and
   bench-visible.

REGISTRATION RULE (r10, VERDICT r9 #2 — a standing rule): a new
``@register`` entry may be committed ONLY together with a passing
``pytest tests/test_oracle_correctness.py -k <name>`` run in the same
session, and the end-of-round snapshot commit must contain NO new
registry entries. New queries land mid-round, tested, seated in the
window — never in the closing snapshot. (r8 shipped untested bloom
indexes in its snapshot; r9 shipped two untested tierb6 queries, one
with an unbindable oracle. This rule exists so that cannot recur.)
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
from postgre_to_clickhouse_spark.queries import tpch_spec  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc8  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierb5  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierb6  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import goldens  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import ch_dialect  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc9  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc10  # noqa: E402,F401

# The r16 window, per the policy above. Ledger at rotation time
# (reconstructed from CORRECTNESS_r*.json by max green round per
# query): r11 ×45 (the reseat obligation the r15 window comment
# named), r12 ×50, r13 ×50, r14 ×50, r15 ×50, never-green ×8 (the
# r16 queries, each committed with a passing in-session oracle run
# per the registration rule — additionally green in this round's
# full driver simulations at sf0.01: 246/246, 248/248, 248/248,
# 249/249, 250/250, 251/251, 252/252, 253/253 as they landed).
#
# Rule 1 takes 12 seats. NEW: kn_trigram_nll (modified Kneser-Ney,
# trigram order — VERDICT r15 #3), ccnet_pipeline_documents (the
# full CCNet pipeline composed end-to-end — VERDICT r15 #2),
# ch_dialect_any_full_join (ANY FULL JOIN — VERDICT r15 #7),
# min_k_prob_documents (Min-K% prob, arXiv:2310.16789 — the
# pretraining-data membership/contamination signal, session 2),
# zipf_law_fit (corpus Zipf rank-frequency OLS fit — the per-corpus
# health audit next to the per-document filters, session 2), and
# heaps_law_fit (the Heaps'-law vocabulary-growth companion — the
# second number of the corpus-health readout, session 2), and
# tokenizer_fertility_by_lang (subword fertility + chars/token per
# language over the real BPE — the tokenizer-quality audit,
# session 2, committed-golden oracle), and
# source_ngram_overlap_matrix (cross-source distinct-5-gram overlap
# + exact Jaccard — the Dodge et al. 2021 slice-leakage audit,
# session 2).
# CHANGED INTERNALS: quality_classifier_score/_eval/_auc (the fit's
# label counts now ride the same single aggregation pass as the
# bucket counts — ADVICE r15; same model values, different fit plan)
# and kn_bigram_nll (kn_lm.py gained discount validation + the
# modified-KN machinery in the same module).
#
# Other engine diffs this round that transit previously-registered
# plans: ch_select._parse_from_body gained the comma-cross-join
# rewrite (a token-level identity for every FROM body without a
# depth-0 comma before the first JOIN — which is every previously
# registered query, since such commas refused loudly before) and the
# SETTINGS clause is now captured instead of dropped (no registered
# query carries a SETTINGS clause). Both verified by this session's
# full driver simulations (245/245 pre-change, 246/246 post). The
# ADVICE wire fixes (mysql long-data, native zstd-pin, http gzip)
# touch no registered query.
#
# Rule 2 backfills oldest-green-first: the r11 cohort (45,
# alphabetical). The 12 rule-1 seats displace the LAST SEVEN
# (stratified_sample_documents, text_clean_documents,
# text_repetition_stats, token_budget_per_lang, vector_int8_topk,
# vocabulary_top_terms, window_rank_family — named here; all stay
# oracle-gated in pytest and are the r17 backfill obligation together
# with the r12 cohort).
_WINDOW = [
    # --- Rule 1: new in r16 (each landed with a passing in-session
    # oracle run; min_k_prob additionally verified at sf0.01 AND
    # sf0.1 via the harness compare in-session) ---
    "kn_trigram_nll",               # C4 modified-KN trigram (KenLM)
    "ccnet_pipeline_documents",     # C4 CCNet end-to-end composite
    "ch_dialect_any_full_join",     # B3/A22 ANY FULL JOIN
    "min_k_prob_documents",         # C4 Min-K% prob (arXiv:2310.16789)
    "zipf_law_fit",                 # C4 corpus Zipf fit (session 2)
    "heaps_law_fit",                # C4 Heaps'-law companion (s2)
    "tokenizer_fertility_by_lang",  # C4 tokenizer fertility (s2)
    "source_ngram_overlap_matrix",  # C4 slice-leakage audit (s2)
    # --- Rule 1: internals changed in r16 ---
    "quality_classifier_score",     # single-pass fit (ADVICE r15)
    "quality_classifier_eval",
    "quality_classifier_auc",
    "kn_bigram_nll",                # kn_lm.py validation + growth
    # --- Rule 2: oldest-green-first — the full r11 cohort minus the
    # seven displaced seats named above (last driver-green r11) ---
    "ch_dialect_array_join",
    "ch_dialect_asof",
    "ch_dialect_except",
    "ch_dialect_fill_interval",
    "ch_dialect_hourly",
    "ch_dialect_join",
    "ch_dialect_subquery",
    "ch_dialect_top_events",
    "ch_dialect_window",
    "ch_dialect_with_fill",
    "document_chunks",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "funnel_strict_modes",
    "funnel_view_click_purchase",
    "grouping_sets_sql",
    "histogram_event_values",
    "json_typed_extraction",
    "lm_unigram_nll",
    "mix_rebalance_lang",
    "multimodal_audio_stats",
    "multimodal_video_frames",
    "pandas_udf_zscore",
    "percentiles_quantity",
    "q1_pricing_summary",
    "q4_order_priority",
    "q9_product_profit",
    "quality_filter_documents",
    "retention_view_cohorts",
    "safe_cast_funcs",
    "scalar_funcs_composite",
    "sequence_match_3step",
    "sequence_match_view_purchase",
    "session_window_native",
    "setop_nation_presence",
    "shuffle_training_order",
    "skew_salted_agg_events",
    "split_train_val_test",
]


def _reorder() -> None:
    missing = [n for n in _WINDOW if n not in QUERIES]
    if missing:
        raise KeyError(f"window names not registered: {missing}")
    if len(_WINDOW) != 50 or len(set(_WINDOW)) != 50:
        raise ValueError(f"window must be 50 unique names, got {len(_WINDOW)}")
    ordered = {n: QUERIES[n] for n in _WINDOW}
    for n, fn in QUERIES.items():
        if n not in ordered:
            ordered[n] = fn
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
