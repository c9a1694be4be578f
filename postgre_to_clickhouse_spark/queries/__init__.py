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

# The r14 window, per the policy above. Ledger at rotation time
# (reconstructed from CORRECTNESS_r*.json by max green round per
# query): r8 ×3, r9 ×44, r10 ×38, r11 ×50, r12 ×50, r13 ×50,
# never-green ×2 (the r14 queries, each committed with a passing
# in-session oracle run per the registration rule — and additionally
# green in this session's full 237/237 driver simulation at sf0.01).
#
# Rule 1 takes 5 seats: the five NEW queries — exact_substr_spans
# (EXACT suffix-array ExactSubstr span detection, VERDICT r13
# "What's missing" #3), suffix_array_rank (the exact distributed
# suffix array itself, oracle = DuckDB sorting literal suffixes),
# suffix_lcp_rank (the LCP array alongside it — the complete SA+LCP
# primitive; oracle recomputes every lcp from literal sorted
# suffixes), hard_negative_mining (retrieval-training negatives with
# false-negative denoising, session 2) and exact_substr_trim (the
# REMOVAL half — cleaned corpus, oracle rebuilds every cleaned
# string from complement segments; session 2). Each landed with a
# passing in-session oracle run.
#
# No previously-registered query's compiled plan changed this round:
# the r14 engine diffs are a NEW module (operators/suffix_array.py),
# a NEW function (sampling.global_dense_rank — global_rank itself is
# byte-identical), wire-only surface no registered query transits
# (native-wire LZ4 frames in ch_native/ch_compress, MySQL COM_STMT_*
# binary protocol, the ch_http empty-INSERT-body diagnostic, the
# TablesStatus pair fix), and comment-only edits in ch_ddl —
# compiled plans byte-identical for every rule-2 seat.
#
# Rule 2 backfills oldest-green-first: the THREE r8 queries whose
# deferral r13 promised in writing (agg_combinators_events,
# approx_topk_by_lang, approx_topk_tokens) seat FIRST, then the r9
# cohort. Rule 1's third seat (suffix_lcp_rank) displaces the single
# r10 seat the session-1 rotation had reached (array_manipulation),
# and its fourth and fifth (hard_negative_mining, exact_substr_trim)
# take the overflow from the r9 cohort from the END of the alphabet
# per the overflow convention — with_totals_status and
# welch_ttest_values defer to r15, named here; all deferred queries
# stay oracle-gated in pytest. After this round exactly TWO queries'
# last driver-green is r9 (the two named), none older, and they plus
# the r10 cohort (38) are the next reseat obligation.
_WINDOW = [
    # --- Rule 1: new in r15 (each landed with a passing in-session
    # oracle run) ---
    "quality_classifier_score",     # C4 CCNet/fastText quality model
    "quality_classifier_eval",      # C4 its held-out confusion/P/R/F1
    "longest_repeat_documents",     # C2 SA+LCP argmax consumption
    # --- Rule 2: oldest-green-first. The two r9 deferrals named by
    # the r14 window comment seat first (last driver-green r9) ---
    "welch_ttest_values",
    "with_totals_status",
    # --- then the full r10 cohort (38, last driver-green r10) ---
    "array_manipulation",
    "asof_events_last_order",
    "band_join_acctbal",
    "bm25_topk",
    "cap_per_source_skewsafe",
    "categorical_iv_weekday",
    "cdc_dedup_redelivery",
    "cdc_full_scan",
    "cdc_latest_state",
    "cdc_mv_transform",
    "cdc_users_pipeline",
    "ch_dialect_union",
    "contingency_theils_u",
    "decontaminate_eval_overlap",
    "dedup_incremental_batch",
    "dedup_pipeline_canonical",
    "geohashes_in_box_probe",
    "lttb_downsample_events",
    "manifest_agg_projection_read",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q20_excess_suppliers",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "semdedup_prune",
    "series_period_events",
    "text_analysis_composite",
    "tfidf_top_terms",
    "vector_cosine_topk",
    "vector_ivf_topk",
    # --- remaining seats: r11 cohort backfill, oldest-green-first
    # alphabetical (each displaced by a later rule-1 seat if more
    # queries land this round) ---
    "cdc_ch_ddl_pipeline",
    "ch_ddl_alter_pipeline",
    "ch_ddl_evolution_pipeline",
    "ch_dialect_agg_state_mv",
    "ch_dialect_any_join",
    "ch_dialect_array_join",
    "ch_dialect_asof",
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
