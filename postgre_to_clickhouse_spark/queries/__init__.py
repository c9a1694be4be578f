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

# The r9 window, per the policy above. Ledger at rotation time:
# last-green r1 ×1, r3 ×3, r4 ×28, r5 ×48, r6 ×46, r8 ×50, plus
# sequence_match_dot never driver-checked (VERDICT r8 #1 of "missing").
# Session 2 grows rule 1 to 25 seats (19 brand-new queries — tierb5
# analytics/stats/geo, the three mutation/agg-projection lifecycle
# reads, the quantile-state MV — plus the never-checked and
# internals-changed re-verifies), displacing the r5 backfills and the
# r4 cohort's tail; session 3 adds the five tierb6 regression/
# correlation queries (rule 1 → 31 seats), displacing q17/q20/q22 and
# semdedup/text_analysis from the r4 backfill. Every displaced query
# stays oracle-gated in pytest and bench-visible, and rotates back
# under rule 2 from r10.
_WINDOW = [
    # --- Rule 1: new in r9 ---
    "manifest_bloom_read",        # A8 bloom/token-bloom skip indexes (r8 weak → proven)
    "manifest_projection_read",   # A8 table projections (VERDICT r8 #3)
    "sample_keyed_events",        # SAMPLE f OFFSET o clause (VERDICT r8 #4)
    "manifest_update_read",       # A8 ALTER UPDATE mutation (r9 session 2)
    "manifest_ttl_rollup_read",   # A8 TTL GROUP BY rollup (r9 session 2)
    "manifest_agg_projection_read",  # A8 aggregate projections (r9 session 2)
    "with_totals_status",         # B9 GROUP BY WITH TOTALS
    "max_intersections_users",    # B21 maxIntersections(+Position)
    "welch_ttest_values",         # B21 welchTTest
    "mann_whitney_values",        # B21 mannWhitneyUTest
    "cramers_v_association",      # B21 cramersV
    "ema_user_values",            # B21 exponentialMovingAverage
    "interval_length_sum_users",  # B21 intervalLengthSum
    "lttb_downsample_events",     # B21 largestTriangleThreeBuckets
    "sequence_next_node_events",  # B21 sequenceNextNode (consecutive chain)
    "quantile_mv_incremental",    # A12 quantileExactWeightedState MV
    "geohash_cells_events",       # B27 geohashEncode/Decode spatial bucketing
    "geohashes_in_box_probe",     # B27 geohashesInBox covering sets
    "ks_test_values",             # B33 kolmogorovSmirnovTest (exact integer D)
    "student_ttest_values",       # B33 studentTTest (pooled variance)
    "agg_weighted_map_funcs",     # B21 avgWeighted + minMap/maxMap
    "sequence_next_node_backward",  # B21 sequenceNextNode backward/last_match
    "auc_purchase_score",         # B33 arrayAUC (exact rank identity)
    "tukey_outliers_events",      # B21 seriesOutliersDetectTukey fences
    "topk_mv_incremental",        # A12 topKState/topKMerge MV
    "sparkbar_hourly_events",     # B21 sparkbar inline activity rendering
    # --- Rule 1: new in r9 session 3 (tierb6 regression/correlation) ---
    "rank_corr_spearman",         # B33 rankCorr (Spearman, doubled rank core)
    "simple_linreg_events",       # B33 simpleLinearRegression
    "bounding_ratio_users",       # B33 boundingRatio (chord slope)
    "delta_sum_users",            # B33 deltaSumTimestamp (counter deltas)
    "contingency_theils_u",       # B33 contingency + theilsU coefficients
    "ch_dialect_hourly",          # A22+ CH SELECT front end (SAMPLE/PREWHERE/TOTALS)
    "ch_dialect_top_events",      # A22+ CH SELECT front end (LIMIT BY/multiIf)
    # --- Rule 1: never driver-checked (restores the 178/178 ledger) ---
    "sequence_match_dot",         # B21 sequenceMatch '.' token (r8)
    # --- Rule 1: implementation internals changed in r9 (manifest.py
    # _stat_val string-padding asymmetry + files_for per-bound probes
    # sit under both lifecycle paths) ---
    "manifest_evolution_read",    # A8 schema evolution (r8-green, re-verify)
    "manifest_zonemap_read",      # A8 zone maps (r8-green, re-verify)
    # --- Rule 2: oldest-green-first backfill. r1/r3 singles ---
    "string_funcs_extended",      # B13, last green r1
    "agg_approx_distinct",        # B8, last green r3
    "simhash_signatures",         # C2, last green r3
    "vector_lsh_topk",            # C3, last green r3
    # --- the full r4 cohort (28), alphabetical ---
    "dedup_exact_documents",      # C1
    "minhash_near_dup_candidates",  # C2
    "pack_sequences",             # C4
    "q10_returned_items",
    "q18_large_volume_orders",
    "q21_waiting_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    # (q7/q8/q12/q13/q14/q15/q16/q19 — and, from session 3, q17/q20/
    # q22 plus q2/q11 (whose *_spec twins with identical plan skeletons
    # were driver-green r8) — yield their seats to rule-1 queries; B20
    # keeps 6 TPC-H shapes in-window and all of them stay oracle-gated
    # + benched.)
    "sessionize_events",          # A26
    # (tfidf_top_terms, semdedup_prune and text_analysis_composite
    # yield their seats to rule-1 queries; C2 stays covered in-window
    # by minhash/simhash/vector_lsh, C4 by pack_sequences, and all
    # three stay oracle-gated + benched/exempt-audited.)
    # (vector_cosine_topk and vector_ivf_topk — the alphabetical tail
    # of the r4 cohort — yield their seats to the 19th/20th rule-1
    # queries; C3 stays covered in-window by vector_lsh_topk /
    # vector_pq_topk-era greens, and both stay oracle-gated in pytest
    # and benched.)
    # --- r5 cohort, alphabetical first 12 (the remaining 36 r5-greens
    # rotate in over r10-r11 under rule 2) ---
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
