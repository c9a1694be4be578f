"""Regenerate PLANS.md: physical-plan skeletons for representative
queries, so the 100 TB posture (pushdown, pruning, broadcasts, partial
aggregation, no global sorts, no row-Python) is reviewable without
running anything. `tests/test_plans.py` asserts these properties; this
file is the human-readable evidence.

    python tools/plan_dump.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    ("q1_pricing_summary", "filter pushed to parquet, pruned schema, two-phase HashAggregate"),
    ("q5_local_supplier_volume", "small dims broadcast; the only big shuffle is fact-fact"),
    ("topk_orders_by_price", "TakeOrderedAndProject — per-partition heaps, no global sort"),
    ("minhash_near_dup_candidates", "single corpus scan; only (id, gram/band) rows shuffle"),
    ("vector_ivf_topk", "centroids folded into the plan as literals — assignment is a map pass"),
    ("bm25_topk", "query terms broadcast; corpus postings shuffled once"),
    ("vector_int8_topk", "salted two-phase top-k — no Window, no hot partition"),
    ("dup_span_coverage", "gram hash joins + per-doc window; no nested-loop anywhere"),
    ("approx_topk_tokens", "bounded P x capacity merge ends in TakeOrderedAndProject"),
    ("decontaminate_eval_overlap", "eval grams broadcast; corpus exchanges once"),
    ("semdedup_prune", "two Arrow stages, zero joins"),
    ("funnel_strict_modes", "one groupBy + JVM fold — no joins, no windows"),
    ("interleave_datasets_order", "global_rank: no SinglePartition exchange; broadcast offsets join a pinned ranked layout"),
    ("q2_spec_min_cost_supplier", "spec-true partsupp Q2: per-part min via groupBy + equi-join, dims broadcast"),
    ("quantile_sketch_events", "mergeable quantile states: per-partition summaries, bounded concatenation merge"),
    ("cohort_retention_matrix", "distinct (user, day) reduction before any join; matrix groupBy never rescans raw events"),
    ("ema_user_values", "r9: EMA fold as a JVM higher-order aggregate — one exchange, no Python/window/join"),
    ("mann_whitney_values", "r9: rank prefix-sum over range buckets; rank table broadcasts back to rows"),
    ("lttb_downsample_events", "r9: ONE Arrow grouped-map stage — series fan out, walk stays in numpy"),
    ("sequence_next_node_events", "r9: consecutive-chain match as a higher-order position filter — no join/window"),
    ("ch_dialect_join", "r11: verbatim CH JOIN chain — dims broadcast, one fact shuffle for the agg (front end adds no nodes)"),
    ("dsir_select_documents", "r13: DSIR scoring — the fitted model is ONE literal array; map + TakeOrderedAndProject, zero exchanges, no join/window/Python"),
    ("ch_dialect_paste_qq", "r13: PASTE JOIN — two range-partitioned sorts + per-partition numbering + broadcast offsets; the zip is an index equi-join, no single-partition window"),
    ("pack_training_sequences", "r13 s3: concat-and-chunk packing — ONE exchange by content-addressed shard into a shard-local prefix-sum window; block spans are map-side arithmetic"),
    ("exact_substr_spans", "r14: exact ExactSubstr filter-then-verify — hashed seed-count join + ONE per-doc multi-lead window pass + literal candidate verify; no self-joins, no single-partition stage"),
    ("suffix_array_rank", "r14: prefix-doubling suffix array — range-partitioned Arrow dense-rank rounds (banded offsets), early-stopped; final rank is a per-doc window"),
    ("suffix_lcp_rank", "r14 s2: SA+LCP — the doubling, then an LCP descent of two co-keyed left joins per kept level plus a character-residual text join; no single-partition stage"),
    ("quality_classifier_score", "r15: CCNet/fastText quality model — the fitted weights + bias ride as ONE literal array; corpus scoring is a map pass, zero exchanges beyond the scan"),
    ("kn_trigram_nll", "r16: modified-KN trigram — one corpus-proportional trigram groupBy; every other statistic reduces FROM the type table; model assembly is hash joins on type keys, discounts are plan literals"),
    ("ccnet_pipeline_documents", "r16: the CCNet composite — four stage shapes chained by per-doc hash joins; classifier weights ride as a literal, the only window is the per-language ntile"),
    ("zipf_law_fit", "r16 s2: corpus Zipf fit — vocab groupBy with map-side partials, TakeOrderedAndProject cut; the rank window and OLS moment fold run on <= 1000 rows"),
    ("source_ngram_overlap_matrix", "r16 s2: cross-source 5-gram leakage — lead-window shingles into ONE per-gram source-set aggregate; totals AND pair counts explode from the same sets (a gram self-join would recompute the pipeline per side — probed, zero ReusedExchange); assembly is broadcast joins over a checkpointed <=C(n,2)+n-row frame"),
]

STRIP = re.compile(r"#\d+L?|\[plan_id=\d+\]")


def skeleton(df) -> str:
    """Compact physical tree + the scan details that matter."""
    qe = df._jdf.queryExecution()
    jvm = df._sc._jvm
    simple = jvm.PythonSQLUtils.explainString(qe, "simple")
    formatted = jvm.PythonSQLUtils.explainString(qe, "formatted")
    tree = [
        STRIP.sub("", ln).rstrip()
        for ln in simple.splitlines()
        if ln.strip() and "== Physical Plan ==" not in ln
    ]
    details = [
        ln.strip()[:160]
        for ln in formatted.splitlines()
        if ("PushedFilters" in ln or "ReadSchema" in ln) and "[]" not in ln
    ]
    return "\n".join(tree[:40] + (["..."] if len(tree) > 40 else []) + details)


def main() -> None:
    from pyspark.sql import SparkSession

    from postgre_to_clickhouse_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    sf = "/root/testdata/sf0.001"
    out = [
        "# PLANS — physical-plan evidence for the 100 TB posture",
        "",
        "Regenerate with `python tools/plan_dump.py` (plans at sf0.001;",
        "shapes are SF-independent, AQE may re-plan sizes at runtime).",
        "Structural properties are ASSERTED in `tests/test_plans.py`;",
        "this file is the reviewable rendering.",
        "",
    ]
    for name, why in SHOWCASE:
        df = QUERIES[name](spark, sf)
        out += [f"## {name}", "", f"_{why}_", "", "```", skeleton(df), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
