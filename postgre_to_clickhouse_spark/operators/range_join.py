"""Banded range-join rewrite (SURVEY.md B5 scale path).

A plain theta-join ``a.val BETWEEN b.val - w AND b.val + w`` plans as a
broadcast-nested-loop — O(|A|·|B|) comparisons, a non-starter at scale
unless one side is tiny. The band rewrite quantizes both sides into
width-``w`` buckets; a row can only match rows in its own or adjacent
buckets, so the cross product becomes an equi-join on the bucket id
(hash-shuffled, AQE-skew-handled) followed by the exact range filter.
Candidate work drops from O(N·M) to O(matches + band occupancy²·buckets).
This is the same trick the LSH dedup family uses — blocking key + exact
verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    width: float,
    how: str = "inner",
) -> DataFrame:
    """Equi-join rewrite of ``|left_val - right_val| <= width``.

    Left rows are replicated into their own + adjacent buckets; right
    rows keep their single bucket; the bucket equi-join then covers
    every possible band match, and the exact predicate removes false
    candidates.

    Candidate window is ±2 buckets, not ±1: the match predicate is a
    double subtraction, so a pair whose exact-real distance is a hair
    over ``width`` can still satisfy ``|l-r| <= width`` after rounding
    (e.g. l=1.0, r=-5e-324, width=1.0 — found by the property test);
    rounding slop is ≤1 ulp, so the bucket-quotient difference is ≤2.
    """
    if width <= 0:
        raise ValueError("band_join width must be > 0 — for exact equality use a plain equi-join")
    bucket_r = F.floor(F.col(right_val) / F.lit(width)).alias("__bucket")
    r = right.select("*", bucket_r)
    lb = F.floor(F.col(left_val) / F.lit(width))
    l = left.select(
        "*", F.explode(F.array(lb - 2, lb - 1, lb, lb + 1, lb + 2)).alias("__bucket")
    )
    joined = l.join(r, "__bucket", how)
    exact = F.abs(F.col(left_val) - F.col(right_val)) <= F.lit(width)
    return joined.filter(exact).drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
) -> DataFrame:
    """Interval-overlap join via bucket blocking: each interval registers
    in every bucket it spans; overlapping intervals share ≥1 bucket.

    A pair sharing k buckets would surface k times, so candidates are
    restricted to their CANONICAL bucket — the first bucket both
    intervals occupy, ``floor(max(starts)/width)`` (floor is monotonic,
    so that equals ``max`` of the per-side first buckets). Each matching
    pair of input ROWS therefore appears exactly once: true join
    multiplicity is preserved even when either side contains identical
    rows (a full-row ``dropDuplicates`` here would collapse those)."""
    def buckets(s: str, e: str) -> Column:
        return F.sequence(
            F.floor(F.col(s) / F.lit(bucket_width)), F.floor(F.col(e) / F.lit(bucket_width))
        )

    l = left.select("*", F.explode(buckets(left_start, left_end)).alias("__bucket"))
    r = right.select("*", F.explode(buckets(right_start, right_end)).alias("__bucket"))
    canonical = F.col("__bucket") == F.greatest(
        F.floor(F.col(left_start) / F.lit(bucket_width)),
        F.floor(F.col(right_start) / F.lit(bucket_width)),
    )
    overlap = (F.col(left_start) <= F.col(right_end)) & (F.col(right_start) <= F.col(left_end))
    return l.join(r, "__bucket").filter(canonical & overlap).drop("__bucket")
