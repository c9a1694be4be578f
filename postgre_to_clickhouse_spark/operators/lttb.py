"""Largest-Triangle-Three-Buckets time-series downsampling — the
ClickHouse ``largestTriangleThreeBuckets(n)(x, y)`` aggregate (ships in
the reference's terminal CH 24.3; Steinarsson 2013, the visualization
downsampler that preserves extrema a uniform stride loses).

Algorithm (exact classic form): keep the first and last point; split
the interior into ``n_out - 2`` index-equal buckets; walk buckets left
to right, from each picking the point forming the LARGEST triangle
with the previously-selected point and the AVERAGE of the next bucket
(the last bucket targets the final point). The walk is inherently
sequential per series — selection i depends on selection i-1 — so the
distributed shape is one Arrow ``applyInPandas`` per series: series
fan out across the cluster, each series' walk is a few numpy
vector ops per bucket over that series' (bounded) points.

Cross-engine determinism (the oracle replays the walk in a DuckDB
recursive CTE): every float op is mirrored in the same literal order —
``area = |(px-nx)(cy-py) - (px-cx)(ny-py)|`` in IEEE doubles, bucket
x-averages via exact int64 µs sums, bucket y-averages via exact cent
sums (values are 2-decimal; ``rint``/``round`` agree because a
2-decimal double times 100 is never half-way) — and ties pick the
lowest index, so both engines select identical points bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lttb_downsample(
    df: DataFrame,
    series_col: str,
    x_col: str,
    y_col: str,
    order_col: str,
    n_out: int = 20,
    y_scale: int | None = 100,
) -> DataFrame:
    """Per-series LTTB: ``x_col`` long (epoch-µs), ``y_col`` double,
    ``order_col`` an integer tiebreak making (x, order) a total order.
    Returns (series, pos, ts_us, value): the ``n_out`` selected points
    per series in selection order (all points when a series has
    ≤ ``n_out``).

    ``y_scale`` (ADVICE r9): bucket y-averages are computed as exact
    integer sums of ``rint(y * y_scale)`` for cross-engine determinism
    — EXACT only when every y is representable at 1/y_scale (the
    default 100 = the fixtures' 2-decimal contract; y at finer
    precision quantizes the average and deviates from textbook LTTB
    selection). Pass ``y_scale=None`` for the plain float mean
    (standard LTTB, engine-local float summation order)."""
    if n_out < 3:
        raise ValueError("n_out must be ≥ 3 (first + last + ≥1 bucket)")
    if y_scale is not None and y_scale < 1:
        raise ValueError("y_scale must be a positive integer or None")
    import numpy as np
    import pandas as pd

    n_buckets = n_out - 2

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x_col, order_col], kind="mergesort")
        xl = pdf[x_col].to_numpy(np.int64)
        y = pdf[y_col].to_numpy(np.float64)
        serie = pdf[series_col].iloc[0]
        n = len(pdf)
        if n <= n_out:
            return pd.DataFrame(
                {
                    "serie": serie,
                    "pos": np.arange(n, dtype=np.int32),
                    "ts_us": xl,
                    "value": y,
                }
            )
        x = xl.astype(np.float64)
        # interior offset i (1..n-2) belongs to bucket ((i-1)*B)//(n-2)
        # — the SAME integer formula the SQL oracle uses, so membership
        # can never disagree off-by-one between engines
        interior = np.arange(1, n - 1, dtype=np.int64)
        b_of = ((interior - 1) * n_buckets) // (n - 2)
        los = np.searchsorted(b_of, np.arange(n_buckets)) + 1
        his = np.searchsorted(b_of, np.arange(n_buckets), side="right") + 1
        sel_i = [0]
        for b in range(n_buckets):
            lo, hi = int(los[b]), int(his[b])
            if b < n_buckets - 1:
                nlo, nhi = int(los[b + 1]), int(his[b + 1])
                cnt = nhi - nlo
                nx = float(np.sum(xl[nlo:nhi], dtype=np.int64)) / cnt
                if y_scale is None:
                    ny = float(np.mean(y[nlo:nhi]))
                else:
                    scaled = np.rint(y[nlo:nhi] * float(y_scale)).astype(np.int64)
                    ny = float(np.sum(scaled, dtype=np.int64)) / y_scale / cnt
            else:
                nx = x[n - 1]
                ny = y[n - 1]
            px, py = x[sel_i[-1]], y[sel_i[-1]]
            cx, cy = x[lo:hi], y[lo:hi]
            area = np.abs((px - nx) * (cy - py) - (px - cx) * (ny - py))
            sel_i.append(lo + int(np.argmax(area)))  # first max on ties
        sel_i.append(n - 1)
        idx = np.asarray(sel_i)
        return pd.DataFrame(
            {
                "serie": serie,
                "pos": np.arange(len(idx), dtype=np.int32),
                "ts_us": xl[idx],
                "value": y[idx],
            }
        )

    return (
        df.select(series_col, x_col, y_col, order_col)
        .groupBy(series_col)
        .applyInPandas(walk, "serie string, pos int, ts_us long, value double")
    )
