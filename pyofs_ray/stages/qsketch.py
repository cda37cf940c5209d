"""Mergeable log-histogram quantile sketch — the constant-memory
approximate-quantile path for columns whose exact selection histogram
(`stages/quantile.py`) would be value-cardinality-bounded rather than
constant-bounded at 100 TB.

Design: each positive double maps to a (binary-exponent, mantissa-sub-bin)
bucket via ``np.frexp`` — PURE float bit manipulation, no ``log`` call, so
binning is bit-reproducible across libm builds and cluster nodes. With
``SUB`` sub-bins per octave a bucket spans a relative width ≤ 1/SUB
(SUB=64 → ≤1.6 %), and the low-quantile estimate (the bucket's LOWER edge
at the target rank) carries at most that relative error — gated at 5 %
against the exact DuckDB selection quantile (3× headroom), the same
error-gate contract as the HLL distinct sketch.

Scale shape: per-batch ``np.bincount`` partials over ≤ ~2·10³ live
buckets (the double exponent range actually present), ONE tiny groupby,
and a driver-bounded finish — the sketch size is INDEPENDENT of row count
and value cardinality, and partials merge by addition (resume/combine
safe). Non-positive values are counted in a dedicated underflow bucket
that also carries the EXACT running minimum, so a quantile whose rank
lands there returns that minimum (a true lower bound — the relative-error
contract applies only to the positive range; mixed-sign data gets the
conservative exact-min answer instead of a bogus 0.0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

SUB = 64  # mantissa sub-bins per octave → ≤ 1/64 relative bucket width
_E_BIAS = 1100  # shifts double exponents (≥ -1074) to non-negative bins


def _bins_of(v: np.ndarray) -> np.ndarray:
    """Bucket index per POSITIVE value: e·SUB + floor((m−0.5)·2·SUB)."""
    m, e = np.frexp(v)
    s = np.minimum(((m - 0.5) * (2 * SUB)).astype(np.int64), SUB - 1)
    return (e.astype(np.int64) + _E_BIAS) * SUB + s


def _edge_of(b: np.ndarray) -> np.ndarray:
    """Lower edge of bucket b (the low-quantile estimate)."""
    e = b // SUB - _E_BIAS
    s = b % SUB
    return np.ldexp(0.5 + s / (2.0 * SUB), e)


def quantile_sketch(ds: ray.data.Dataset, value_col: str,
                    quants: tuple[float, ...] = (0.5, 0.9, 0.99)
                    ) -> "pa.Table":
    """Approximate low-quantiles of ``value_col``. Returns one row:
    ``n`` plus a ``p<pct>`` column per requested quantile."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = v > 0
        bins = np.full(len(v), 0, np.int64)  # bucket 0 = underflow (v ≤ 0)
        bins[pos] = _bins_of(v[pos])
        uniq, cnt = np.unique(bins, return_counts=True)
        # bucket 0 carries the exact running min of the non-positive range
        lo = np.full(len(uniq), np.nan)
        if (~pos).any():
            lo[uniq == 0] = v[~pos].min()
        return pa.table({"bin": pa.array(uniq),
                         "c": pa.array(cnt.astype(np.int64)),
                         "lo": pa.array(lo)})

    # one ≤2k-row sketch per block, merged on the driver — the HLL shape
    # (`sketch.approx_distinct`); a Ray groupby here would spend a full
    # sort-based all-to-all on ~2k keys (measured 4.6 s vs 1.6 s for the
    # whole query). At cluster scale, tree-merge via a tiny groupby first.
    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas())
    merged = parts.groupby("bin", as_index=False).agg(
        c=("c", "sum"), lo=("lo", "min"))
    bins = merged["bin"].to_numpy().astype(np.int64)
    cnt = merged["c"].to_numpy().astype(np.int64)
    lo = merged["lo"].to_numpy()
    order = np.argsort(bins)
    bins, cnt, lo = bins[order], cnt[order], lo[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1]) if len(cum) else 0
    cols: dict[str, object] = {"n": pa.array([n], pa.int64())}
    for q in quants:
        name = f"p{int(round(q * 100))}"
        if n == 0:
            cols[name] = pa.array([None], pa.float64())
            continue
        rank = max(1, int(np.ceil(q * n)))  # smallest v with cum ≥ q·n
        i = int(np.searchsorted(cum, rank, side="left"))
        est = float(lo[i]) if bins[i] == 0 \
            else float(_edge_of(bins[i:i + 1])[0])
        cols[name] = pa.array([est], pa.float64())
    return pa.table(cols)
