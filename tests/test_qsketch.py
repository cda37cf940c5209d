"""Log-histogram quantile sketch (stages/qsketch.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages.qsketch import SUB, _bins_of, _edge_of, quantile_sketch


def test_bin_edges_bracket_values():
    v = np.array([0.01, 0.5, 1.0, 3.7, 490.02, 1e-300, 1e300])
    b = _bins_of(v)
    lo = _edge_of(b)
    hi = _edge_of(b + 1)
    assert (lo <= v).all() and (v < hi).all()
    # relative bucket width ≤ 1/SUB
    assert ((hi - lo) / lo <= 1.0 / SUB + 1e-12).all()


def test_sketch_quantiles_within_bucket_error():
    rng = np.arange(1, 20001, dtype=np.float64)
    v = 0.01 * (rng ** 1.5)  # skewed positive distribution
    ds = ray.data.from_arrow(pa.table({"value": v})).repartition(8)
    t = quantile_sketch(ds, "value").to_pandas().iloc[0]
    assert t.n == len(v)
    for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        exact = np.sort(v)[int(np.ceil(q * len(v))) - 1]
        rel = abs(t[col] - exact) / exact
        assert rel <= 1.0 / SUB + 1e-9, (col, t[col], exact, rel)


def test_sketch_handles_nonpositive_underflow():
    v = np.array([-5.0, 0.0, 1.0, 2.0, 4.0, 8.0])
    ds = ray.data.from_arrow(pa.table({"value": v}))
    t = quantile_sketch(ds, "value",
                        quants=(0.25, 0.5)).to_pandas().iloc[0]
    # rank ceil(0.5·6)=3 → the 3rd smallest (1.0, ranks: -5, 0 underflow
    # first) → bucket lower edge of 1.0 is exactly 1.0
    assert t.n == 6
    assert t.p50 == 1.0
    # rank 2 lands in the underflow bucket → the EXACT non-positive min
    # (a true lower bound), never a fabricated 0.0
    assert t.p25 == -5.0


def test_partials_merge_invariant_to_partitioning():
    v = 0.01 * (np.arange(1, 5001, dtype=np.float64) ** 1.2)
    a = quantile_sketch(ray.data.from_arrow(pa.table({"value": v})),
                        "value").to_pandas()
    b = quantile_sketch(
        ray.data.from_arrow(pa.table({"value": v})).repartition(16),
        "value").to_pandas()
    assert a.equals(b)
