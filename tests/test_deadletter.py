"""Dead-letter routing + scalar function library + contour resampling."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pyofs_ray.functions.geo import dir_mag, geodetic_radius, rotate_uv
from pyofs_ray.stages.deadletter import partition_deadletter, safe_map_batches
from pyofs_ray.stages.tracking import circle_seeds, contour_measures, resample_contour


def test_deadletter_isolates_poison_rows():
    t = pa.table({"doc_id": list(range(100)),
                  "val": [str(i) if i % 37 != 5 else "boom" for i in range(100)]})
    ds = ray.data.from_arrow(t)

    def parse(b: pa.Table) -> pa.Table:
        vals = [int(s) for s in b["val"].to_pylist()]  # raises on "boom"
        return pa.table({"doc_id": b["doc_id"], "parsed": pa.array(vals, pa.int64())})

    out = safe_map_batches(ds, parse, id_col="doc_id")
    good, dead = partition_deadletter(out)
    gdf, ddf = good.to_pandas(), dead.to_pandas()
    bad_ids = {i for i in range(100) if i % 37 == 5}
    assert set(ddf.doc_id) == bad_ids
    assert all("ValueError" in e for e in ddf._error)
    assert set(gdf.doc_id) == set(range(100)) - bad_ids
    assert (gdf.parsed == gdf.doc_id).all()


def test_deadletter_all_good_passthrough():
    ds = ray.data.from_arrow(pa.table({"doc_id": [1, 2], "v": [1.0, 2.0]}))
    good, dead = partition_deadletter(
        safe_map_batches(ds, lambda b: b.append_column(
            "w", pc.multiply(b["v"], 2.0)), id_col="doc_id"))
    assert dead.count() == 0 and good.count() == 2


def test_rotate_uv_inverse():
    rng = np.random.default_rng(3)
    u, v = rng.normal(size=50), rng.normal(size=50)
    a = rng.uniform(-np.pi, np.pi, 50)
    u2, v2 = rotate_uv(*rotate_uv(u, v, a), -a)
    assert np.allclose(u2, u) and np.allclose(v2, v)
    # magnitude preserved under rotation
    _, m0 = dir_mag(u, v)
    _, m1 = dir_mag(*rotate_uv(u, v, a))
    assert np.allclose(m0, m1)


def test_geodetic_radius_bounds():
    lat = np.linspace(-np.pi / 2, np.pi / 2, 91)
    r = geodetic_radius(lat)
    assert r.min() >= 6_356_000 and r.max() <= 6_379_000
    assert abs(r[45] - 6_378_137) < 2_000  # equator ≈ a


def test_resample_contour_equal_spacing():
    ring = circle_seeds(7, radius=1000.0)
    out = resample_contour(ring, 32)
    assert out.num_rows == 32
    m_in = contour_measures(ring)
    m_out = contour_measures(out)
    # resampling preserves perimeter closely and spacing is uniform
    assert abs(m_out["perimeter"] - m_in["perimeter"]) / m_in["perimeter"] < 0.02
    x = out["x"].to_numpy()
    y = out["y"].to_numpy()
    seg = np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2)
    assert seg.std() / seg.mean() < 0.05


def test_bloom_filter_no_false_negatives_and_fpr():
    from pyofs_ray.stages.bloom import BloomFilter
    rng = np.random.default_rng(9)
    members = rng.integers(0, 2**62, 5000)
    bf = BloomFilter(members, fpr=0.01)
    assert bf.contains(members).all()  # zero false negatives
    probes = rng.integers(0, 2**62, 50_000)
    outside = probes[~np.isin(probes, members)]
    fpr = bf.contains(outside).mean()
    assert fpr < 0.03, f"observed FPR {fpr}"


def test_bloom_semi_join_exact_equals_plain():
    from pyofs_ray.stages.bloom import bloom_semi_join
    t = pa.table({"k": list(range(1000)), "v": [i * 2 for i in range(1000)]})
    ds = ray.data.from_arrow(t)
    keys = np.arange(0, 1000, 7)
    out = bloom_semi_join(ds, "k", keys, exact=True).to_pandas()
    assert sorted(out.k) == sorted(keys.tolist())
    # prefilter-only mode keeps all true members (maybe few extra)
    approx = bloom_semi_join(ds, "k", keys, exact=False).to_pandas()
    assert set(keys.tolist()) <= set(approx.k)
