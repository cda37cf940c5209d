"""int8 embedding quantization: code bounds, constant-dim handling,
reconstruction error bound, oracle parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages.ann import embedding_quantize
from pyofs_ray.registry import ORACLES, QUERIES

from .conftest import SF_SMOKE, assert_matches_oracle, make_duckdb


def _ds(mat: np.ndarray) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array(list(mat.astype(np.float32)),
                              pa.list_(pa.float32()))}))


def test_codes_bounds_and_constant_dim(ray_session):
    rng = np.random.default_rng(3)
    m = rng.normal(size=(40, 6)).astype(np.float32)
    m[:, 2] = 1.25                       # constant dimension -> code 0
    out = embedding_quantize(_ds(m)).to_pandas()
    assert len(out) == 40 * 6
    assert out.code.between(0, 255).all()
    assert (out[out.dim == 3].code == 0).all()
    # extremes hit the rails in every non-constant dimension
    for d in [1, 2, 4, 5, 6]:
        sub = out[out.dim == d]
        assert sub.code.min() == 0 and sub.code.max() == 255


def test_reconstruction_error_half_step(ray_session):
    rng = np.random.default_rng(5)
    m = rng.uniform(-1, 1, size=(64, 8)).astype(np.float32)
    out = (embedding_quantize(_ds(m)).to_pandas()
           .sort_values(["vec_id", "dim"]))
    codes = out.code.to_numpy().reshape(64, 8)
    lo = m.astype(np.float64).min(0)
    hi = m.astype(np.float64).max(0)
    recon = lo + codes * (hi - lo) / 255.0
    step = (hi - lo) / 255.0
    assert (np.abs(recon - m.astype(np.float64)) <= step / 2 + 1e-12).all()


def test_quantize_matches_oracle_smoke():
    con = make_duckdb(SF_SMOKE)
    assert_matches_oracle(QUERIES["embedding_quantize"](SF_SMOKE), con,
                          ORACLES["embedding_quantize"])


def test_ann_topk_quantized_recall_smoke(ray_session):
    from pyofs_ray.pipelines import corpus
    exact = corpus.ann_topk(SF_SMOKE)
    quant = corpus.ann_topk_quantized(SF_SMOKE)
    e = set(map(tuple, exact[["query_id", "vec_id"]]
                .itertuples(index=False)))
    q = set(map(tuple, quant[["query_id", "vec_id"]]
                .itertuples(index=False)))
    assert len(e & q) / len(e) >= 0.9
    # same contract shape as the exact path
    assert sorted(quant.columns) == sorted(exact.columns)
    assert quant.groupby("query_id").size().eq(
        exact.groupby("query_id").size()).all()


# ------------------------------------------- PCA fixed-point power iter

def test_embedding_pca_power_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["embedding_pca_power"](SF_SMOKE),
                          duck_smoke, ORACLES["embedding_pca_power"])


def test_pca_power_converges_to_planted_direction():
    """On a corpus with one dominant planted direction, the fixed-point
    iterate must align with it (cosine > 0.99 after 3 steps)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from pyofs_ray.stages.pca import embedding_pca_power

    rng = np.random.default_rng(11)
    d = 16
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    # strong rank-1 signal + small noise
    rows = []
    for i in range(300):
        coef = rng.normal() * 10.0
        e = coef * u + rng.normal(size=d) * 0.1
        rows.append({"vec_id": i, "embedding": e.astype(np.float32).tolist()})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = embedding_pca_power(ds).to_pandas().sort_values("dim")
    v = out.v_component.to_numpy().astype(float)
    cos = abs(v @ u) / (np.linalg.norm(v) * np.linalg.norm(u))
    assert cos > 0.99


def test_embedding_debias_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["embedding_debias"](SF_SMOKE),
                          duck_smoke, ORACLES["embedding_debias"])


def test_embedding_debias_residual_orthogonal_to_v():
    """corrected = q·||v||² − (q·v)·v  ⇒  corrected ⊥ v exactly
    (integer dot products are exactly zero)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from pyofs_ray.stages.pca import (embedding_debias,
                                      embedding_pca_power)

    rng = np.random.default_rng(7)
    rows = [{"vec_id": i,
             "embedding": rng.normal(size=8).astype(np.float32).tolist()}
            for i in range(60)]

    def factory():
        return ray.data.from_arrow(pa.Table.from_pylist(rows))

    v = (embedding_pca_power(factory()).to_pandas()
         .sort_values("dim").v_component.to_numpy().astype(object))
    out = embedding_debias(factory).to_pandas()
    for vid, g in out.groupby("vec_id"):
        c = g.sort_values("dim").corrected.to_numpy().astype(object)
        assert int(sum(int(a) * int(b) for a, b in zip(c, v))) == 0


# --------------------------------------------- greedy k-center coreset

def test_embedding_kcenter_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["embedding_kcenter"](SF_SMOKE),
                          duck_smoke, ORACLES["embedding_kcenter"])


def test_kcenter_farthest_point_on_planted_clusters():
    """Three tight, well-separated clusters: the first 3 selections must
    hit 3 DIFFERENT clusters (farthest-point guarantee), and the radii
    are non-increasing after each new center."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from pyofs_ray.stages.kcenter import embedding_kcenter

    rng = np.random.default_rng(3)
    centers = np.array([[0.0] * 8, [50.0] + [0.0] * 7,
                        [0.0, 50.0] + [0.0] * 6])
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append({"vec_id": i, "embedding":
                     (c + rng.normal(size=8) * 0.01)
                     .astype(np.float32).tolist()})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = embedding_kcenter(ds, k=5).to_pandas().sort_values("sel_rank")
    first3_clusters = {int(v) % 3 for v in out.vec_id.head(3)}
    assert first3_clusters == {0, 1, 2}
    radii = out.mind2.to_numpy()
    assert all(radii[i] >= radii[i + 1] for i in range(1, len(radii) - 1))
    # cross-cluster gap dwarfs within-cluster noise
    assert radii[1] > 1000 * max(radii[3], 1)


def test_split_embedding_leakage_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["split_embedding_leakage"](SF_SMOKE),
                          duck_smoke, ORACLES["split_embedding_leakage"])


def test_split_embedding_leakage_is_cross_split_subset():
    """Leakage pairs = exactly the seeded dup pairs whose hash splits
    differ — non-empty on the fixture, and every row crosses splits."""
    from pyofs_ray.registry import QUERIES
    from tests.conftest import SF_SMOKE
    out = QUERIES["split_embedding_leakage"](SF_SMOKE)
    base = QUERIES["embedding_dup_pairs_seeded"](SF_SMOKE)
    assert len(out) > 0
    assert (out.split_a != out.split_b).all()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    allp = set(map(tuple, base[["id_a", "id_b"]].to_numpy()))
    assert got <= allp
