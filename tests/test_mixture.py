"""Temperature-scaled mixture plan: low-resource upweighting semantics
and oracle parity."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from pyofs_ray.pipelines import corpus
from pyofs_ray.registry import ORACLES, QUERIES

from .conftest import SF_SMOKE, assert_matches_oracle, make_duckdb


def test_sqrt_upweights_low_resource(tmp_path, ray_session):
    # 900 'en' docs vs 9 'mi' docs: raw share 1%, sqrt share 10/(30+3)=~9%
    langs = ["en"] * 900 + ["mi"] * 9
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(langs)), pa.int64()),
        "text": pa.array(["x"] * len(langs), pa.string()),
        "lang": pa.array(langs, pa.string())}),
        tmp_path / "documents.parquet")
    out = (corpus.lang_mixture_plan(str(tmp_path)).to_pandas()
           .set_index("lang"))
    assert out.loc["en", "weight_s"] == 30 and out.loc["mi", "weight_s"] == 3
    mi = out.loc["mi"]
    raw_share_ppm = 9 * 1_000_000 // 909
    assert mi.share_ppm > 5 * raw_share_ppm       # strongly upweighted
    assert mi.epochs_ppm > 1_000_000              # repeats within an epoch
    assert out.loc["en", "epochs_ppm"] < 1_000_000
    assert out.share_ppm.sum() <= 1_000_000       # floor keeps it a budget


def test_mixture_matches_oracle_smoke():
    con = make_duckdb(SF_SMOKE)
    assert_matches_oracle(QUERIES["lang_mixture_plan"](SF_SMOKE), con,
                          ORACLES["lang_mixture_plan"])


def test_mixture_apply_copy_counts(tmp_path, ray_session):
    import numpy as np

    from pyofs_ray.core.hashing import splitmix64
    from pyofs_ray.pipelines.corpus import MIX_APPLY_SALT, MIX_PPM

    langs = ["en"] * 900 + ["mi"] * 9
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(langs)), pa.int64()),
        "text": pa.array(["x"] * len(langs), pa.string()),
        "lang": pa.array(langs, pa.string())}),
        tmp_path / "documents.parquet")
    plan = (corpus.lang_mixture_plan(str(tmp_path)).to_pandas()
            .set_index("lang"))
    out = corpus.lang_mixture_apply(str(tmp_path)).to_pandas()
    # independent recount: every doc gets floor(epochs/1M) plus the
    # hash-thresholded fractional copy, zeros dropped
    den = 1 << 20
    for lang, n_lang in (("en", 900), ("mi", 9)):
        eppm = int(plan.loc[lang, "epochs_ppm"])
        base, frac = eppm // MIX_PPM, eppm % MIX_PPM
        ids = np.arange(len(langs))[np.asarray(langs, object) == lang]
        draw = (splitmix64(ids.astype(np.int64).view(np.uint64)
                           ^ np.uint64(MIX_APPLY_SALT))
                % np.uint64(den)).astype(np.int64)
        expect = base + (draw * MIX_PPM < frac * den)
        got = (out[out["lang"] == lang].set_index("doc_id")["n_copies"]
               .reindex(ids).fillna(0).astype(int).to_numpy())
        assert (got == expect).all()
    # upweighting realized: every 'mi' doc repeats, 'en' docs do not
    mi = out[out["lang"] == "mi"]
    assert (mi["n_copies"] >= 1).all() and mi["n_copies"].max() >= 2
    assert out[out["lang"] == "en"]["n_copies"].max() == 1


def test_mixture_apply_matches_oracle_smoke():
    con = make_duckdb(SF_SMOKE)
    assert_matches_oracle(QUERIES["lang_mixture_apply"](SF_SMOKE), con,
                          ORACLES["lang_mixture_apply"])
