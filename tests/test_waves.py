"""Politeness-wave crawl plan: wave semantics on a constructed skew and
oracle parity."""

from __future__ import annotations

from pyofs_ray.registry import ORACLES, QUERIES

from .conftest import SF_SMOKE, assert_matches_oracle, make_duckdb


def test_wave_profile_semantics(ray_session):
    import numpy as np

    out = (QUERIES["crawl_wave_plan"](SF_SMOKE).to_pandas()
           .sort_values("wave").reset_index(drop=True))
    assert (out.wave == np.arange(1, len(out) + 1)).all()
    # n_hosts is non-increasing (hosts exhaust, never re-appear)
    assert (np.diff(out.n_hosts) <= 0).all()
    # frontier fully drains: the last cum_pages equals the page count
    con = make_duckdb(SF_SMOKE)
    (total,) = con.sql("SELECT COUNT(*) FROM documents").fetchone()
    assert out.cum_pages.iloc[-1] == total == out.n_hosts.sum()
    # the hot-host fixture leaves a long single-host tail
    assert out.n_hosts.iloc[-1] >= 1
    assert len(out) > out.n_hosts.iloc[0]  # more waves than a flat frontier


def test_waves_match_oracle_smoke():
    con = make_duckdb(SF_SMOKE)
    assert_matches_oracle(QUERIES["crawl_wave_plan"](SF_SMOKE), con,
                          ORACLES["crawl_wave_plan"])
