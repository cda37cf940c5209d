"""Trajectory-derived raster products (density binning of the exact RK4
track output)."""

from __future__ import annotations


def test_track_density_conserves_particles(duck_smoke):
    from pyofs_ray.registry import ORACLES, QUERIES
    from .conftest import SF_SMOKE, assert_matches_oracle
    assert_matches_oracle(QUERIES["track_density"](SF_SMOKE), duck_smoke,
                          ORACLES["track_density"])
    df = QUERIES["track_density"](SF_SMOKE).to_pandas()
    # 64 particles × 5 snapshots (steps 0,5,10,15,20) = 320 positions
    assert df.n.sum() == 320
    assert (df.n > 0).all()
