"""Placement operators: HRW movement bound + determinism, water-filling
allocation properties, oracle parity."""

from __future__ import annotations

import numpy as np

from pyofs_ray.stages import placement as P
from pyofs_ray.registry import ORACLES, QUERIES

from .conftest import SF_SMOKE, assert_matches_oracle, make_duckdb


def test_hrw_minimal_movement():
    keys = np.arange(20_000, dtype=np.int64)
    a = P.hrw_assign(keys, 16)
    b = P.hrw_assign(keys, 17)
    moved = (a != b).mean()
    # theory: exactly the keys won by the new shard move — E[moved]=1/17
    assert 0.03 < moved < 0.09, moved
    # movers all land on the NEW shard (weights of old shards unchanged)
    assert (b[a != b] == 16).all()
    # balanced populations: no shard is >1.5x the mean
    counts = np.bincount(a, minlength=16)
    assert counts.max() < 1.5 * counts.mean()
    # deterministic
    assert (P.hrw_assign(keys, 16) == a).all()


def test_waterfill_properties():
    rng = np.random.default_rng(9)
    for _ in range(50):
        n = int(rng.integers(1, 40))
        c = rng.integers(0, 100, n).astype(np.int64)
        hosts = np.array([f"host{i:03d}" for i in range(n)], object)
        B = int(rng.integers(0, int(c.sum()) + 20))
        a = P.waterfill_alloc(hosts, c, B)
        assert (a <= c).all()                      # never over-allocate
        assert a.sum() == min(B, int(c.sum()))     # budget fully used
        # max-min fairness: any host below its count is within 1 token
        # of every larger allocation (no one richer by >1 while it starves)
        short = a < c
        if short.any():
            assert a[short].min() >= a.max() - 1


def test_placement_match_oracle_smoke():
    con = make_duckdb(SF_SMOKE)
    assert_matches_oracle(QUERIES["hrw_shard_plan"](SF_SMOKE), con,
                          ORACLES["hrw_shard_plan"])
    assert_matches_oracle(QUERIES["crawl_budget_alloc"](SF_SMOKE), con,
                          ORACLES["crawl_budget_alloc"])
