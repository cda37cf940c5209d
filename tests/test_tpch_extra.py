"""Oracle-parity tests for the deeper TPC-H join shapes (sf0.001)."""

from __future__ import annotations

import pytest

from pyofs_ray.registry import ORACLES, QUERIES

from .conftest import SF_SMOKE, assert_matches_oracle

NAMES = ["rel_q7_volume", "rel_q10_returned", "rel_q18_large_volume",
         "rel_q22_dormant", "rel_q17_small_qty", "rel_q11_important_parts",
         "rel_q21_stragglers"]


@pytest.mark.parametrize("name", NAMES)
def test_tpch_extra_oracle(name, duck_smoke):
    assert_matches_oracle(QUERIES[name](SF_SMOKE), duck_smoke, ORACLES[name])


def test_tpch_extra_nonvacuous(duck_smoke):
    """Each query must exercise its join at smoke scale (no empty result
    silently passing the hash gate)."""
    for name in NAMES:
        n = duck_smoke.execute(
            f"SELECT COUNT(*) FROM ({ORACLES[name]})").fetchone()[0]
        assert n > 0, f"{name} vacuous at smoke scale"
