"""FastSS deletion-neighborhood typo pairs."""

from __future__ import annotations

import numpy as np

from pyofs_ray.registry import ORACLES, QUERIES
from pyofs_ray.stages.fuzzy import _deletion_keys, _seed_typos

from .conftest import SF_SMOKE, assert_matches_oracle


def test_token_typo_pairs_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["token_typo_pairs"](SF_SMOKE), duck_smoke,
                          ORACLES["token_typo_pairs"])


def test_pairs_are_distance_one():
    def lev(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[lb]

    df = QUERIES["token_typo_pairs"](SF_SMOKE).to_pandas()
    assert len(df) > 0                      # seeded ⇒ never vacuous
    assert (df.token_a < df.token_b).all()
    assert not df.duplicated(["token_a", "token_b"]).any()
    for _, r in df.iterrows():
        assert lev(r.token_a, r.token_b) == 1, (r.token_a, r.token_b)


def test_deletion_keys_shape():
    keys, owners = _deletion_keys(np.array(["abc", "wxyz"]))
    # self + L deletions each
    assert sorted(keys[owners == 0]) == sorted(["abc", "bc", "ac", "ab"])
    assert len(keys[owners == 1]) == 5


def test_seed_typo_position_rule():
    t = _seed_typos(np.array(["table"]))[0]   # L=5, (7*5+3)%5 = 3
    assert t == "tab0e"
