from __future__ import annotations

import hashlib

import pyarrow as pa

from pyofs_ray.stages.text import linear_classifier_score


def _w(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 2001 - 1000


def test_classifier_score_matches_hand_computation():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["alpha beta alpha", "  ", "gamma"]})
    out = linear_classifier_score(t)
    assert out["n_tokens"].to_pylist() == [3, 0, 1]
    assert out["score"].to_pylist() == [
        2 * _w("alpha") + _w("beta"), 0, _w("gamma")]
    assert out["keep"].to_pylist() == [
        2 * _w("alpha") + _w("beta") >= 0, True, _w("gamma") >= 0]


def test_classifier_weight_range_and_determinism():
    ws = [_w(f"tok{i}") for i in range(200)]
    assert all(-1000 <= w <= 1000 for w in ws)
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": [" ".join(f"tok{i}" for i in range(200))]})
    a = linear_classifier_score(t)["score"].to_pylist()
    b = linear_classifier_score(t)["score"].to_pylist()
    assert a == b == [sum(ws)]
