from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyofs_ray.stages.semdedup import semdedup


def _emb_table(vids, vecs):
    return pa.table({
        "vec_id": pa.array(vids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })


def _centroids():
    return _emb_table([0, 1], [[1, 0, 0, 0], [0, 1, 0, 0]])


def test_semdedup_keeps_min_per_duplicate_component():
    # cluster 0: three bit-identical copies (ids 10, 11, 12) + a loner;
    # cluster 1: two identical copies (20, 21) + a loner.
    dup0 = [0.9, 0.1, 0.0, 0.0]
    dup1 = [0.1, 0.9, 0.0, 0.0]
    t = _emb_table(
        [10, 11, 12, 13, 20, 21, 22],
        [dup0, dup0, dup0, [0.8, 0.0, 0.6, 0.0],
         dup1, dup1, [0.0, 0.8, 0.0, 0.6]])
    out = semdedup(ray.data.from_arrow(t), _centroids(),
                   threshold=0.95).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    assert list(out["vec_id"]) == [10, 11, 12, 13, 20, 21, 22]
    assert list(out["cluster_id"]) == [0, 0, 0, 0, 1, 1, 1]
    assert list(out["keep"]) == [True, False, False, True,
                                 True, False, True]


def test_semdedup_transitive_chain_one_component():
    # a~b and b~c above threshold, a~c below: min-label must still merge
    # all three (transitive closure), keeping only the min id.
    a = np.array([1.0, 0.30, 0.0, 0.0])
    b = np.array([1.0, 0.00, 0.0, 0.0])
    c = np.array([1.0, -0.30, 0.0, 0.0])

    def cos(x, y):
        return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))

    thr = 0.93
    assert cos(a, b) >= thr and cos(b, c) >= thr and cos(a, c) < thr
    t = _emb_table([5, 6, 7], [a, b, c])
    out = semdedup(ray.data.from_arrow(t), _centroids(),
                   threshold=thr).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    assert list(out["keep"]) == [True, False, False]


def test_semdedup_max_cluster_raises_loudly():
    n = 9
    t = _emb_table(range(n), [[1, 0, 0, 0]] * n)
    with pytest.raises(Exception, match="max_cluster"):
        semdedup(ray.data.from_arrow(t), _centroids(), threshold=0.95,
                 max_cluster=4).to_pandas()


def test_semdedup_no_dups_keeps_everything():
    t = _emb_table([1, 2, 3],
                   [[1, 0, 0, 0], [0.8, 0, 0.6, 0], [0, 1, 0, 0]])
    out = semdedup(ray.data.from_arrow(t), _centroids(),
                   threshold=0.95).to_pandas()
    assert out["keep"].all() and len(out) == 3
