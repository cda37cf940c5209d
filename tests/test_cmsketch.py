"""Count-min sketch (stages/cmsketch.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages.cmsketch import cm_estimate, cm_sketch_tokens


def test_cm_never_underestimates_and_is_tight_on_small_vocab():
    texts = ["a a b", "b c", "a d e"] * 50
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(6)
    cm = cm_sketch_tokens(ds, "text")
    est = cm_estimate(cm, ["a", "b", "c", "d", "e", "absent"])
    true = np.array([150, 100, 50, 50, 50, 0])
    assert (est >= true).all()
    # tiny vocabulary vs 8192 counters: collisions are absent in practice
    assert (est == true).all()


def test_cm_merge_invariant_to_partitioning():
    texts = [f"t{i % 37} t{i % 11}" for i in range(999)]
    a = cm_sketch_tokens(ray.data.from_arrow(pa.table({"text": texts})),
                         "text")
    b = cm_sketch_tokens(
        ray.data.from_arrow(pa.table({"text": texts})).repartition(16),
        "text")
    assert (a == b).all()
    assert a.sum() == 999 * 2 * 4  # every token lands once per row
