"""Tests for compositing (A4), neighbor stencil (J5), validation (A6/J6)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.registry import ORACLES, QUERIES
from pyofs_ray.stages.composite import last_per_cell

from .conftest import SF_SMOKE, assert_matches_oracle


def test_composite_oracles(duck_smoke):
    for name in ("latest_page_per_cell", "cell_gradients", "coregistration_metrics"):
        assert_matches_oracle(QUERIES[name](SF_SMOKE), duck_smoke, ORACLES[name])


def test_last_per_cell_order_insensitive():
    # same rows in two different block orders → identical winner
    rows = [
        {"cell_id": 1, "warc_ts": np.datetime64("2024-01-01", "us"), "page_key": 1, "lang": "a"},
        {"cell_id": 1, "warc_ts": np.datetime64("2024-01-03", "us"), "page_key": 2, "lang": "b"},
        {"cell_id": 1, "warc_ts": np.datetime64("2024-01-03", "us"), "page_key": 3, "lang": "c"},
        {"cell_id": 2, "warc_ts": np.datetime64("2024-01-02", "us"), "page_key": 4, "lang": "d"},
    ]
    for perm in ([0, 1, 2, 3], [3, 2, 1, 0], [2, 0, 3, 1]):
        t = pa.Table.from_pylist([rows[i] for i in perm])
        ds = ray.data.from_arrow(t).repartition(2)
        out = last_per_cell(ds).to_pandas().sort_values("cell_id").reset_index(drop=True)
        # ties on warc_ts broken by page_key: cell 1 → page 3
        assert out.page_key.tolist() == [3, 4]
        assert out.lang.tolist() == ["c", "d"]


def test_coregistration_metrics_shape():
    df = QUERIES["coregistration_metrics"](SF_SMOKE)
    assert list(df.columns) == ["n_cells", "rmse", "r2"]
    assert df.n_cells.iloc[0] > 0 and df.rmse.iloc[0] >= 0


def test_topk_grouped_mode_equals_small_mode():
    import pyarrow as pa
    import ray.data

    from pyofs_ray.stages.composite import topk_per_key

    rows = [{"k": i % 7, "v": (i * 31) % 100, "tag": i} for i in range(500)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    cols = ["k", "v", "tag", "rank"]
    a = (topk_per_key(ds, keys=("k",), order_cols=("v", "tag"), k=4,
                      payload_cols=("tag",)).to_pandas()[cols]
         .sort_values(["k", "rank"]).reset_index(drop=True))
    b = (topk_per_key(ds, keys=("k",), order_cols=("v", "tag"), k=4,
                      payload_cols=("tag",), final_mode="grouped")
         .to_pandas()[cols].sort_values(["k", "rank"]).reset_index(drop=True))
    assert a.equals(b)
    assert (a.groupby("k")["rank"].max() == 4).all()
