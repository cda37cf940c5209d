"""HTML→text extraction, geo-constrained ANN, host authority/quota."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.registry import ORACLES, QUERIES
from pyofs_ray.stages.extract import extract_text

from .conftest import SF_SMOKE, assert_matches_oracle


def _extract(htmls: list[str]) -> list[str]:
    ds = ray.data.from_arrow(pa.table({
        "html": pa.array([h.encode() for h in htmls], pa.binary())}))
    return list(extract_text(ds).to_pandas()["text"])


def test_extract_strips_script_content_and_tags():
    html = ("<html><head><script>var n=3;\nvar s='</p>';</script></head>"
            "<body><p>hello world</p></body></html>")
    assert _extract([html]) == ["hello world"]


def test_extract_plain_text_untouched():
    assert _extract(["no markup at all"]) == ["no markup at all"]


def test_extract_drops_html_column():
    ds = ray.data.from_arrow(pa.table({
        "html": pa.array([b"<p>x</p>"], pa.binary())}))
    out = extract_text(ds).to_pandas()
    assert list(out.columns) == ["text"]


def test_html_extract_text_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["html_extract_text"](SF_SMOKE), duck_smoke,
                          ORACLES["html_extract_text"])


def test_semi_join_carries_list_payload():
    # regression: Acero refuses list<> non-key fields; the is_in-mask
    # semi/anti path must carry them
    from pyofs_ray.stages.join import bucketed_hash_join
    left = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])}))
    right = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([2, 3, 3], pa.int64())}))
    semi = (bucketed_hash_join(left, right, key="vec_id", join_type="semi")
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert list(semi.vec_id) == [2, 3]
    assert list(semi.embedding[0]) == [3.0, 4.0]
    anti = bucketed_hash_join(left, right, key="vec_id",
                              join_type="anti").to_pandas()
    assert list(anti.vec_id) == [1]


def test_ann_topk_bbox_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["ann_topk_bbox"](SF_SMOKE), duck_smoke,
                          ORACLES["ann_topk_bbox"])


def test_host_authority_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["host_authority"](SF_SMOKE), duck_smoke,
                          ORACLES["host_authority"])


def test_host_quota_sample_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["host_quota_sample"](SF_SMOKE), duck_smoke,
                          ORACLES["host_quota_sample"])


def test_host_quota_cap_and_determinism():
    from pyofs_ray.pipelines.flagship import host_quota_sample
    a = (host_quota_sample(SF_SMOKE, k=4).to_pandas()
         .sort_values(["host", "rank"]).reset_index(drop=True))
    counts = a.groupby("host").size()
    assert counts.max() <= 4
    assert (a.groupby("host")["rank"].max() == counts).all()
    # the hot host (h0) is actually capped, tail hosts keep all pages
    assert counts.get("h0.example.com", 0) == 4
    b = (host_quota_sample(SF_SMOKE, k=4).to_pandas()
         .sort_values(["host", "rank"]).reset_index(drop=True))
    assert a.equals(b)


def test_cell_top_hosts_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["cell_top_hosts"](SF_SMOKE), duck_smoke,
                          ORACLES["cell_top_hosts"])


def test_cell_top_hosts_rank_and_ties():
    from pyofs_ray.pipelines.flagship import cell_top_hosts
    out = (cell_top_hosts(SF_SMOKE, k=3).to_pandas()
           .sort_values(["cell_id", "rank"]).reset_index(drop=True))
    for _, g in out.groupby("cell_id"):
        counts = g.n_pages.tolist()
        assert counts == sorted(counts, reverse=True)  # count DESC
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        for i in range(len(g) - 1):  # equal counts → host ASC
            if counts[i] == counts[i + 1]:
                assert g.host.iloc[i] < g.host.iloc[i + 1]
        assert len(g) <= 3
