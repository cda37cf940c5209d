"""Inverted-index (url_token_index) kernel tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages import postings


def _ds(rows: list[tuple[int, str]], blocks: int = 3) -> ray.data.Dataset:
    keys, urls = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "page_key": pa.array(keys, pa.int64()),
        "url": pa.array(urls, pa.string())})).repartition(blocks)


def _index(rows, **kw):
    df = (postings.url_token_index(_ds(rows), **kw)
          .to_pandas().sort_values("token").reset_index(drop=True))
    return {r.token: (r.df, r.postings_head) for r in df.itertuples()}


def test_df_and_full_postings():
    rows = [(1, "https://a.com/x"), (2, "https://a.com/y"),
            (3, "https://b.com/x")]
    idx = _index(rows)
    assert idx["a"] == (2, "1,2")
    assert idx["b"] == (1, "3")
    assert idx["x"] == (2, "1,3")
    assert idx["com"] == (3, "1,2,3")
    assert idx["https"] == (3, "1,2,3")


def test_head_truncation_keeps_exact_df():
    rows = [(k, f"https://hot.com/p/{k}") for k in range(20)]
    idx = _index(rows, head_k=4)
    assert idx["hot"] == (20, "0,1,2,3")  # truncated head, exact df
    assert idx["5"] == (1, "5")           # tail token keeps its full list


def test_duplicate_token_in_one_url_counts_once():
    rows = [(7, "https://p.com/p/p")]
    idx = _index(rows)
    assert idx["p"] == (1, "7")


def test_bucket_count_independent():
    rows = [(k, f"https://h{k % 5}.com/p/{k}") for k in range(50)]
    a = (postings.url_token_index(_ds(rows), num_buckets=2)
         .to_pandas().sort_values("token").reset_index(drop=True))
    b = (postings.url_token_index(_ds(rows, blocks=1), num_buckets=13)
         .to_pandas().sort_values("token").reset_index(drop=True))
    assert a.equals(b)


def test_cross_block_token_merges():
    # same token spread over many blocks must merge into ONE row
    rows = [(k, f"https://same.com/u{k}") for k in range(30)]
    idx = _index(rows, head_k=8)
    df, head = idx["same"]
    assert df == 30
    assert head == ",".join(str(i) for i in range(8))


def test_url_token_index_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["url_token_index"](SF_SMOKE), duck_smoke,
                          ORACLES["url_token_index"])
