"""Inverted-index construction: token → document-frequency + posting head.

The IR-side analogue of the reference's per-variable layer catalogs
(`/root/reference/main/write_json.py:15-48` maintains a lookup from key to
the files containing it); here the lookup is token → the pages containing
it, over URL tokens (hosts are hot — 70 % of the fixture sits on one host —
while path ids give a df=1 long tail, so both the truncation and the
full-list paths are exercised by construction).

Scale shape: per-batch flatten + local distinct collapses each block to its
unique (token, page_key) pairs, then ONE ``fnv(token) % B`` bucket exchange
(~CPU distinct sort values — the `bucketed_group_agg` lesson) feeds a fully
vectorized per-bucket kernel: Arrow ``sort_by`` (token, page_key), segment
boundaries by shifted compare, df = segment length, posting head = the
first ``head_k`` ids per segment via ``ListArray`` offsets +
``pc.binary_join``. No per-token Python; posting rows are bounded by
``head_k`` per token so no row ever exceeds a few hundred bytes regardless
of how hot a token is (an uncapped posting list for a df=10^9 token would
be a single multi-GB row — the cap is the 100-TB design decision, with
``df`` always exact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .analytic import _bucket_of

URL_TOKEN_SPLIT = r"[/.:]+"
HEAD_K = 8


def url_token_index(pages: ray.data.Dataset, head_k: int = HEAD_K,
                    num_buckets: int | None = None) -> ray.data.Dataset:
    """(token, df, postings_head) over URL tokens of a (page_key, url)
    Dataset; postings_head = comma-joined first ``head_k`` page keys in
    ascending order (full list whenever df <= head_k)."""
    if num_buckets is None:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)

    def emit(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b["url"], URL_TOKEN_SPLIT)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keys = b["page_key"].combine_chunks().take(parent)
        t = pa.table({"token": flat, "page_key": keys})
        t = t.filter(pc.not_equal(t["token"], ""))
        t = t.group_by(["token", "page_key"]).aggregate([])  # local distinct
        return t.append_column(
            "_bucket", pa.array(_bucket_of(t["token"], num_buckets)))

    def combine(g: pa.Table) -> pa.Table:
        empty = pa.table({"token": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "postings_head": pa.array([], pa.string())})
        if len(g) == 0:
            return empty
        g = (g.select(["token", "page_key"])
              .group_by(["token", "page_key"]).aggregate([])  # cross-block
              .sort_by([("token", "ascending"), ("page_key", "ascending")]))
        tok = g["token"].combine_chunks()
        ids = g["page_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(tok)
        eq = pc.equal(tok.slice(1), tok.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
        new = np.concatenate([[True], ~eq])
        seg = np.cumsum(new) - 1
        df = np.bincount(seg)
        starts = np.cumsum(df) - df
        rank = np.arange(n, dtype=np.int64) - starts[seg]
        keep = rank < head_k
        kept = np.minimum(df, head_k)
        offsets = np.concatenate([[0], np.cumsum(kept)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(ids[keep].astype(str), pa.string()))
        return pa.table({"token": tok.take(pa.array(starts, pa.int64())),
                         "df": pa.array(df.astype(np.int64)),
                         "postings_head": pc.binary_join(lists, ",")})

    return (pages.map_batches(emit, batch_format="pyarrow")
                 .groupby("_bucket")
                 .map_groups(combine, batch_format="pyarrow"))


def url_token_index_sql(pages_prefix: str, head_k: int = HEAD_K) -> str:
    """DuckDB twin: DISTINCT pairs → windowed rank → conditional
    string_agg (NULL entries are skipped by string_agg, so the head is the
    first ``head_k`` ids per token)."""
    return f"""{pages_prefix},
toks AS (
  SELECT DISTINCT page_key, tok AS token FROM (
    SELECT page_key,
           unnest(regexp_split_to_array(url, '{URL_TOKEN_SPLIT}')) AS tok
    FROM pages)
  WHERE tok <> ''
),
ranked AS (
  SELECT token, page_key,
         ROW_NUMBER() OVER (PARTITION BY token ORDER BY page_key) AS rn
  FROM toks
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CASE WHEN rn <= {head_k}
                       THEN CAST(page_key AS VARCHAR) END,
                  ',' ORDER BY page_key) AS postings_head
FROM ranked GROUP BY token"""
