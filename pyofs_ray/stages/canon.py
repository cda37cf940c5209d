"""URL canonicalization + canonical-URL exact dedup.

Common-Crawl corpora carry the same page under trivially-different URLs
(case-insensitive scheme/host, fragments, tracking query params, trailing
slashes). Canonical-URL dedup is the cheapest, highest-yield dedup pass a
web-scale pipeline runs — BEFORE any content hashing — because it needs
no text bytes at all. Reference analogue: PyOFS's skip-existing dedup
keys downloads on a normalized path template
(`/root/reference/main/dataset/viirs.py` filename normalization before
the existing-file check); the web-page generalization normalizes the URL.

Canonicalization rules (the RE2-expressible subset, applied in order —
both pyarrow and DuckDB bind to RE2, so the twins match byte-for-byte):

1. strip the fragment (``#...$``),
2. strip ``utm_*`` tracking params (and the ``?``/``&`` that carries
   each), all occurrences,
3. strip one trailing ``/``,
4. lowercase the ``scheme://host`` prefix (never the path — paths are
   case-sensitive).

Scale shape: canonicalization is a pure per-batch Arrow-regex kernel; the
dedup reduce is ONE ``hash(canon)%B`` bucket exchange
(``agg.bucketed_group_agg`` — canon-URL cardinality tracks the corpus, so
a plain sort-based groupby would hit Ray 2.49's high-cardinality
pathology).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .agg import bucketed_group_agg

_PREFIX_RE = r"^[^/]*//[^/]*"


def canonical_url(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonical form of a URL column (rules above)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    c = pc.replace_substring_regex(arr, pattern=r"#.*$", replacement="")
    c = pc.replace_substring_regex(c, pattern=r"[?&]utm_[^&#]*",
                                   replacement="")
    c = pc.replace_substring_regex(c, pattern=r"/$", replacement="")
    pref = pc.struct_field(
        pc.extract_regex(c, rf"(?P<p>{_PREFIX_RE})"), "p")
    # no scheme://host prefix → extract misses → canon is c unchanged
    # (mirrors SQL: regexp_extract returns '' on no match)
    pref = pc.fill_null(pref, "")
    rest = pc.replace_substring_regex(c, pattern=_PREFIX_RE,
                                      replacement="", max_replacements=1)
    return pc.binary_join_element_wise(pc.utf8_lower(pref), rest, "")


def canonical_url_dedup(ds: ray.data.Dataset, *, url_col: str = "url",
                        ts_col: str = "warc_ts",
                        num_buckets: int | None = None) -> ray.data.Dataset:
    """One row per canonical URL: ``canon_url, first_ts (earliest
    fetch), dup_count``. The keep-first form of canonical dedup (the
    survivor is the earliest fetch, as a crawler's skip-existing check
    would keep it)."""

    def canon_batch(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        ts_us = np.asarray(ts.to_numpy(zero_copy_only=False)).view(np.int64)
        return pa.table({
            "canon_url": canonical_url(b[url_col]),
            "_ts": pa.array(ts_us),
            "_one": pa.array(np.ones(len(b), np.int64)),
        })

    rows = ds.map_batches(canon_batch, batch_format="pyarrow")
    agg = bucketed_group_agg(rows, keys=["canon_url"],
                             aggs=[("_ts", "min", "first_ts_us"),
                                   ("_one", "sum", "dup_count")],
                             num_buckets=num_buckets)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "canon_url": b["canon_url"],
            "first_ts": b["first_ts_us"].cast(pa.timestamp("us")),
            "dup_count": b["dup_count"],
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


# ------------------------------------------------------- crawl policy filter

def url_host_part(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Third '/'-separated url segment with SPLIT_PART(url,'/',3)
    semantics ('' when malformed) — the shared host-parse contract
    (`pipelines/flagship.url_host` is the same kernel; duplicated here
    because stages must not import pipelines)."""
    parts = pc.split_pattern(urls, "/")
    sliced = pc.list_slice(parts, 2, 3, return_fixed_size_list=True)
    if isinstance(sliced, pa.ChunkedArray):
        sliced = sliced.combine_chunks()
    return pc.if_else(pc.greater_equal(pc.list_value_length(parts), 3),
                      sliced.flatten(), pa.scalar("", pa.string()))


def url_policy_filter(ds: ray.data.Dataset,
                      host_exact: tuple[str, ...] = (),
                      host_suffix: tuple[str, ...] = (),
                      path_prefix: tuple[str, ...] = (),
                      url_col: str = "url") -> ray.data.Dataset:
    """Crawl blocklist filter: drop rows whose url matches ANY rule —
    exact host, host suffix (domain-level block), or path prefix
    (robots-style Disallow). The web analogue of the reference's
    study-area gating (`/root/reference/main/dataset/rtofs.py:182-188`
    keeps only in-domain records before any expensive work).

    Scale shape: the ruleset is a small broadcast side captured in the
    closure (shipped once per task, never shuffled); each rule is one
    vectorized Arrow kernel over the batch (`is_in` / `ends_with` /
    `starts_with`), so cost is O(rules × rows) C-kernel work with no
    exchange at all — a pure streaming filter."""
    exact_set = pa.array(list(host_exact), pa.string())

    def keep(b: pa.Table) -> pa.Table:
        urls = b[url_col].combine_chunks() \
            if isinstance(b[url_col], pa.ChunkedArray) else b[url_col]
        host = url_host_part(urls)
        path = pc.replace_substring_regex(urls, pattern=_PREFIX_RE,
                                          replacement="",
                                          max_replacements=1)
        blocked = pa.array(np.zeros(len(b), bool))
        if len(exact_set):
            blocked = pc.or_(blocked, pc.is_in(host, value_set=exact_set))
        for s in host_suffix:
            blocked = pc.or_(blocked, pc.ends_with(host, pattern=s))
        for p in path_prefix:
            blocked = pc.or_(blocked, pc.starts_with(path, pattern=p))
        return b.filter(pc.invert(blocked))

    return ds.map_batches(keep, batch_format="pyarrow")
