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
