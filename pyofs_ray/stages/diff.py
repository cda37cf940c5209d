"""Snapshot set-difference: added/removed rows between two crawls.

Reference analogue: PyOFS's completeness audit diffs the expected file
inventory against what exists on disk (`state/manifest.audit_missing`,
reference `viirs.py` skip-existing scans). The dataset generalization
diffs two corpus snapshots by key — the incremental-crawl primitive
("what did this crawl add, what disappeared") a 100 TB pipeline runs
between refreshes instead of reprocessing everything.

Scale shape: ONE ``key % B`` bucket exchange carrying BOTH snapshots
side-tagged (a key lands in exactly one bucket, so membership is decided
locally); inside each bucket group one vectorized ``np.isin``
(unique-key sorted membership) per direction. No driver pull, no
sort-based groupby over corpus-cardinality keys, no second exchange —
a pair of EXCEPTs for the price of one shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def snapshot_diff(a: ray.data.Dataset, b: ray.data.Dataset, *, key: str,
                  payload: list[str], num_buckets: int = 64,
                  compare: str | None = None,
                  statuses: tuple[str, str, str] = ("removed", "added",
                                                    "modified")
                  ) -> ray.data.Dataset:
    """Rows of ``a`` whose ``key`` is absent from ``b`` (status
    ``statuses[0]``) plus rows of ``b`` absent from ``a``
    (``statuses[1]``). With ``compare`` set (a content-fingerprint
    column, e.g. md5 of text), keys present in BOTH snapshots whose
    fingerprint changed are emitted too — the ``a``-side row with status
    ``statuses[2]`` — making this the full incremental-crawl 3-way diff
    in the same single exchange. Keys must be unique within each
    snapshot (crawl snapshots are keyed); payload columns are carried
    through untouched. Output columns: ``payload..., status``."""
    cols = [key] + [c for c in dict.fromkeys(
        payload + ([compare] if compare else [])) if c != key]

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            return (t.select(cols)
                     .append_column("_bucket", pa.array(k % num_buckets))
                     .append_column("_side", pa.array(
                         np.full(len(t), side, np.int8))))
        return fn

    both = a.map_batches(tag(0), batch_format="pyarrow").union(
        b.map_batches(tag(1), batch_format="pyarrow"))
    return _diff_tagged(both, key=key, payload=payload, compare=compare,
                        statuses=statuses)


def snapshot_diff_tagged(both: ray.data.Dataset, *, key: str,
                         payload: list[str], num_buckets: int = 64,
                         compare: str | None = None,
                         statuses: tuple[str, str, str] = ("removed",
                                                           "added",
                                                           "modified")
                         ) -> ray.data.Dataset:
    """``snapshot_diff`` for callers that derive BOTH snapshots from one
    scan: ``both`` already carries an ``_side`` int8 column (0 = a,
    1 = b). Saves re-reading and re-deriving a shared source per side —
    at 100 TB the diff's cost is the read, so emitting the two sides from
    one pass halves it."""
    cols = [key] + [c for c in dict.fromkeys(
        payload + ([compare] if compare else [])) if c != key]

    def tag_bucket(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return (t.select(cols + ["_side"])
                 .append_column("_bucket", pa.array(k % num_buckets)))

    both = both.map_batches(tag_bucket, batch_format="pyarrow")
    return _diff_tagged(both, key=key, payload=payload, compare=compare,
                        statuses=statuses)


def _diff_tagged(both: ray.data.Dataset, *, key: str, payload: list[str],
                 compare: str | None,
                 statuses: tuple[str, str, str]) -> ray.data.Dataset:

    out_cols = [c for c in payload]

    def diff_bucket(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        keys = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        a_mask, b_mask = side == 0, side == 1
        a_keys, b_keys = keys[a_mask], keys[b_mask]
        # the membership kernel assumes unique keys per snapshot; a
        # violated contract must fail loudly, not mis-diff silently
        for nm, arr in (("a", a_keys), ("b", b_keys)):
            if len(arr) and len(np.unique(arr)) != len(arr):
                raise ValueError(
                    f"snapshot_diff: snapshot {nm} repeats key(s) in "
                    f"column {key!r} — snapshots must be keyed (dedup "
                    "upstream, e.g. canonical_url_dedup)")
        a_in_b = np.isin(a_keys, b_keys, assume_unique=True)
        removed = a_mask.copy()
        removed[a_mask] = ~a_in_b
        added = b_mask.copy()
        added[b_mask] = ~np.isin(b_keys, a_keys, assume_unique=True)
        modified = np.zeros(len(g), bool)
        if compare is not None and a_in_b.any():
            if g[compare].null_count:
                # str(None) would silently compare as the literal 'None'
                raise ValueError(
                    f"snapshot_diff: compare column {compare!r} contains "
                    "nulls — fingerprint every row or drop compare")
            cmp = np.asarray(g[compare].to_pylist(), dtype=str)
            b_order = np.argsort(b_keys, kind="stable")
            b_sorted = b_keys[b_order]
            pos = np.searchsorted(b_sorted, a_keys[a_in_b])
            b_rows = np.flatnonzero(b_mask)[b_order[pos]]
            a_rows = np.flatnonzero(a_mask)[a_in_b]
            modified[a_rows] = cmp[a_rows] != cmp[b_rows]
        sel = np.flatnonzero(removed | added | modified)
        out = g.select(out_cols).take(pa.array(sel))
        status = np.where(removed[sel], statuses[0],
                          np.where(added[sel], statuses[1], statuses[2]))
        return out.append_column("status",
                                 pa.array(status.tolist(), type=pa.string()))

    return both.groupby("_bucket").map_groups(diff_bucket,
                                              batch_format="pyarrow")
