"""SCD-type-2 intervalization: snapshot rows → validity-interval history.

Reference analogue: PyOFS keeps one file per (date, source) observation and
re-derives "what was current when" by directory listing (`state/manifest`,
reference `viirs.py` per-day granule inventories). The dataset
generalization is the slowly-changing-dimension build every incremental
crawl store needs: collapse per-key snapshot fingerprints into
``(key, fingerprint, valid_from, valid_to)`` version intervals, with an
open (sentinel) ``valid_to`` on the current version.

Scale shape: ONE ``hash(key) % B`` bucket exchange (a key's snapshots land
in exactly one bucket, so run-length collapsing is decided locally);
inside each bucket group one vectorized lexsort + dictionary-encoded
fingerprint change-point scan. Only (key, carry, ts, fp) rows shuffle —
never document payloads. No driver pull; output is version-bounded
(≤ #snapshots rows, typically ≪).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import ray.data

SCD_OPEN_SENTINEL = 999  # valid_to for the still-current version


def intervals_table(g: pa.Table, *, key_col: str, ts_col: str, fp_col: str,
                    carry: Sequence[str] = (),
                    sentinel: int = SCD_OPEN_SENTINEL) -> pa.Table:
    """The SCD2 collapse kernel over one table that holds EVERY snapshot of
    each key it contains (one bucket group, or a batch the caller
    guarantees is key-complete). Vectorized: lexsort + dictionary-encoded
    fingerprint change-point scan — no Python string compares."""
    k = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = g[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
    enc = g[fp_col].combine_chunks().dictionary_encode()
    fpc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ts, k))
    k, ts, fpc = k[order], ts[order], fpc[order]
    newkey = np.r_[True, k[1:] != k[:-1]]
    change = newkey | np.r_[True, fpc[1:] != fpc[:-1]]
    idx = np.flatnonzero(change)
    nxt = np.r_[idx[1:], len(k)]
    has_nxt = nxt < len(k)
    same_key = np.zeros(len(idx), bool)
    same_key[has_nxt] = k[nxt[has_nxt]] == k[idx[has_nxt]]
    vto = np.full(len(idx), sentinel, np.int64)
    vto[same_key] = ts[nxt[same_key]]
    take = pa.array(order[idx])
    out = {key_col: pa.array(k[idx])}
    for c in carry:
        out[c] = g[c].take(take)
    out[fp_col] = g[fp_col].take(take)
    out["valid_from"] = pa.array(ts[idx])
    out["valid_to"] = pa.array(vto)
    return pa.table(out)


def scd2_intervals(ds: ray.data.Dataset, *, key_col: str, ts_col: str,
                   fp_col: str, carry: Sequence[str] = (),
                   num_buckets: int | None = None,
                   sentinel: int = SCD_OPEN_SENTINEL) -> ray.data.Dataset:
    """Collapse snapshot rows ``(key, ts, fp, carry...)`` into SCD2
    intervals ``(key, carry..., fp, valid_from, valid_to)``.

    A new interval starts at a key's first snapshot and at every snapshot
    whose fingerprint differs from the previous one (ordered by ``ts``);
    ``valid_to`` is the next interval's ``valid_from`` or ``sentinel`` for
    the open current version. ``key_col`` and ``ts_col`` must be int64;
    ``carry`` columns must be constant per key (e.g. the url for an int
    page key).
    """
    from .agg import hash_bucket_tag

    if num_buckets is None:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)
    nb = num_buckets
    cols = [key_col, ts_col, fp_col, *carry]

    tagged = ds.map_batches(
        lambda b: hash_bucket_tag(b.select(cols), [key_col], nb),
        batch_format="pyarrow")

    def kernel(g: pa.Table) -> pa.Table:
        return intervals_table(g, key_col=key_col, ts_col=ts_col,
                               fp_col=fp_col, carry=carry,
                               sentinel=sentinel)

    return tagged.groupby("_bucket").map_groups(kernel,
                                                batch_format="pyarrow")
