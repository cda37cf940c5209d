"""Distributed candidate-pair machinery shared by the near-dup family
(MinHash LSH, SimHash blocks, embedding sign-LSH).

The common shape: each document emits a handful of (bucket_key, id[, payload])
rows; genuine near-duplicates meet in a bucket. At 100 TB almost every bucket
has exactly one member, so the pipeline must (a) find the rare ≥2-member
buckets with a distributed count, (b) pull **only the filtered bucket keys**
to the driver (bounded by true near-dup clusters, never by corpus size),
(c) enumerate pairs inside distributed ``groupby(bucket).map_groups`` — the
full emitted table is never materialized driver-side.

Reference lineage: the skip-existing / co-registration joins (SURVEY.md
J6/J7, `validation/data_assimilation_validation.py:119-249`) are the same
"meet on a derived key, verify exactly" shape.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .agg import partial_group_sums

# Deterministic guard against adversarial hot buckets (e.g. a boilerplate
# string shared by millions of pages): a bucket is truncated to its
# ``max_bucket`` smallest ids before pair enumeration. Near-dup semantics
# degrade gracefully (boilerplate clusters that big are better handled by
# exact dedup first); the cap bounds per-group work at O(max_bucket²).
DEFAULT_MAX_BUCKET = 4096


def hot_bucket_keys(emitted: ray.data.Dataset, key: str) -> np.ndarray:
    """Bucket keys with ≥2 members, via partial-count → groupby-sum →
    **filter inside the Dataset** → driver pull of the survivors only.

    The pulled array is bounded by the number of true near-dup buckets —
    the full (8–20)×corpus bucket-size table never leaves the cluster.
    """
    from .agg import bucketed_int64_group_sum

    # bucketed int64 group-sum, NOT groupby(key).aggregate: the bucket-size
    # table has near-corpus key cardinality, exactly where Ray 2.49's
    # sort-based aggregate degrades (see bucketed_int64_group_sum)
    sizes = bucketed_int64_group_sum(
        emitted.map_batches(
            lambda b: partial_group_sums(b.select([key]), [key],
                                         (), count_name="n"),
            batch_format="pyarrow", zero_copy_batch=True),
        key=key, sum_cols=["n"])
    hot = sizes.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n"], 2)).select([key]),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if hot.empty:  # zero-row pull loses columns entirely — the normal case
        return np.array([], dtype=np.int64)  # on a dup-free corpus
    return hot[key].to_numpy()


def _empty_pairs_dataset(emitted: ray.data.Dataset,
                         payload_cols: Sequence[str]) -> ray.data.Dataset:
    """Zero-row Dataset with the PAIR schema (id_a, id_b[, <c>_a, <c>_b])
    — downstream verify stages must see pair columns even when no bucket
    had two members."""
    sch = emitted.schema()
    sch = sch.base_schema if hasattr(sch, "base_schema") else sch
    cols = {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    for c in payload_cols:
        t = sch.field(c).type if isinstance(sch, pa.Schema) else pa.int64()
        cols[f"{c}_a"] = pa.array([], t)
        cols[f"{c}_b"] = pa.array([], t)
    return ray.data.from_arrow(pa.table(cols))


def hot_bucket_rows(emitted: ray.data.Dataset, key: str) -> tuple[ray.data.Dataset, np.ndarray]:
    """Rows of ≥2-member buckets (semi-join against the broadcast hot-key
    set) plus the hot keys themselves. ``emitted`` is scanned twice — the
    caller materializes it (or, at 10¹²-doc scale, writes the sketch table
    to parquet once and reads it back for both passes)."""
    hot = hot_bucket_keys(emitted, key)
    if len(hot) == 0:
        return emitted.limit(0), hot
    hot_ref = ray.put(pa.array(hot, pa.int64()))

    def filt(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[key], value_set=ray.get(hot_ref)))

    return emitted.map_batches(filt, batch_format="pyarrow"), hot


def _overcap_error(key_val, size: int, max_bucket: int) -> ValueError:
    return ValueError(
        f"candidate bucket {key_val!r} has {size} members > max_bucket="
        f"{max_bucket}: truncation would silently drop pairs, but this "
        "caller registered the path as EXACT (overcap='raise'). Raise "
        "max_bucket, or run exact dedup first to collapse the boilerplate "
        "cluster, or accept sketch semantics with overcap='truncate'.")


def enumerate_bucket_pairs(rows: ray.data.Dataset, key: str, id_col: str,
                           payload_cols: Sequence[str] = (),
                           max_bucket: int = DEFAULT_MAX_BUCKET,
                           overcap: str = "truncate") -> ray.data.Dataset:
    """Distributed pair enumeration: one ``map_groups`` per hot bucket
    (hot buckets are few — the per-group Python cost is paid only where a
    real candidate cluster exists). Emits (id_a, id_b[, <c>_a, <c>_b…])
    with id_a < id_b; duplicates across buckets are NOT removed here.
    """
    payload_cols = list(payload_cols)

    def enum(g: pd.DataFrame) -> pd.DataFrame:
        # one row per id (a cross-band key collision can land the same doc
        # in one merged bucket twice — a self-pair must not be emitted)
        g = g.sort_values(id_col).drop_duplicates(id_col)
        if overcap == "raise" and len(g) > max_bucket:
            raise _overcap_error(g[key].iloc[0], len(g), max_bucket)
        g = g.head(max_bucket)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return _empty_pairs(payload_cols, g)
        ii, jj = np.triu_indices(len(ids), k=1)
        out = {"id_a": ids[ii], "id_b": ids[jj]}
        for c in payload_cols:
            v = g[c].to_numpy()
            out[f"{c}_a"] = v[ii]
            out[f"{c}_b"] = v[jj]
        return pd.DataFrame(out)

    def _empty_pairs(cols, g):
        out = {"id_a": pd.Series([], dtype=np.int64),
               "id_b": pd.Series([], dtype=np.int64)}
        for c in cols:
            out[f"{c}_a"] = pd.Series([], dtype=g[c].dtype)
            out[f"{c}_b"] = pd.Series([], dtype=g[c].dtype)
        return pd.DataFrame(out)

    return rows.groupby(key).map_groups(enum, batch_format="pandas")


# Below this emitted-row count the whole sketch table fits one task
# (~16 MB of key+id rows per million): Ray 2.49 charges seconds of fixed
# wall per all-to-all (see CLAUDE.md), so the sizes-groupby + per-bucket
# map_groups exchanges cost far more than one vectorized pass. The
# coalesced finish is in-cluster (repartition(1) task), NOT a driver pull,
# and produces identical pairs; above the threshold the distributed path
# runs (the 100 TB shape).
SMALL_EMITTED_ROWS = 2_000_000


def _enum_all_buckets(df: pd.DataFrame, key: str, id_col: str,
                      payload_cols: Sequence[str], max_bucket: int,
                      overcap: str = "truncate") -> pd.DataFrame:
    """Vectorized pair enumeration over every ≥2-member bucket of one
    coalesced sketch table (run-length ranges per sorted key)."""
    df = (df.sort_values([key, id_col])
            .drop_duplicates([key, id_col]).reset_index(drop=True))
    k = df[key].to_numpy()
    starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
    ends = np.append(starts[1:], len(k))
    if overcap == "raise" and len(k):
        sizes = ends - starts
        bad = np.flatnonzero(sizes > max_bucket)
        if len(bad):
            raise _overcap_error(k[starts[bad[0]]], int(sizes[bad[0]]),
                                 max_bucket)
    ids = df[id_col].to_numpy()
    payload = {c: df[c].to_numpy() for c in payload_cols}
    out_a, out_b = [], []
    out_p: dict[str, list] = {f"{c}_a": [] for c in payload_cols}
    out_p.update({f"{c}_b": [] for c in payload_cols})
    for s, e in zip(starts, ends):
        n = min(e - s, max_bucket)
        if n < 2:
            continue
        ii, jj = np.triu_indices(n, k=1)
        out_a.append(ids[s + ii])
        out_b.append(ids[s + jj])
        for c in payload_cols:
            out_p[f"{c}_a"].append(payload[c][s + ii])
            out_p[f"{c}_b"].append(payload[c][s + jj])
    cols = {"id_a": np.concatenate(out_a) if out_a else np.array([], np.int64),
            "id_b": np.concatenate(out_b) if out_b else np.array([], np.int64)}
    for c in payload_cols:
        cols[f"{c}_a"] = (np.concatenate(out_p[f"{c}_a"]) if out_a
                          else np.array([], df[c].dtype))
        cols[f"{c}_b"] = (np.concatenate(out_p[f"{c}_b"]) if out_a
                          else np.array([], df[c].dtype))
    return pd.DataFrame(cols)


# Above this emitted-row count the sketch table is too big to pin in the
# object store for its two scans (at 10¹² docs the (8–20)×corpus emitted
# table is 100+ TB): spill it to a temp parquet layout once and read it
# back for both the sizes pass and the hot filter. Below it,
# materialize() is cheaper (no disk round-trip).
# $PYOFS_SPILL_EMITTED_ROWS overrides (bench --spill forces the spill
# path end-to-end at fixture scale by setting it to 1 in a fresh
# process; see BASELINE.md "spill path" row).
import os as _os

SPILL_EMITTED_ROWS = int(_os.environ.get("PYOFS_SPILL_EMITTED_ROWS",
                                         50_000_000))

# observability: number of times the spill path actually engaged in this
# process (bench --spill asserts it is non-zero on the forced leg)
SPILL_ENGAGED = 0

_SPILL_DIRS: list[str] = []


def _cleanup_spills() -> None:
    import shutil
    for d in _SPILL_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _SPILL_DIRS.clear()


def _spill_emitted(emitted: ray.data.Dataset,
                   spill_dir: str | None = None) -> ray.data.Dataset:
    """Write the emitted sketch table to a temp parquet layout (ONE scan of
    the upstream, streaming with backpressure — nothing pinned) and return a
    lazy re-read. Each downstream pass over the result is then an
    independent parquet scan; `.count()` on it is metadata-only.

    MULTI-NODE: write tasks run on whichever node executes them, so the
    spill location must be CLUSTER-VISIBLE (s3://…, NFS mount) — set
    ``spill_dir`` or ``$PYOFS_SPILL_DIR``. The node-local ``/tmp`` default
    is correct only single-node (this sandbox); local temp dirs are removed
    at process exit (the returned Dataset is lazy, so they must outlive
    this call), URI spills are left for the store's lifecycle policy."""
    import atexit
    import os
    import tempfile
    import uuid

    global SPILL_ENGAGED
    SPILL_ENGAGED += 1
    base = spill_dir or os.environ.get("PYOFS_SPILL_DIR")
    if base:
        path = f"{base.rstrip('/')}/pyofs_emitted_{uuid.uuid4().hex}"
    else:
        path = tempfile.mkdtemp(prefix="pyofs_emitted_", dir="/tmp")
        if not _SPILL_DIRS:
            atexit.register(_cleanup_spills)
        _SPILL_DIRS.append(path)
    emitted.write_parquet(path)
    return ray.data.read_parquet(path)


# Public name: any pipeline that needs to re-scan an intermediate Dataset
# several times should spill it once instead of materialize()-pinning it
# (e.g. `pipelines.corpus.curate_docs`'s filtered corpus).
spill_to_parquet = _spill_emitted


def candidate_pairs(emitted: ray.data.Dataset, key: str, id_col: str,
                    payload_cols: Sequence[str] = (),
                    max_bucket: int = DEFAULT_MAX_BUCKET,
                    small_rows: int | None = None,
                    spill: bool | None = None,
                    rows_hint: int | None = None,
                    spill_dir: str | None = None,
                    overcap: str = "truncate") -> ray.data.Dataset:
    """(bucket_key, id[, payload]) rows → candidate (id_a, id_b[, payload])
    pairs, fully in-pipeline. Pairs may repeat across buckets; dedupe
    downstream (after the exact verify, where the data is smallest).

    ``emitted`` is scanned twice (bucket sizes, then the hot filter), so it
    must be re-readable: pinned in the object store (``materialize()``,
    right for fixture-scale inputs) or — the 100 TB shape — **spilled to a
    temp parquet layout once and read back for both passes**, so the object
    store never holds the full (8–20)×corpus sketch table. ``spill=None``
    auto-selects: spill when ``rows_hint`` (the caller's emitted-row
    estimate, e.g. docs × bands) exceeds ``SPILL_EMITTED_ROWS``."""
    if small_rows is None:
        small_rows = SMALL_EMITTED_ROWS
    if spill is None:
        spill = rows_hint is not None and rows_hint > SPILL_EMITTED_ROWS
    if spill:
        emitted = _spill_emitted(emitted, spill_dir=spill_dir)
    else:
        emitted = emitted.materialize()  # scanned twice: sizes + hot filter
    if emitted.count() <= small_rows:
        payload_cols = list(payload_cols)
        return emitted.repartition(1).map_batches(
            lambda df: _enum_all_buckets(df, key, id_col, payload_cols,
                                         max_bucket, overcap),
            batch_format="pandas", batch_size=None)
    rows, hot = hot_bucket_rows(emitted, key)
    if len(hot) == 0:
        return _empty_pairs_dataset(emitted, payload_cols)
    return enumerate_bucket_pairs(rows, key, id_col, payload_cols, max_bucket,
                                  overcap)


# Below this candidate-pair count the signature table (2×pairs rows) is a
# classic broadcast small side: ray.put once, dict-joined inside
# map_batches — two bucketed-join exchanges saved. Above it, the
# distributed joins run (pairs are then too big to broadcast).
SMALL_PAIRS = 100_000


def attach_candidate_signatures(cand: ray.data.Dataset, ds: ray.data.Dataset,
                                id_col: str, sig_fn,
                                small_pairs: int | None = None) -> ray.data.Dataset | None:
    """Join per-id signatures onto both sides of a candidate pair set.

    ``cand`` must be materialized. Candidate ids (bounded by near-dup
    clusters, ≪ corpus) broadcast as a semi-join filter over ``ds``;
    ``sig_fn(batch) -> (id_col, sig…)`` computes signatures distributed;
    the signatures attach as ``<c>_a`` / ``<c>_b`` — via broadcast lookup
    when the pair set is small, via two bucketed hash joins otherwise.
    Returns None when there are no candidates."""
    if small_pairs is None:
        small_pairs = SMALL_PAIRS
    n_pairs = cand.count()
    if n_pairs == 0:
        return None
    ids_df = cand.map_batches(
        lambda b: pa.table({"id": pa.concat_arrays(
            [b["id_a"].combine_chunks(), b["id_b"].combine_chunks()])}),
        batch_format="pyarrow").to_pandas()
    need_ref = ray.put(pa.array(np.unique(ids_df["id"].to_numpy()), pa.int64()))

    def filt(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[id_col], value_set=ray.get(need_ref)))

    sigs = (ds.map_batches(filt, batch_format="pyarrow")
              .map_batches(sig_fn, batch_format="pyarrow"))
    if n_pairs > small_pairs:
        return attach_pair_payload(cand, sigs, id_col=id_col)
    # broadcast path: signature table is candidate-bounded (≤ 2×pairs rows)
    sig_tbl = pa.Table.from_pandas(sigs.to_pandas(), preserve_index=False)
    sig_ref = ray.put(sig_tbl)
    sig_cols = [c for c in sig_tbl.column_names if c != id_col]

    def attach(b: pa.Table) -> pa.Table:
        sig = ray.get(sig_ref)
        sid = sig[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(sid)
        sid_sorted = sid[order]
        cols = dict(zip(b.column_names, b.columns))
        for side in ("a", "b"):
            want = b[f"id_{side}"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(sid_sorted, want)
            # a candidate id missing from the signature table must raise,
            # not silently attach the next id's signature
            if len(sid_sorted) == 0:
                ok = np.zeros(len(want), dtype=bool) if len(want) else \
                    np.ones(0, dtype=bool)
            else:
                ok = (idx < len(sid_sorted)) & (
                    sid_sorted[np.minimum(idx, len(sid_sorted) - 1)] == want)
            if not ok.all():
                missing = np.asarray(want)[~ok][:5]
                raise KeyError(
                    f"attach_candidate_signatures: candidate id(s) {missing!r} "
                    f"have no signature row (sig_fn dropped them or the corpus "
                    f"filter missed them)")
            pos = order[idx]
            for c in sig_cols:
                cols[f"{c}_{side}"] = sig[c].take(pa.array(pos))
        return pa.table(cols)

    return cand.map_batches(attach, batch_format="pyarrow")


def attach_pair_payload(pairs: ray.data.Dataset, payload: ray.data.Dataset,
                        id_col: str, num_buckets: int = 64) -> ray.data.Dataset:
    """Join a per-id payload onto both sides of an (id_a, id_b) pair set —
    two distributed bucketed hash joins, no driver materialization.
    ``payload`` columns (other than ``id_col``) come back as ``<c>_a`` /
    ``<c>_b``. Pairs ≪ corpus, so both joins move pair-bounded data."""
    from .join import bucketed_hash_join

    # map_groups output carries a pandas block schema; the bucketed join
    # needs Arrow fields — coerce with an identity Arrow pass.
    pairs = pairs.map_batches(lambda b: b, batch_format="pyarrow")

    def rn(side: str):
        def fn(b: pa.Table) -> pa.Table:
            names = [f"id_{side}" if n == id_col else f"{n}_{side}"
                     for n in b.column_names]
            return b.rename_columns(names)
        return fn

    j = bucketed_hash_join(
        pairs, payload.map_batches(rn("a"), batch_format="pyarrow"),
        key="id_a", num_buckets=num_buckets)
    j = bucketed_hash_join(
        j, payload.map_batches(rn("b"), batch_format="pyarrow"),
        key="id_b", num_buckets=num_buckets)
    return j
