"""Deduplication family over the documents/pages text column.

The reference's only dedup is work-unit skip-existing (SURVEY.md O4,
`write_daily_average.py:289-311`, `download.py:148`); a web-scale corpus
engine needs content dedup as a first-class operator set:

- **exact**: md5(text) hash → two-stage (per-batch min/count partial, then a
  single groupby on the hash) — hash-partitioned "keep first (min doc_id)";
  SQL-oracle-checkable.
- **MinHash + LSH near-dup**: char-shingle set → 64 minhash permutations
  (splitmix64 mixes of the shingle hash) → B bands × R rows; band buckets
  meet in one groupby; candidate pairs are then **exactly verified** with
  true shingle-set Jaccard, so precision is exact and only recall is
  probabilistic (standard LSH guarantee).
- **SimHash**: 64-bit sign-sum sketch of token hashes; near-dup candidates
  from equal 16-bit chunks (Hamming ≤ 3 ⇒ some chunk equal by pigeonhole),
  verified by exact Hamming distance.

Scale notes: sketches are computed batch-local (vectorized numpy over the
shingle hash matrix); the only shuffles are groupbys on (band, hash) /
chunk keys whose groups are tiny unless the corpus truly contains
near-duplicate clusters. Pair verification joins text back via a broadcast
of candidate ids — candidates are assumed ≪ corpus (documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum

from ..core.hashing import fnv1a64, splitmix64
from .text import fingerprint

# ------------------------------------------------------------------ exact
def exact_dedup(ds: ray.data.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> ray.data.Dataset:
    """One row per distinct text: (text_hash, doc_id=min id, dup_count)."""

    def partial(b: pa.Table) -> pa.Table:
        b = fingerprint(b.select([id_col, text_col]), text_col)
        g = b.select(["text_hash", id_col]).group_by("text_hash").aggregate(
            [(id_col, "min"), (id_col, "count")])
        return pa.table({
            "text_hash": g["text_hash"],
            "min_id": g[f"{id_col}_min"].cast(pa.int64()),
            "cnt": g[f"{id_col}_count"].cast(pa.int64()),
        })

    from .agg import auto_partitions

    agg = (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
             .repartition(auto_partitions())
             .groupby("text_hash")
             .aggregate(Min("min_id", alias_name="doc_id"),
                        Sum("cnt", alias_name="dup_count")))
    return agg


# ------------------------------------------------------------ shingles
SHINGLE_K = 5  # char 5-grams
NUM_PERM = 64
LSH_BANDS = 8  # 8 bands × 8 rows


def _shingle_hashes(text: str) -> np.ndarray:
    """Distinct byte-k-gram FNV hashes of one document (uint64).

    Byte-level windows over the UTF-8 encoding (same definition as the
    vectorized batch path `core.hashing.gram_hash_matrix`)."""
    if text is None:
        return np.array([0xDEADBEEF], dtype=np.uint64)
    raw = text.encode("utf-8")
    if len(raw) < SHINGLE_K:
        return np.array([0xDEADBEEF], dtype=np.uint64)
    from ..core.hashing import gram_hash_matrix
    h, v = gram_hash_matrix(pa.array([text]), SHINGLE_K)
    return np.unique(h[0][v[0]])


_SEEDS = splitmix64(np.arange(1, NUM_PERM + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """64 minhash values: min over shingles of splitmix64(shingle ^ seed)."""
    # (shingles, perms) matrix — vectorized; shingle counts are ~len(text)
    mixed = splitmix64(sh[:, None] ^ _SEEDS[None, :])
    return mixed.min(axis=0)  # (NUM_PERM,)


def band_keys(sig: np.ndarray) -> np.ndarray:
    """Collapse each band of R minhash values to one uint64 bucket key."""
    r = NUM_PERM // LSH_BANDS
    bands = sig.reshape(LSH_BANDS, r)
    out = np.zeros(LSH_BANDS, dtype=np.uint64)
    for j in range(r):
        with np.errstate(over="ignore"):
            out = splitmix64(out ^ bands[:, j])
    return out


def batch_minhash_signatures(texts: pa.Array) -> np.ndarray:
    """(N, NUM_PERM) minhash matrix for a whole batch — fully vectorized:
    one gram-hash matrix pass, then NUM_PERM vectorized min-reductions
    (min over a multiset equals min over the set, so no per-doc unique)."""
    from ..core.hashing import gram_hash_matrix
    grams, valid = gram_hash_matrix(texts, SHINGLE_K)
    n = len(grams)
    # docs with no valid gram get the sentinel shingle
    none_valid = ~valid.any(axis=1)
    if none_valid.any():
        grams = grams.copy()
        valid = valid.copy()
        grams[none_valid, 0] = np.uint64(0xDEADBEEF)
        valid[none_valid, 0] = True
    sigs = np.empty((n, NUM_PERM), dtype=np.uint64)
    maxu = np.uint64(0xFFFFFFFFFFFFFFFF)
    for p in range(NUM_PERM):
        mixed = splitmix64(grams ^ _SEEDS[p])
        mixed = np.where(valid, mixed, maxu)
        sigs[:, p] = mixed.min(axis=1)
    return sigs


def _minhash_batch(b: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Per doc: emit LSH_BANDS rows (band_id, band_hash, id) — vectorized."""
    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sigs = batch_minhash_signatures(b[text_col])  # (N, NUM_PERM)
    r = NUM_PERM // LSH_BANDS
    bands = sigs.reshape(len(ids), LSH_BANDS, r)
    keys = np.zeros((len(ids), LSH_BANDS), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(r):
            keys = splitmix64(keys ^ bands[:, :, j])
    return pa.table({
        "band_id": pa.array(np.tile(np.arange(LSH_BANDS, dtype=np.int64), len(ids))),
        "band_hash": pa.array(keys.reshape(-1).view(np.int64)),
        id_col: pa.array(np.repeat(ids, LSH_BANDS)),
    })


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def _bucket_key(band_id: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
    """Composite bucket key for filtering (xor-mix; a collision only adds a
    harmless extra candidate row — pairs are enumerated per exact bucket)."""
    with np.errstate(over="ignore"):
        return (band_hash.view(np.uint64)
                ^ splitmix64(band_id.astype(np.uint64))).view(np.int64)


def minhash_candidate_pairs(ds: ray.data.Dataset, id_col: str = "doc_id",
                            text_col: str = "text") -> pd.DataFrame:
    """LSH candidate pairs: ids sharing any (band_id, band_hash) bucket.

    No per-bucket Python: a native count-aggregate finds the (rare)
    buckets with ≥2 members; their keys broadcast back as a semi-join
    filter; the surviving rows (≪ corpus — bounded by near-dup clusters)
    are pair-enumerated with one vectorized pandas pass.
    """
    emitted = ds.map_batches(
        lambda b: _minhash_batch(b, id_col, text_col),
        batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)

    def keyed(b: pa.Table) -> pa.Table:
        k = _bucket_key(b["band_id"].to_numpy(zero_copy_only=False),
                        b["band_hash"].to_numpy(zero_copy_only=False))
        return b.append_column("bkey", pa.array(k))

    # pin the sketch table: 8 small rows/doc, read twice (sizes + filter).
    # At 10^12-doc scale, write it to parquet once instead (sketches are
    # reused across dedup runs) rather than pinning in the object store.
    emitted = emitted.map_batches(keyed, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    from .agg import auto_partitions, partial_group_sums
    sizes = (emitted.map_batches(
                 lambda b: partial_group_sums(b, ["bkey"], (), count_name="n"),
                 batch_format="pyarrow", zero_copy_batch=True)
             .repartition(auto_partitions())
             .groupby("bkey").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    hot = sizes[sizes.n >= 2].bkey.to_numpy()
    if len(hot) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64)})
    hot_set = pa.array(hot, pa.int64())
    rows = emitted.map_batches(
        lambda b: b.filter(pc.is_in(b["bkey"], value_set=hot_set)),
        batch_format="pyarrow").to_pandas()
    # vectorized pair enumeration per exact bucket
    rows = rows.sort_values(["band_id", "band_hash", id_col])
    out_a, out_b = [], []
    for (_bid, _bh), g in rows.groupby(["band_id", "band_hash"], sort=False):
        ids = g[id_col].to_numpy()
        if len(ids) >= 2:
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii]); out_b.append(ids[jj])
    if not out_a:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64)})
    pairs = pd.DataFrame({"id_a": np.concatenate(out_a),
                          "id_b": np.concatenate(out_b)})
    return pairs.drop_duplicates().reset_index(drop=True)


def minhash_dedup_pairs(ds: ray.data.Dataset, threshold: float = 0.8,
                        id_col: str = "doc_id", text_col: str = "text") -> pd.DataFrame:
    """Near-dup pairs with exact-verified shingle Jaccard ≥ threshold.

    Candidate verification pulls the candidate docs' texts via a filtered
    pass over the source (candidates ≪ corpus assumed; at 100 TB this is a
    broadcast-semi-join + per-pair verify inside map_groups).
    """
    pairs = minhash_candidate_pairs(ds, id_col, text_col)
    if pairs.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64),
                             "jaccard": pd.Series([], dtype=float)})
    need = np.unique(np.concatenate([pairs.id_a.to_numpy(), pairs.id_b.to_numpy()]))
    need_set = pa.array(need, pa.int64())
    texts = (ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=need_set)).select([id_col, text_col]),
        batch_format="pyarrow").to_pandas().set_index(id_col)[text_col].to_dict())
    sh = {i: _shingle_hashes(t) for i, t in texts.items()}
    jac = np.array([jaccard(sh[a], sh[b]) for a, b in zip(pairs.id_a, pairs.id_b)])
    out = pairs.assign(jaccard=jac)
    return out[out.jaccard >= threshold].reset_index(drop=True)


# ------------------------------------------------------------------ simhash
def simhash64(texts: pa.Array | list[str | None]) -> np.ndarray:
    """64-bit SimHash per doc from byte-k-gram FNV hashes, vectorized over
    the batch: 64 masked popcount passes over the (N, grams) hash matrix.
    Gram multiplicity weights the sign sums (standard weighted SimHash)."""
    from ..core.hashing import gram_hash_matrix
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array([t if t is not None else "" for t in texts])
    grams, valid = gram_hash_matrix(texts, SHINGLE_K)
    n = len(grams)
    n_valid = valid.sum(axis=1).astype(np.int64)
    # all-short docs: one sentinel gram
    none_valid = n_valid == 0
    if none_valid.any():
        grams = grams.copy(); valid = valid.copy()
        grams[none_valid, 0] = np.uint64(0xDEADBEEF)
        valid[none_valid, 0] = True
        n_valid = valid.sum(axis=1).astype(np.int64)
    out = np.zeros(n, dtype=np.uint64)
    one = np.uint64(1)
    for b in range(64):
        cnt = ((grams >> np.uint64(b)) & one).astype(np.int64)
        cnt = np.where(valid, cnt, 0).sum(axis=1)
        out |= (np.uint64(1) << np.uint64(b)) * (2 * cnt > n_valid).astype(np.uint64)
    return out


def simhash_batch(b: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    sh = simhash64(b[text_col])
    return pa.table({id_col: b[id_col], "simhash": pa.array(sh.view(np.int64))})


def simhash_dup_pairs(ds: ray.data.Dataset, max_hamming: int = 3,
                      id_col: str = "doc_id", text_col: str = "text") -> pd.DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, via 16-bit-chunk
    bucketing (pigeonhole: ≤3 differing bits ⇒ ≥1 of 4 chunks equal)."""
    sigs = ds.map_batches(lambda b: simhash_batch(b, id_col, text_col),
                          batch_format="pyarrow", batch_size=4096)

    def explode(b: pa.Table) -> pa.Table:
        s = b["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        chunks, cids, sims = [], [], []
        for c in range(4):
            chunk = ((s >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            chunks.append(c * 65536 + chunk)  # (chunk_idx, value) packed
            cids.append(ids)
            sims.append(s.view(np.int64))
        return pa.table({"chunk_key": pa.array(np.concatenate(chunks)),
                         id_col: pa.array(np.concatenate(cids)),
                         "simhash": pa.array(np.concatenate(sims))})

    # hot-bucket filter: native count-aggregate finds chunk buckets with ≥2
    # members (rare), then one vectorized pandas pass enumerates pairs —
    # no per-bucket Python (the same pattern as minhash_candidate_pairs).
    from .agg import auto_partitions, partial_group_sums

    emitted = sigs.map_batches(explode, batch_format="pyarrow").materialize()
    sizes = (emitted.map_batches(
                 lambda b: partial_group_sums(b, ["chunk_key"], (), count_name="n"),
                 batch_format="pyarrow", zero_copy_batch=True)
             .repartition(auto_partitions())
             .groupby("chunk_key").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    hot = sizes[sizes.n >= 2].chunk_key.to_numpy()
    empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                          "id_b": pd.Series([], dtype=np.int64),
                          "hamming": pd.Series([], dtype=np.int64)})
    if len(hot) == 0:
        return empty
    hot_set = pa.array(hot, pa.int64())
    rows = emitted.map_batches(
        lambda b: b.filter(pc.is_in(b["chunk_key"], value_set=hot_set)),
        batch_format="pyarrow").to_pandas()
    rows = rows.sort_values(["chunk_key", id_col])
    out_a, out_b, out_h = [], [], []
    for _ck, g in rows.groupby("chunk_key", sort=False):
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            continue
        sh = g["simhash"].to_numpy().view(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        x = sh[ii] ^ sh[jj]
        # vectorized popcount via uint8 view + bitcount table
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
        out_a.append(ids[ii]); out_b.append(ids[jj]); out_h.append(ham.astype(np.int64))
    if not out_a:
        return empty
    pairs = pd.DataFrame({"id_a": np.concatenate(out_a),
                          "id_b": np.concatenate(out_b),
                          "hamming": np.concatenate(out_h)})
    pairs = pairs[pairs.hamming <= max_hamming]
    return (pairs.drop_duplicates(["id_a", "id_b"])
                 .sort_values(["id_a", "id_b"]).reset_index(drop=True))
