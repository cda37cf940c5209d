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
    """Distinct char-k-gram FNV hashes of one document (uint64)."""
    if text is None or len(text) < SHINGLE_K:
        return np.array([0xDEADBEEF], dtype=np.uint64)
    grams = [text[i:i + SHINGLE_K] for i in range(len(text) - SHINGLE_K + 1)]
    return np.unique(fnv1a64(pa.array(grams)))


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


def _minhash_batch(b: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Per doc: emit LSH_BANDS rows (band_id, band_hash, id)."""
    ids = b[id_col].to_numpy(zero_copy_only=False)
    texts = b[text_col].to_pylist()
    out_band, out_hash, out_id = [], [], []
    for i, t in enumerate(texts):
        sig = minhash_signature(_shingle_hashes(t))
        keys = band_keys(sig)
        out_band.append(np.arange(LSH_BANDS, dtype=np.int64))
        out_hash.append(keys.astype(np.int64))  # reinterpret for arrow int64
        out_id.append(np.full(LSH_BANDS, ids[i], np.int64))
    return pa.table({
        "band_id": pa.array(np.concatenate(out_band)),
        "band_hash": pa.array(np.concatenate(out_hash).view(np.int64)),
        id_col: pa.array(np.concatenate(out_id)),
    })


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def minhash_candidate_pairs(ds: ray.data.Dataset, id_col: str = "doc_id",
                            text_col: str = "text") -> ray.data.Dataset:
    """LSH candidate pairs: ids sharing any (band_id, band_hash) bucket."""
    emitted = ds.map_batches(
        lambda b: _minhash_batch(b, id_col, text_col),
        batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(np.int64)
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})

    cand = emitted.groupby(["band_id", "band_hash"]).map_groups(
        pairs_of_bucket, batch_format="pandas")
    # dedup pairs found in multiple bands
    return cand.groupby(["id_a", "id_b"]).count().select_columns(["id_a", "id_b"])


def minhash_dedup_pairs(ds: ray.data.Dataset, threshold: float = 0.8,
                        id_col: str = "doc_id", text_col: str = "text") -> pd.DataFrame:
    """Near-dup pairs with exact-verified shingle Jaccard ≥ threshold.

    Candidate verification pulls the candidate docs' texts via a filtered
    pass over the source (candidates ≪ corpus assumed; at 100 TB this is a
    broadcast-semi-join + per-pair verify inside map_groups).
    """
    pairs = minhash_candidate_pairs(ds, id_col, text_col).to_pandas()
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
def simhash64(texts: list[str | None]) -> np.ndarray:
    """64-bit SimHash per doc from token FNV hashes (unweighted signs)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    bitcols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    for i, t in enumerate(texts):
        toks = [t[j:j + SHINGLE_K] for j in range(0, max(len(t or "") - SHINGLE_K + 1, 1))] or [""]
        h = np.unique(fnv1a64(pa.array(toks)))
        bits = (h[:, None] & bitcols[None, :]) != 0  # (tokens, 64)
        score = bits.sum(axis=0) * 2 - len(h)  # +1/-1 sums
        out[i] = np.sum(bitcols[score > 0], dtype=np.uint64)
    return out


def simhash_batch(b: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    sh = simhash64(b[text_col].to_pylist())
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

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().view(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        ii, jj = np.triu_indices(len(ids), k=1)
        ham = np.array([bin(int(sh[i] ^ sh[j])).count("1") for i, j in zip(ii, jj)],
                       dtype=np.int64)
        return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj], "hamming": ham})

    cand = (sigs.map_batches(explode, batch_format="pyarrow")
                .groupby("chunk_key").map_groups(pairs_of_bucket, batch_format="pandas"))
    pairs = cand.to_pandas()
    pairs = pairs[pairs.hamming <= max_hamming]
    return (pairs.drop_duplicates(["id_a", "id_b"])
                 .sort_values(["id_a", "id_b"]).reset_index(drop=True))
