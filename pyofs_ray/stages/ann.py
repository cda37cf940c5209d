"""Similarity search over the embeddings table (`list<float>` column).

Brute-force cosine top-k is the exact baseline — one numpy matmul per batch
against a broadcast query matrix (the `ray.put` small-side pattern). The
scale path is random-hyperplane LSH bucketing: H fixed deterministic
hyperplanes → sign-bit bucket per vector; a query probes its own bucket plus
all Hamming-1 neighbors (multi-probe), then ranks candidates exactly.
Recall is probabilistic, precision exact (candidates re-ranked by true
cosine); the oracle-checked output carries ranks only — float similarity
values are reduction-order-dependent and are excluded from exact compare
(ranks are stable because random embeddings have similarity gaps ≫ ulp).

PyOFS lineage: the nearest/bilinear point-sample interpolation (SURVEY.md
J3/J4, `wcofs.py:1791-1827`, `particle_contour.py:249-298`) is the same
"find closest reference vectors, weighted-combine" shape, lifted from 2-D
grids to d-dim embeddings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..core.hashing import splitmix64


def _embedding_matrix(b: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = b[col].combine_chunks() if isinstance(b[col], pa.ChunkedArray) else b[col]
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.sqrt((m * m).sum(axis=1, keepdims=True))
    norm[norm == 0] = 1.0
    return m / norm



def _finish_topk(sims: ray.data.Dataset, k: int, exclude_self: bool,
                 final_mode: str = "small") -> pd.DataFrame:
    """Shared exact finish for per-batch partial top-k candidate streams.

    ``"small"`` (default): a per-partition combine keeps only Q×(k+1) rows
    per partition, so the final coalesced pass is bounded by
    partitions×Q×(k+1) — never by the batch count (two all-to-alls of
    near-empty partitions cost seconds of fixed wall in Ray 2.49; see
    CLAUDE.md small-input rule). ``"grouped"``: key-sharded groupby finish
    for huge query sets."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # no self-exclusion yet: keep k+1 so the final pass can exclude
        df = df.sort_values(["query_id", "sim", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("query_id", as_index=False, sort=False).head(k + 1)

    def topk_all(df: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            df = df[df.vec_id != df.query_id]
        df = df.sort_values(["query_id", "sim", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("query_id", as_index=False, sort=False).head(k)
        df = df.assign(rank=df.groupby("query_id", sort=False).cumcount() + 1)
        return df[["query_id", "vec_id", "rank"]]

    from .agg import auto_partitions

    if final_mode == "grouped":
        return (sims.repartition(auto_partitions())
                    .groupby("query_id")
                    .map_groups(topk_all, batch_format="pandas").to_pandas())
    comb = sims.repartition(auto_partitions()).map_batches(
        combine, batch_format="pandas")
    return (comb.repartition(1)
                .map_batches(topk_all, batch_format="pandas", batch_size=None)
                .to_pandas())


class BruteForceTopK:
    """Actor: per batch, cosine top-k of every base vector against the
    broadcast query matrix → rows (query_id, vec_id, rank)."""

    def __init__(self, queries_ref, k: int = 5):
        qtab = ray.get(queries_ref)
        self.qids = qtab["vec_id"].to_numpy(zero_copy_only=False)
        self.qmat = _normalize(_embedding_matrix(qtab))
        self.k = k

    def __call__(self, b: pa.Table) -> pa.Table:
        vids = b["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize(_embedding_matrix(b))
        sims = m @ self.qmat.T  # (batch, Q)
        # partial top-k per query WITHIN the batch: only Q×k rows leave each
        # batch (k+ties-exact via (-sim, vec_id) lexsort), not batch×Q.
        k = min(self.k + 1, len(vids))  # +1 headroom for self-exclusion later
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            order = np.lexsort((vids, -sims[:, qi]))[:k]
            out_q.append(np.full(len(order), self.qids[qi], np.int64))
            out_v.append(vids[order])
            out_s.append(sims[order, qi])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        })


def ann_topk_brute(ds: ray.data.Dataset, queries: pa.Table, k: int = 5,
                   exclude_self: bool = True) -> pd.DataFrame:
    """Exact top-k (per query) over the full base set.

    Per-batch sims stream into a per-query top-k reduce on the driver —
    the result is Q×k rows (tiny); the base set is never materialized.
    """
    # stateless tasks over the broadcast query matrix (CLAUDE.md: cheap
    # broadcast-side state wants memoized tasks, not an actor pool whose
    # spin-up costs ~1s per pipeline); workers cache the ray.get.
    ref = ray.put(queries)

    def probe(b: pa.Table) -> pa.Table:
        from ..core.memo import memo_broadcast
        return memo_broadcast(f"ann_brute:{ref.hex()}:{k}",
                              lambda: BruteForceTopK(ref, k))(b)

    sims = ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    return _finish_topk(sims, k, exclude_self)


# ---------------------------------------------------------------- LSH path
# Banded sign-LSH (OR-of-ANDs): B bands × r deterministic hyperplanes; a
# vector's key in band b packs that band's r sign bits (band id in the high
# bits — one flat int64 key space). Two vectors are candidates iff they
# share any band key. Bucket count per band is 2^r, so bucket population
# shrinks as r rises; pair recall at angle θ is 1-(1-(1-θ/π)^r)^B — the
# standard banded guarantee. Near-dup detection (θ≈0) uses deep bands
# (r=16: recall→1, buckets 16×65536 per band-space and corpus-fractional);
# top-k search over low-similarity corpora needs shallow bands (r=6) and
# remains an explicit recall/scan trade — IVF is the scale path there.
DUP_BANDS, DUP_PLANES_PER_BAND = 16, 16
TOPK_BANDS, TOPK_PLANES_PER_BAND = 24, 6


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from splitmix64 bits."""
    u = splitmix64(np.arange(n_planes * dim, dtype=np.uint64) + np.uint64(0xABCDEF))
    # uniform in [-1, 1)
    vals = (u.astype(np.float64) / 2**64) * 2 - 1
    return vals.reshape(n_planes, dim)


def _band_keys(m: np.ndarray, planes: np.ndarray, num_bands: int,
               planes_per_band: int) -> np.ndarray:
    """(n, B) int64 band keys: sign bits of band b packed in the low
    ``planes_per_band`` bits, band id just above them (injective for any
    band depth up to 57 bits; band id ≤ 63 needs 6 more)."""
    bits = (m @ planes.T) > 0  # (n, B*r)
    keys = np.zeros((len(m), num_bands), dtype=np.int64)
    for b in range(num_bands):
        for j in range(planes_per_band):
            keys[:, b] |= bits[:, b * planes_per_band + j].astype(np.int64) << j
    shift = max(24, planes_per_band)
    keys |= (np.arange(num_bands, dtype=np.int64) << shift)[None, :]
    return keys


# Corpus-scaled band depth: expected random-pair collisions per band key
# are ≈ N·2^-r, so candidates per query ≈ B·N·2^-r. Deepen r with the
# corpus so that stays ≈``target`` — at fixture scale this resolves to the
# historical r=6 (same keys, same results); at 10⁹ vectors r≈23 keeps the
# scanned fraction ~10⁻⁵ instead of the fixed-r 31%. The recall/scan trade
# is explicit: genuine top-k neighbors at angle θ survive a band with
# probability (1-θ/π)^r, so deep bands suit near-dup-ish queries; for
# far-neighbor recall at scale, IVF is the better path.
def topk_planes_for(corpus_rows: int, num_bands: int = 24,
                    target: int = 2048) -> int:
    n = max(int(corpus_rows), 1)
    r = int(np.ceil(np.log2(max(num_bands * n / target, 2.0))))
    return int(np.clip(r, 6, 32))


# ----------------------------------------------------------------- IVF path
IVF_LISTS = 16
IVF_LLOYD_ITERS = 3


def ivf_lists_for(corpus_rows: int) -> int:
    """nlist ~ √N rounded up to a power of two (min ``IVF_LISTS``): keeps
    per-list population ~√N, so a fixed nprobe scans a ~nprobe/√N fraction
    of the corpus — shrinking as the corpus grows."""
    n = max(int(corpus_rows), 1)
    return int(np.clip(1 << int(np.ceil(np.log2(max(np.sqrt(n), 1.0)))),
                       IVF_LISTS, 1 << 16))


IVF_DUP_LIST_TARGET = 16  # target per-list population for dup-pair bucketing


def ivf_dup_lists_for(corpus_rows: int) -> int:
    """nlist for NEAR-DUP bucketing: ~N/16 rounded to a power of two.

    Different sizing than top-k search (`ivf_lists_for`, ~√N): a search
    probe scans its nprobe lists once per QUERY, so per-list ~√N balances
    list count against list size; dup-pair bucketing ENUMERATES C(size, 2)
    pairs inside every list, so per-list population must stay O(1) for the
    candidate count to stay linear in N — √N-sized lists make it N^1.5
    (measured: 2k dup-free vectors at nlist=64 emit ~120k candidate pairs,
    pushing the verify over the broadcast threshold into distributed
    joins; at per-list ~16 the same corpus emits ~60k and stays on the
    broadcast path). Past the 2¹⁶ cap the hierarchical two-level IVF named
    in `embedding_dup_pairs_ivf` is the extension."""
    n = max(int(corpus_rows), 1)
    return int(np.clip(1 << int(np.ceil(np.log2(
        max(n / IVF_DUP_LIST_TARGET, 1.0)))), IVF_LISTS, 1 << 16))


def _chunked_argmax(m: np.ndarray, cents: np.ndarray,
                    chunk: int = 1024) -> np.ndarray:
    """argmax(m @ cents.T, axis=1) without materializing the full
    (rows × nlist) similarity matrix — at nlist = 2¹⁶ and a large train
    sample that matrix is tens of GB; chunking bounds it at
    chunk × nlist × 8 bytes (~0.5 GB at the caps)."""
    out = np.empty(len(m), np.int64)
    for s in range(0, len(m), chunk):
        out[s:s + chunk] = np.argmax(m[s:s + chunk] @ cents.T, axis=1)
    return out


def ivf_centroids(sample: np.ndarray, nlist: int = IVF_LISTS,
                  iters: int = IVF_LLOYD_ITERS) -> np.ndarray:
    """Deterministic IVF coarse centroids: seed with the first ``nlist``
    sample vectors, then a few Lloyd iterations (cosine/spherical k-means:
    re-normalize means; chunked assignment bounds memory at large nlist).
    No RNG — same input → same index."""
    m = _normalize(sample.astype(np.float64))
    cents = m[:nlist].copy()
    for _ in range(iters):
        assign = _chunked_argmax(m, cents)
        # vectorized per-cluster means: sum rows by assignment bucket
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, m)
        counts = np.bincount(assign, minlength=len(cents)).astype(np.float64)
        nonzero = counts > 0
        cents[nonzero] = sums[nonzero] / counts[nonzero, None]
        cents = _normalize(cents)
    return cents


def _ivf_train_matrix(ds: ray.data.Dataset, corpus_rows: int,
                      train_target: int, id_col: str = "vec_id") -> np.ndarray:
    """Unbiased deterministic training sample: a splitmix64 hash filter over
    the id column (`stages.sample.hash_sample`) — every shard contributes
    proportionally, unlike a ``limit()`` prefix, which at 100 TB is whatever
    block(s) the first file yielded. Rate is sized for ~1.5×``train_target``
    rows; small corpora fall through to the full set."""
    from .sample import hash_sample

    rate = min(1.0, 1.5 * train_target / max(corpus_rows, 1))
    sub = ds if rate >= 1.0 else hash_sample(ds, id_col, rate, salt=0xC0FFEE)
    df = sub.limit(4 * train_target).to_pandas()
    if len(df) < train_target and rate < 1.0:  # hint was wrong/stale
        df = ds.limit(train_target).to_pandas()
    return np.stack(df.embedding.to_numpy())


def ann_topk_ivf(ds: ray.data.Dataset, queries: pa.Table, k: int = 5,
                 nprobe: int = 4, train_sample: int | None = None,
                 exclude_self: bool = True, nlist: int | None = None,
                 corpus_rows: int | None = None) -> pd.DataFrame:
    """IVF approximate top-k: vectors partition into ``nlist`` coarse
    cells (nearest centroid); each query scans only its ``nprobe`` nearest
    lists, candidates ranked by exact cosine. ``nlist`` defaults to
    ``ivf_lists_for(N)`` (~√N), so the scanned fraction ≈ nprobe/√N shrinks
    as the corpus grows. Centroids train once on a deterministic *hash*
    sample (unbiased across shards — never a block prefix) and broadcast.
    Recall grows with nprobe (= 1.0 at nprobe=nlist)."""
    if corpus_rows is None:
        # NOTE: count() on a transformed Dataset executes a full pass —
        # callers should pass corpus_rows from parquet metadata
        corpus_rows = ds.count()
    if nlist is None:
        nlist = ivf_lists_for(corpus_rows)
    nprobe = min(nprobe, nlist)
    if train_sample is None:
        train_sample = max(2048, 32 * nlist)
    train = _ivf_train_matrix(ds, corpus_rows, train_sample)
    cents = ivf_centroids(train, nlist=min(nlist, len(train)))
    qmat = _normalize(_embedding_matrix(queries))
    qids = queries["vec_id"].to_numpy(zero_copy_only=False)
    qlists = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    list_to_q: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for li in qlists[qi]:
            list_to_q.setdefault(int(li), []).append(qi)
    payload_ref = ray.put((cents, list_to_q, qmat, qids))

    class Probe:
        def __init__(self):
            self.cents, self.list_to_q, self.qmat, self.qids = ray.get(payload_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(b))
            vids = b["vec_id"].to_numpy(zero_copy_only=False)
            assign = np.argmax(m @ self.cents.T, axis=1)
            out_q, out_v, out_s = [], [], []
            for li in np.unique(assign):
                qis = self.list_to_q.get(int(li))
                if not qis:
                    continue
                sel = assign == li
                sims = m[sel] @ self.qmat[qis].T  # (n_sel, n_q)
                svids = vids[sel]
                for col, qi in enumerate(qis):
                    # partial top-k: only k+1 rows per (query, batch, list)
                    order = np.lexsort((svids, -sims[:, col]))[:k + 1]
                    out_q.append(np.full(len(order), self.qids[qi], np.int64))
                    out_v.append(svids[order])
                    out_s.append(sims[order, col])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                             "vec_id": pa.array(np.concatenate(out_v)),
                             "sim": pa.array(np.concatenate(out_s))})

    def probe_fn(b: pa.Table) -> pa.Table:
        from ..core.memo import memo_broadcast
        # the prepared probe (deserialized payload) memoizes per worker —
        # plasma caches bytes, not Python objects
        return memo_broadcast(f"ann_probe:{payload_ref.hex()}", Probe)(b)

    sims = ds.map_batches(probe_fn, batch_format="pyarrow",
                          zero_copy_batch=True)
    return _finish_topk(sims, k, exclude_self)


def embedding_dup_pairs(ds: ray.data.Dataset, threshold: float = 0.95,
                        dim: int | None = None, num_bands: int = DUP_BANDS,
                        planes_per_band: int = DUP_PLANES_PER_BAND,
                        force_distributed: bool = False,
                        spill: bool | None = None,
                        docs_hint: int | None = None) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    Banded sign-LSH: each vector emits ``num_bands`` (band_key, id) rows —
    embeddings are NOT shuffled; only ids travel through the bucket
    exchange. The shared hot-bucket machinery (`stages/pairs.py`) filters
    ≥2-member buckets distributed and enumerates pairs in per-bucket
    ``map_groups``; embeddings join back onto the (pair-bounded) candidate
    set as packed binary blobs for the exact cosine verify — precision
    exact, recall 1-(1-(1-θ/π)^r)^B (→1 for genuine near-dups).
    """
    from .pairs import attach_candidate_signatures, candidate_pairs

    if dim is None:
        first = ds.take_batch(1, batch_format="pyarrow")
        dim = len(first["embedding"][0].as_py())
    planes = _hyperplanes(dim, num_bands * planes_per_band)

    def bucketize(b: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(b))
        keys = _band_keys(m, planes, num_bands, planes_per_band)  # (n, B)
        vids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bkey": pa.array(keys.ravel()),
                         "vec_id": pa.array(np.repeat(vids, num_bands))})

    emitted = ds.map_batches(bucketize, batch_format="pyarrow",
                             zero_copy_batch=True)
    cand = candidate_pairs(
        emitted, key="bkey", id_col="vec_id",
        small_rows=0 if force_distributed else None, spill=spill,
        rows_hint=docs_hint * num_bands if docs_hint else None)

    # no materialize here: _verify_cosine_pairs chains its bucket-dup drop
    # onto the candidate plan and materializes ONCE after it
    return _verify_cosine_pairs(cand, ds, threshold, force_distributed)


def _verify_cosine_pairs(cand, ds: ray.data.Dataset, threshold: float,
                         force_distributed: bool) -> pd.DataFrame:
    """Shared exact-cosine verify tail for the embedding near-dup family:
    join embeddings (packed blobs) back onto the pair-bounded candidate
    set, verify cos ≥ threshold, dedupe bucket repeats driver-side
    (result-bounded)."""
    from .pairs import attach_candidate_signatures

    def drop_batch_dupes(b: pa.Table) -> pa.Table:
        # bucket repeats (a pair sharing several probed cells/bands) are
        # dropped per batch BEFORE embeddings attach — for the coalesced
        # small path this is one batch, i.e. a full dedupe; duplicates
        # that survive across batches on the large path fall to the final
        # result-bounded drop_duplicates
        a = b["id_a"].to_numpy(zero_copy_only=False)
        bb = b["id_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, a))
        a_s, b_s = a[order], bb[order]
        keep = np.empty(len(a_s), bool)
        if len(a_s):
            keep[0] = True
            keep[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        return pa.table({"id_a": pa.array(a_s[keep]),
                         "id_b": pa.array(b_s[keep])})

    # materialize: attach consumes the candidate set several times (size
    # probe, id pull, the join itself) — left lazy, each consumption would
    # re-run the dedupe map
    cand = cand.map_batches(drop_batch_dupes, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                          "id_b": pd.Series([], dtype=np.int64),
                          "cosine": pd.Series([], dtype=float)})
    from .pairs import SMALL_PAIRS
    n_pairs = cand.count()  # free: cand is materialized
    if n_pairs == 0:
        return empty
    if not force_distributed and n_pairs <= SMALL_PAIRS:
        # SMALL path — pair set is driver-bounded by definition (the
        # function returns it to the driver anyway). ONE distributed pass
        # remains: the candidate-id semi-filter over the corpus; the
        # cosine itself runs vectorized on the bounded pulled set. This
        # replaces 4 near-empty plan executions (dedupe, id pull, sig
        # table, verify map) that cost ~1 s fixed wall each in Ray 2.49.
        pairs_df = cand.to_pandas()  # materialized: no plan re-execution
        ia_ = pairs_df["id_a"].to_numpy()
        ib_ = pairs_df["id_b"].to_numpy()
        need_ref = ray.put(pa.array(
            np.unique(np.concatenate([ia_, ib_])), pa.int64()))

        def filt(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            keep = pc.is_in(b["vec_id"], value_set=ray.get(need_ref))
            return b.filter(keep)

        sub = ds.map_batches(filt, batch_format="pyarrow").to_pandas()
        if sub.empty:
            # candidate ids entirely absent from the corpus: np.stack on a
            # zero-row column raises an opaque ValueError before rows_for
            # can raise its descriptive KeyError — raise it here instead
            raise KeyError(
                f"_verify_cosine_pairs: none of the candidate ids (e.g. "
                f"{np.unique(np.concatenate([ia_, ib_]))[:5]!r}) have a "
                "corpus row — candidate/corpus id spaces disagree")
        sid = sub["vec_id"].to_numpy()
        order = np.argsort(sid)
        sid_sorted = sid[order]
        mat = _normalize(np.stack(sub["embedding"].to_numpy())
                         .astype(np.float64))[order]

        def rows_for(want: np.ndarray) -> np.ndarray:
            idx = np.searchsorted(sid_sorted, want)
            ok = (idx < len(sid_sorted)) & (
                sid_sorted[np.minimum(idx, len(sid_sorted) - 1)] == want)
            if not ok.all():
                raise KeyError(
                    f"_verify_cosine_pairs: candidate id(s) "
                    f"{np.asarray(want)[~ok][:5]!r} missing from the corpus")
            return idx

        cos = np.einsum("ij,ij->i", mat[rows_for(ia_)], mat[rows_for(ib_)])
        out = pd.DataFrame({"id_a": ia_, "id_b": ib_, "cosine": cos})
        out = out.drop_duplicates(["id_a", "id_b"])  # cross-batch dupes
        return (out[out.cosine >= threshold]
                .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    def sig(b: pa.Table) -> pa.Table:
        m = _embedding_matrix(b)  # float64 rows → packed blobs
        return pa.table({"vec_id": b["vec_id"],
                         "emb": pa.array([m[i].tobytes() for i in range(len(m))],
                                         pa.binary())})

    paired = attach_candidate_signatures(
        cand, ds, "vec_id", sig, small_pairs=0)
    if paired is None:
        return empty

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=float)})
        # equal-width blobs → one frombuffer + reshape, batch-normalized
        # row dot products (no per-pair Python)
        ea, eb = df["emb_a"].to_numpy(), df["emb_b"].to_numpy()
        ma = np.frombuffer(b"".join(ea), dtype=np.float64).reshape(len(df), -1)
        mb = np.frombuffer(b"".join(eb), dtype=np.float64).reshape(len(df), -1)
        cos = np.einsum("ij,ij->i", _normalize(ma), _normalize(mb))
        return pd.DataFrame({"id_a": df["id_a"].to_numpy(),
                             "id_b": df["id_b"].to_numpy(), "cosine": cos})

    out = paired.map_batches(verify, batch_format="pandas").to_pandas()
    if out.empty:
        return empty
    out = out.drop_duplicates(["id_a", "id_b"])  # bucket dupes, result-bounded
    return (out[out.cosine >= threshold]
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def ann_topk_lsh(ds: ray.data.Dataset, queries: pa.Table, k: int = 5,
                 dim: int | None = None, exclude_self: bool = True,
                 num_bands: int = TOPK_BANDS,
                 planes_per_band: int | None = None,
                 corpus_rows: int | None = None) -> pd.DataFrame:
    """Banded-LSH approximate top-k: a base vector is a candidate for a
    query iff they share any band key (OR-of-ANDs — no Hamming multi-probe
    sweep of the key space). Candidates are scored by exact cosine with a
    per-batch partial top-k, so only Q×(k+1) rows leave each batch.

    ``planes_per_band`` defaults to ``topk_planes_for(N)`` — band depth
    grows with the corpus so the expected random-collision candidate count
    per query stays ~bounded instead of a fixed fraction of the corpus."""
    if planes_per_band is None:
        if corpus_rows is None:
            # NOTE: count() on a transformed Dataset executes a full pass —
            # callers should pass corpus_rows from parquet metadata
            corpus_rows = ds.count()
        planes_per_band = topk_planes_for(corpus_rows, num_bands)
    if dim is None:
        dim = len(queries["embedding"][0].as_py())
    planes = _hyperplanes(dim, num_bands * planes_per_band)
    qmat = _normalize(_embedding_matrix(queries))
    qids = queries["vec_id"].to_numpy(zero_copy_only=False)
    qkeys = _band_keys(qmat, planes, num_bands, planes_per_band)  # (Q, B)
    band_maps: list[dict[int, list[int]]] = [dict() for _ in range(num_bands)]
    for qi in range(len(qids)):
        for b in range(num_bands):
            band_maps[b].setdefault(int(qkeys[qi, b]), []).append(qi)
    probe_ref = ray.put((planes, band_maps, qmat, qids))

    class Probe:
        def __init__(self):
            self.planes, self.band_maps, self.qmat, self.qids = ray.get(probe_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(b))
            keys = _band_keys(m, self.planes, num_bands, planes_per_band)
            vids = b["vec_id"].to_numpy(zero_copy_only=False)
            nq = len(self.qids)
            cand = np.zeros((len(m), nq), dtype=bool)
            for band in range(num_bands):
                col = keys[:, band]
                for qkey, qis in self.band_maps[band].items():
                    sel = col == qkey
                    if sel.any():
                        cand[np.ix_(sel, np.asarray(qis))] = True
            out_q, out_v, out_s = [], [], []
            for qi in range(nq):
                sel = cand[:, qi]
                if not sel.any():
                    continue
                sims = m[sel] @ self.qmat[qi]
                svids = vids[sel]
                order = np.lexsort((svids, -sims))[:k + 1]  # partial top-k
                out_q.append(np.full(len(order), self.qids[qi], np.int64))
                out_v.append(svids[order])
                out_s.append(sims[order])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                             "vec_id": pa.array(np.concatenate(out_v)),
                             "sim": pa.array(np.concatenate(out_s))})

    def probe_fn(b: pa.Table) -> pa.Table:
        from ..core.memo import memo_broadcast
        # the prepared probe (deserialized payload) memoizes per worker —
        # plasma caches bytes, not Python objects
        return memo_broadcast(f"ann_probe:{probe_ref.hex()}", Probe)(b)

    sims = ds.map_batches(probe_fn, batch_format="pyarrow",
                          zero_copy_batch=True)
    return _finish_topk(sims, k, exclude_self)


def embedding_dup_pairs_ivf(ds: ray.data.Dataset, threshold: float = 0.95,
                            assign_probes: int = 2,
                            nlist: int | None = None,
                            corpus_rows: int | None = None,
                            force_distributed: bool = False,
                            spill: bool | None = None) -> pd.DataFrame:
    """IVF-bucketed embedding near-dup pairs — a data-adaptive bucketing
    next to the banded sign-LSH `embedding_dup_pairs`: each vector emits
    its ``assign_probes`` nearest coarse-centroid ids as bucket keys and
    everything downstream is the SHARED candidate machinery
    (`stages/pairs.py`): ids-only shuffle (embeddings never travel through
    the exchange), distributed ≥2-member filter, `max_bucket` truncation
    of hot lists (a viral dup cluster concentrates in one centroid — the
    same bounded-bucket policy as the sketch paths), parquet-spill above
    the size threshold, then the exact-cosine verify over the
    pair-bounded candidates.

    ``nlist`` defaults to `ivf_dup_lists_for` (~N/16, 2¹⁶ cap — per-list
    population O(1), NOT the √N search sizing; see its docstring) — centroid
    training stays driver-feasible (chunked Lloyd assignment in
    `ivf_centroids`); a hierarchical two-level IVF is the named extension
    beyond the cap. Recall is data-dependent (boundary pairs can split
    across lists even at 2 probes); the injected-dup pytest is the
    recall evidence — the checker's gate vs the LSH pairs is vacuous on
    the dup-free fixture (baseline empty ⇒ recall 1.0 by convention).
    """
    from .pairs import candidate_pairs

    if corpus_rows is None:
        corpus_rows = ds.count()
    if nlist is None:
        nlist = ivf_dup_lists_for(corpus_rows)
    train = _ivf_train_matrix(ds, corpus_rows,
                              min(max(2048, 8 * nlist), 1 << 18))
    cents = ivf_centroids(train, nlist=min(nlist, len(train)))
    cents_ref = ray.put(cents)

    def bucketize(b: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _normalize(_embedding_matrix(b))
        vids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = min(assign_probes, len(c))
        s = m @ c.T
        if p < s.shape[1]:
            top = np.argpartition(-s, p - 1, axis=1)[:, :p]  # unordered ok
        else:
            top = np.broadcast_to(np.arange(s.shape[1]),
                                  (len(m), s.shape[1])).copy()
        return pa.table({"bkey": pa.array(top.astype(np.int64).ravel()),
                         "vec_id": pa.array(np.repeat(vids, p))})

    emitted = ds.map_batches(bucketize, batch_format="pyarrow",
                             zero_copy_batch=True)
    cand = candidate_pairs(
        emitted, key="bkey", id_col="vec_id",
        small_rows=0 if force_distributed else None, spill=spill,
        rows_hint=corpus_rows * assign_probes)
    # no materialize here: the verify dedupes then materializes once
    return _verify_cosine_pairs(cand, ds, threshold, force_distributed)


def embedding_dim_ranges(ds: ray.data.Dataset,
                         num_buckets: int | None = None
                         ) -> ray.data.Dataset:
    """Per-dimension value ranges over an embedding column — the
    normalization / feature-drift audit (are any dimensions saturated,
    constant, or out of the expected band?).

    min/max are SELECTIONS of existing float32 values (no arithmetic),
    so the result is bit-identical to the DuckDB twin. Each batch
    collapses to D partial rows (D = embedding width) before the single
    dim-keyed exchange — exchange volume is D × blocks, independent of
    row count."""
    from .agg import bucketed_group_agg

    def partials(b: pa.Table) -> pa.Table:
        arr = b["embedding"].combine_chunks() \
            if isinstance(b["embedding"], pa.ChunkedArray) else b["embedding"]
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        m = flat.reshape(len(arr), -1)  # keep float32: selection only
        d = m.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "vmin": pa.array(m.min(axis=0)),
            "vmax": pa.array(m.max(axis=0)),
            "n_vals": pa.array(np.full(d, len(arr), np.int64)),
        })

    return bucketed_group_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["dim"],
        [("vmin", "min", "vmin"), ("vmax", "max", "vmax"),
         ("n_vals", "sum", "n_vals")],
        num_buckets=num_buckets,
        coalesce=True)


EMBEDDING_DIM_RANGES_SQL = """
WITH flat AS (
  SELECT UNNEST(embedding) AS v,
         UNNEST(range(1, len(embedding) + 1)) AS dim
  FROM embeddings
)
SELECT dim, MIN(v) AS vmin, MAX(v) AS vmax,
       CAST(COUNT(*) AS BIGINT) AS n_vals
FROM flat GROUP BY dim
"""


COV_SCALE = 10**6  # embedding quantization for exact covariance sums


def embedding_second_moment(ds: ray.data.Dataset,
                            scale: int = COV_SCALE) -> ray.data.Dataset:
    """Exact second-moment matrix of the embedding column — the PCA /
    whitening precursor: Σ = Qᵀ Q over ``q = round(e · scale)`` int64
    quantized values, upper triangle as (i, j, qq_sum) rows.

    Per block: ONE int64 matmul (D × D × rows, no BLAS round-off) →
    D(D+1)/2 partial rows; the finish is coalesced (the key space is the
    fixed D² matrix, not data) and sums in PYTHON ints — a silent int64
    wrap cannot happen; if the exact sum leaves int64 the kernel raises
    (the DuckDB twin runs the same sums in HUGEINT).

    Quantization uses round-half-away (``half_towards_infinity``), the
    DuckDB ROUND semantics — same convention as ``relational._cents``."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        arr = b["embedding"].combine_chunks() \
            if isinstance(b["embedding"], pa.ChunkedArray) else b["embedding"]
        flat = arr.flatten()
        q = pc.cast(pc.round(pc.multiply(pc.cast(flat, pa.float64()),
                                         float(scale)),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        n = len(arr)
        d = len(q) // n if n else 0
        if n and len(q) != n * d:
            raise ValueError("ragged embedding lists")
        Q = q.reshape(n, d)
        C = Q.T @ Q
        iu = np.triu_indices(d)
        return pa.table({"i": pa.array(iu[0].astype(np.int64)),
                         "j": pa.array(iu[1].astype(np.int64)),
                         "qq_sum": pa.array(C[iu])})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["qq_sum"] = df["qq_sum"].astype(object)  # exact Python-int sums
        g = df.groupby(["i", "j"], as_index=False)["qq_sum"].sum()
        if len(g) and max(abs(int(x)) for x in g.qq_sum) >= 2**63:
            raise OverflowError("second-moment sum exceeds int64 — raise "
                                "the quantization scale down or shard")
        return pa.table({"i": pa.array(g.i.astype(np.int64)),
                         "j": pa.array(g.j.astype(np.int64)),
                         "qq_sum": pa.array(g.qq_sum.astype(np.int64))})

    return partials.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def embedding_second_moment_sql(dim: int = 64, scale: int = COV_SCALE,
                                table: str = "embeddings") -> str:
    return f"""
WITH q AS (
  SELECT vec_id, CAST(t.i AS BIGINT) AS i,
         CAST(ROUND(CAST(embedding[t.i + 1] AS DOUBLE) * {scale})
              AS BIGINT) AS qv
  FROM {table} CROSS JOIN generate_series(0, {dim - 1}) t(i)
)
SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS qq_sum
FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY 1, 2"""


def _global_dim_ranges(ds: ray.data.Dataset) -> tuple[np.ndarray,
                                                      np.ndarray]:
    """Exact global per-dim (lo, hi) as float64 on the DRIVER: per-block
    D-row partial min/max (selection only — float32 values untouched)
    merged with np.minimum/maximum.at — D ≤ 2k keys is the documented
    no-Ray-groupby finish shape. Shared by `embedding_quantize` and
    `ann_topk_quantized`."""
    import ray as _ray

    def range_partials(b: pa.Table) -> pa.Table:
        arr = b["embedding"].combine_chunks() \
            if isinstance(b["embedding"], pa.ChunkedArray) else b["embedding"]
        m = arr.flatten().to_numpy(zero_copy_only=False) \
            .reshape(len(arr), -1)
        d = m.shape[1]
        return pa.table({"dim": pa.array(np.arange(d, dtype=np.int64)),
                         "vmin": pa.array(m.min(axis=0)),
                         "vmax": pa.array(m.max(axis=0))})

    pt = pa.concat_tables(
        [_ray.get(r) for r in ds.select_columns(["embedding"])
         .map_batches(range_partials, batch_format="pyarrow",
                      zero_copy_batch=True).to_arrow_refs()])
    dims = pt["dim"].to_numpy(zero_copy_only=False)
    d_all = int(dims.max()) + 1
    lo = np.full(d_all, np.inf, np.float64)
    hi = np.full(d_all, -np.inf, np.float64)
    np.minimum.at(lo, dims,
                  pt["vmin"].to_numpy(zero_copy_only=False).astype(np.float64))
    np.maximum.at(hi, dims,
                  pt["vmax"].to_numpy(zero_copy_only=False).astype(np.float64))
    return lo, hi


def embedding_quantize(ds: ray.data.Dataset,
                       levels: int = 255) -> ray.data.Dataset:
    """Scalar (per-dimension min/max) int8 quantization of the embedding
    column — the storage/serving compression step before an ANN index
    ships to disk: ``code = floor((v - lo_d) * levels / (hi_d - lo_d)
    + 0.5)``, constant dimensions code to 0.

    Two passes by semantics (the range is global): (1) per-block
    partial min/max rows (D rows per block, independent of row count)
    merged ON THE DRIVER — D ≤ 2k keys is the documented
    no-Ray-groupby finish shape — and broadcast once via ``ray.put``;
    (2) one streaming codes scan. Long-form output (vec_id, dim, code)
    IS the quantized store. Every arithmetic step is a single IEEE
    double op in the same order as the DuckDB twin, so codes are
    bit-exact."""
    import ray as _ray

    lo, hi = _global_dim_ranges(ds)
    rng_ref = _ray.put((lo, hi))

    def codes(b: pa.Table) -> pa.Table:
        lo_, hi_ = _ray.get(rng_ref)
        arr = b["embedding"].combine_chunks() \
            if isinstance(b["embedding"], pa.ChunkedArray) else b["embedding"]
        n = len(arr)
        m = arr.flatten().to_numpy(zero_copy_only=False) \
            .reshape(n, -1).astype(np.float64)
        d = m.shape[1]
        denom = hi_ - lo_
        ok = denom > 0
        c = np.floor((m - lo_) * float(levels) / np.where(ok, denom, 1.0)
                     + 0.5).astype(np.int64)
        c[:, ~ok] = 0
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
            "code": pa.array(c.ravel())})

    return ds.map_batches(codes, batch_format="pyarrow",
                          zero_copy_batch=True)


def embedding_quantize_sql(levels: int = 255,
                           table: str = "embeddings") -> str:
    return f"""
WITH vals AS (
  SELECT vec_id, UNNEST(embedding) AS vf,
         UNNEST(range(1, len(embedding) + 1)) AS dim
  FROM {table}
),
v AS (SELECT vec_id, CAST(dim AS BIGINT) AS dim,
             CAST(vf AS DOUBLE) AS v FROM vals),
rng AS (SELECT dim, MIN(v) AS lo, MAX(v) AS hi FROM v GROUP BY dim)
SELECT v.vec_id, v.dim,
       CASE WHEN r.hi > r.lo
            THEN CAST(FLOOR((v.v - r.lo) * CAST({levels} AS DOUBLE)
                            / (r.hi - r.lo) + CAST(0.5 AS DOUBLE))
                      AS BIGINT)
            ELSE 0 END AS code
FROM v JOIN rng r USING (dim)
"""


def ann_topk_quantized(ds: ray.data.Dataset, queries: pa.Table, k: int = 5,
                       levels: int = 255,
                       exclude_self: bool = True) -> "pd.DataFrame":
    """Asymmetric-distance (ADC) top-k over the int8-quantized store:
    full-precision queries scored against DEQUANTIZED base vectors —
    exactly what a serving tier computes when only codes are resident.
    Same per-batch partial-top-k / `_finish_topk` shape as the brute
    path; accuracy is a recall gate against `ann_topk` (scalar int8 on
    unit-norm-ish vectors loses little; the gate documents how much)."""
    lo, hi = _global_dim_ranges(ds)
    denom = hi - lo
    ok = denom > 0
    qref = ray.put(queries)
    lh_ref = ray.put((lo, hi, denom, ok))

    class QuantizedTopK:
        def __init__(self):
            qtab = ray.get(qref)
            self.qids = qtab["vec_id"].to_numpy(zero_copy_only=False)
            self.qmat = _normalize(_embedding_matrix(qtab))

        def __call__(self, b: pa.Table) -> pa.Table:
            lo_, hi_, den_, ok_ = ray.get(lh_ref)
            vids = b["vec_id"].to_numpy(zero_copy_only=False)
            m = _embedding_matrix(b).astype(np.float64)
            code = np.floor((m - lo_) * float(levels)
                            / np.where(ok_, den_, 1.0) + 0.5)
            code[:, ~ok_] = 0.0
            recon = lo_ + code * den_ / float(levels)
            sims = _normalize(recon) @ self.qmat.T
            kk = min(k + 1, len(vids))
            out_q, out_v, out_s = [], [], []
            for qi in range(sims.shape[1]):
                order = np.lexsort((vids, -sims[:, qi]))[:kk]
                out_q.append(np.full(len(order), self.qids[qi], np.int64))
                out_v.append(vids[order])
                out_s.append(sims[order, qi])
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s))})

    def probe(b: pa.Table) -> pa.Table:
        from ..core.memo import memo_broadcast
        return memo_broadcast(f"ann_quant:{qref.hex()}:{k}:{levels}",
                              QuantizedTopK)(b)

    sims = ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)
    return _finish_topk(sims, k, exclude_self)
