"""Content-defined chunking (CDC) — anchor/Gear-style rolling-hash chunk
boundaries for storage-level dedup of a text corpus.

The classic shingle/anchor scheme (Manber 1994; the windowed form of
FastCDC's Gear hash): a rolling hash over a fixed window of the last
``W`` code points,

    h(pos) = sum_{k=0..W-1} g(cp[pos-k]) * 2^k   (mod 2^64),
    g(cp)  = splitmix64(cp),

declares a chunk boundary wherever ``h % D == 0`` (plus the final
position of every document), so chunk cuts move WITH the content: an
insertion near the head of a page re-chunks only the window around the
edit, and every untouched chunk keeps its signature — which is what lets
chunk-level dedup find shared boilerplate across page versions that
whole-document hashing misses.

Because ``* 2^k mod 2^64`` keeps only the last-64-shifted window, the
hash at a position depends on exactly the ``W`` code points before it —
no sequential state, so chunking is embarrassingly parallel per document
and runs as one vectorized kernel over the whole batch (all texts
concatenated into a single uint32 code-point array; windows never leak
across documents because only positions ``pos_in_doc >= W-1`` may cut,
and every document's last position cuts).

No min/max-length clamp: FastCDC's length bounds make the NEXT cut
depend on the previous one (a sequential chain); the unclamped anchor
rule keeps boundary choice purely content-local, which is the published
Manber variant and the one that parallelizes. Expected chunk length is
the divisor ``D`` plus tail effects.

Chunk signature = ``sum(g(cp) * (1-based offset in chunk)) mod 2^64``
(order-sensitive, exact in both numpy uint64 wraparound and the DuckDB
HUGEINT twin). Reference capability analogue: the skip-existing /
dedup-by-content machinery of `PyOFS/main/leaflet.py` checksums whole
files; CDC is its sub-document refinement for the web-page corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..core.hashing import splitmix64
from ..core.sqlgen_sample import MOD64, _mulmod64

CDC_WINDOW = 16    # rolling-hash window (code points)
CDC_DIVISOR = 64   # boundary when h % D == 0 — expected chunk length ≈ D

_GOLDEN = 0x9E3779B97F4A7C15
_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB


def chunk_batch(b: pa.Table, window: int = CDC_WINDOW,
                divisor: int = CDC_DIVISOR,
                id_col: str = "doc_id") -> pa.Table:
    """One vectorized pass: batch texts → (doc_id, chunk_idx, start_pos,
    chunk_len, sig) chunk rows. Per-document work only (no cross-batch
    state), so map_batches parallelism is exact."""
    texts = pc.fill_null(b["text"], "").to_pylist()
    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    blob = "".join(texts)
    cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
    lens = pc.utf8_length(pc.fill_null(b["text"], "")).to_numpy(
        zero_copy_only=False).astype(np.int64)
    offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
    n = len(cp)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "chunk_idx": pa.array([], pa.int64()),
                      "start_pos": pa.array([], pa.int64()),
                      "chunk_len": pa.array([], pa.int64()),
                      "sig": pa.array([], pa.int64())})
    if n == 0:
        return empty

    g = splitmix64(cp.astype(np.uint64))
    H = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(window):
            H[window - 1:] += g[window - 1 - k: n - k] << np.uint64(k)

    doc_ix = np.repeat(np.arange(len(texts)), lens)
    pos_in = np.arange(n) - offs[doc_ix]
    is_b = (pos_in >= window - 1) & (H % np.uint64(divisor) == np.uint64(0))
    last = offs[1:] - 1
    is_b[last[lens > 0]] = True  # every doc's final position cuts

    bpos = np.flatnonzero(is_b)          # chunk END positions, global
    starts = np.concatenate([np.zeros(1, np.int64), bpos[:-1] + 1])
    # docs' last positions always cut, so chunks never span documents
    cdoc = doc_ix[starts]
    # chunk_idx within doc: global chunk counter minus the doc's first
    first = np.flatnonzero(np.concatenate([[True], cdoc[1:] != cdoc[:-1]]))
    counts = np.diff(np.concatenate([first, [len(cdoc)]]))
    cidx = np.arange(len(cdoc)) - np.repeat(first, counts)

    clen = bpos - starts + 1
    # order-sensitive signature: g * (1-based in-chunk offset), reduceat
    mult = (np.arange(n, dtype=np.int64)
            - np.repeat(starts, clen) + 1).astype(np.uint64)
    with np.errstate(over="ignore"):
        terms = g * mult
    sig = np.add.reduceat(terms, starts).astype(np.uint64) \
        if len(starts) else np.zeros(0, np.uint64)

    return pa.table({
        id_col: pa.array(ids[cdoc]),
        "chunk_idx": pa.array(cidx),
        "start_pos": pa.array(starts - offs[cdoc]),
        "chunk_len": pa.array(clen),
        "sig": pa.array(sig.view(np.int64))})


def cdc_chunks(ds: ray.data.Dataset, window: int = CDC_WINDOW,
               divisor: int = CDC_DIVISOR,
               id_col: str = "doc_id") -> ray.data.Dataset:
    """Chunk table of the corpus — one streaming map_batches, no exchange."""
    return ds.map_batches(
        lambda b: chunk_batch(b, window=window, divisor=divisor,
                              id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True)


def cdc_dup_chunks(ds: ray.data.Dataset, window: int = CDC_WINDOW,
                   divisor: int = CDC_DIVISOR,
                   id_col: str = "doc_id") -> ray.data.Dataset:
    """Storage-dedup accounting: distinct chunk signatures seen in more
    than one place — (sig, n_copies, n_docs, chunk_len, saved_chars).

    ONE sig-bucket exchange; the per-bucket kernel dedupes (sig, doc)
    pairs and counts copies vectorized (lexsort + segment boundaries).
    ``saved_chars = (n_copies - 1) * chunk_len`` is the bytes a
    chunk-store would not re-write — the CDC dedup headline number."""
    from .agg import hash_bucket_tag

    import ray as _ray
    cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    nb = max(8, cpus)

    chunks = cdc_chunks(ds, window=window, divisor=divisor, id_col=id_col)
    tagged = chunks.map_batches(
        lambda b: hash_bucket_tag(b.select(["sig", id_col, "chunk_len"]),
                                  ["sig"], nb),
        batch_format="pyarrow")

    def kernel(g: pa.Table) -> pa.Table:
        sig = g["sig"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = g["chunk_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((doc, sig))
        sig, doc, cl = sig[order], doc[order], cl[order]
        new_sig = np.concatenate([[True], sig[1:] != sig[:-1]])
        seg = np.flatnonzero(new_sig)
        n_copies = np.diff(np.concatenate([seg, [len(sig)]]))
        new_pair = new_sig | np.concatenate([[True], doc[1:] != doc[:-1]])
        if len(seg) == 0:
            n_docs = np.zeros(0, np.int64)
            min_len = np.zeros(0, np.int64)
        else:
            n_docs = np.add.reduceat(new_pair.astype(np.int64), seg)
            # MIN over the group (not "first") so an adversarial sig
            # collision with unequal lengths still matches the SQL twin
            min_len = np.minimum.reduceat(cl, seg)
        keep = n_copies > 1
        return pa.table({
            "sig": pa.array(sig[seg][keep]),
            "n_copies": pa.array(n_copies[keep]),
            "n_docs": pa.array(n_docs[keep]),
            "chunk_len": pa.array(min_len[keep]),
            "saved_chars": pa.array((n_copies[keep] - 1) * min_len[keep])})

    return tagged.groupby("_bucket").map_groups(kernel,
                                                batch_format="pyarrow")


# --------------------------------------------------------- DuckDB twins

def _chunk_cte(window: int, divisor: int, table: str,
               id_col: str) -> str:
    """Shared chunk-table CTE chain — `agg` holds one row per chunk with
    (id, chunk_idx, start_pos, chunk_len, sigu). The g() mix is the
    splitmix64 finalizer in HUGEINT 32-bit-limb arithmetic, computed once
    per DISTINCT code point (the vocabulary is tiny next to the corpus)."""
    pw = ", ".join(f"({k}, {1 << k})" for k in range(window))
    return f"""
chars AS (
  SELECT {id_col}, i - 1 AS pos, dlen,
         unicode(substr(text, CAST(i AS INT), 1)) AS cpt
  FROM (SELECT {id_col}, text, length(text) AS dlen,
               UNNEST(generate_series(1, length(text))) AS i
        FROM {table})
),
cps AS (SELECT DISTINCT cpt FROM chars),
g0 AS (SELECT cpt, (CAST(cpt AS HUGEINT) + {_GOLDEN}) % {MOD64} AS z0 FROM cps),
g1 AS (SELECT cpt, {_mulmod64('xor(z0, z0 >> 30)', _C1)} AS z1 FROM g0),
g2 AS (SELECT cpt, {_mulmod64('xor(z1, z1 >> 27)', _C2)} AS z2 FROM g1),
gv AS (SELECT cpt, xor(z2, z2 >> 31) AS g FROM g2),
ch AS (SELECT c.{id_col}, c.pos, c.dlen, v.g
       FROM chars c JOIN gv v USING (cpt)),
pw(k, m) AS (VALUES {pw}),
h AS (
  SELECT c1.{id_col}, c1.pos,
         CAST(SUM(c2.g * p.m) % {MOD64} AS HUGEINT) AS hv
  FROM ch c1
  JOIN pw p ON TRUE
  JOIN ch c2 ON c2.{id_col} = c1.{id_col} AND c2.pos = c1.pos - p.k
  WHERE c1.pos >= {window - 1}
  GROUP BY c1.{id_col}, c1.pos
),
b AS (
  SELECT {id_col}, pos, TRUE AS is_b FROM h WHERE hv % {divisor} = 0
  UNION
  SELECT {id_col}, dlen - 1 AS pos, TRUE FROM chars WHERE dlen > 0
),
marked AS (
  SELECT c.{id_col}, c.pos, c.g, COALESCE(b.is_b, FALSE) AS is_b
  FROM ch c LEFT JOIN b ON b.{id_col} = c.{id_col} AND b.pos = c.pos
),
cix AS (
  SELECT {id_col}, pos, g,
         CAST(COALESCE(SUM(CASE WHEN is_b THEN 1 ELSE 0 END)
           OVER (PARTITION BY {id_col} ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS chunk_idx
  FROM marked
),
cstarts AS (
  SELECT {id_col}, pos, g, chunk_idx,
         MIN(pos) OVER (PARTITION BY {id_col}, chunk_idx) AS cstart
  FROM cix
),
agg AS (
  SELECT {id_col}, chunk_idx, CAST(MIN(pos) AS BIGINT) AS start_pos,
         CAST(COUNT(*) AS BIGINT) AS chunk_len,
         CAST(SUM(g * (pos - cstart + 1)) % {MOD64} AS HUGEINT) AS sigu
  FROM cstarts GROUP BY {id_col}, chunk_idx
)"""


def cdc_chunks_sql(window: int = CDC_WINDOW, divisor: int = CDC_DIVISOR,
                   table: str = "documents",
                   id_col: str = "doc_id") -> str:
    return f"""
WITH {_chunk_cte(window, divisor, table, id_col)}
SELECT {id_col}, chunk_idx, start_pos, chunk_len,
       CAST(CASE WHEN sigu >= {1 << 63} THEN sigu - {MOD64} ELSE sigu END
            AS BIGINT) AS sig
FROM agg
"""


def cdc_dup_chunks_sql(window: int = CDC_WINDOW,
                       divisor: int = CDC_DIVISOR,
                       table: str = "documents",
                       id_col: str = "doc_id") -> str:
    return f"""
WITH {_chunk_cte(window, divisor, table, id_col)},
sigs AS (
  SELECT CAST(CASE WHEN sigu >= {1 << 63} THEN sigu - {MOD64} ELSE sigu END
              AS BIGINT) AS sig,
         {id_col}, chunk_len
  FROM agg
)
SELECT sig,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS n_docs,
       CAST(MIN(chunk_len) AS BIGINT) AS chunk_len,
       CAST((COUNT(*) - 1) * MIN(chunk_len) AS BIGINT) AS saved_chars
FROM sigs GROUP BY sig HAVING COUNT(*) > 1
"""


CDC_OVERLAP_MAX_DF = 4096  # loud guard: a sig this hot is a stop-chunk


def cdc_doc_overlap(ds: ray.data.Dataset, min_shared: int = 1,
                    window: int = CDC_WINDOW,
                    divisor: int = CDC_DIVISOR,
                    id_col: str = "doc_id",
                    max_df: int = CDC_OVERLAP_MAX_DF) -> ray.data.Dataset:
    """Sub-document near-dup pairs: documents sharing ≥ ``min_shared``
    distinct CDC chunk signatures — boilerplate/quote overlap that
    whole-document hashing misses and gram-Jaccard only sees diluted.

    Shape: chunk table → distinct (doc, sig) per batch (exact globally:
    a doc's chunks never span batches) → ONE sig-bucket exchange with
    in-group pair expansion (`cocite._pair_rows` segment arithmetic) →
    ONE pair-key exchange counting shared sigs. Cost is the same Σ df²
    the SQL twin pays; a signature hotter than ``CDC_OVERLAP_MAX_DF``
    raises loudly (a chunk shared by thousands of docs is template
    boilerplate — strip it first) instead of silently truncating."""
    from .agg import bucketed_group_agg, hash_bucket_tag
    from .cocite import _pair_rows

    import ray as _ray
    cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    nb = max(8, cpus)

    chunks = cdc_chunks(ds, window=window, divisor=divisor, id_col=id_col)

    def distinct_pairs(b: pa.Table) -> pa.Table:
        sig = b["sig"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.unique(np.stack([sig, doc], axis=1), axis=0)
        return pa.table({"dst": pa.array(u[:, 0]),
                         "src": pa.array(u[:, 1])})

    tagged = (chunks.map_batches(distinct_pairs, batch_format="pyarrow")
              .map_batches(lambda b: hash_bucket_tag(b, ["dst"], nb),
                           batch_format="pyarrow"))

    def expand(g: pa.Table) -> pa.Table:
        d = g["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d):
            _, cnt = np.unique(d, return_counts=True)
            if cnt.max() > max_df:
                raise ValueError(
                    f"cdc_doc_overlap: chunk signature shared by "
                    f"{int(cnt.max())} docs (> {max_df}) — "
                    "template boilerplate; strip it before pairing")
        return _pair_rows(g)

    pairs = tagged.groupby("_bucket").map_groups(expand,
                                                 batch_format="pyarrow")
    counted = bucketed_group_agg(pairs, ["src_a", "src_b"],
                                 [("one", "sum", "n_shared")])
    out = counted.filter(
        expr=f"n_shared >= {min_shared}") if min_shared > 1 else counted
    return out.rename_columns(
        {"src_a": "doc_a", "src_b": "doc_b", "n_shared": "n_shared"})


def cdc_doc_overlap_sql(min_shared: int = 1, window: int = CDC_WINDOW,
                        divisor: int = CDC_DIVISOR,
                        table: str = "documents",
                        id_col: str = "doc_id") -> str:
    return f"""
WITH {_chunk_cte(window, divisor, table, id_col)},
sigs AS (
  SELECT DISTINCT {id_col},
         CAST(CASE WHEN sigu >= {1 << 63} THEN sigu - {MOD64} ELSE sigu END
              AS BIGINT) AS sig
  FROM agg
)
SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.{id_col} < b.{id_col}
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}
"""
