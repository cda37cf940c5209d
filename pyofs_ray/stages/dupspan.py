"""Exact duplicated-substring span coverage — the exact-substring dedup
accounting of Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better"): for every document, how many character positions are
covered by at least one length-``L`` substring that also occurs in some
OTHER document.

Reference capability analogue: PyOFS's skip-existing content checksums
(`PyOFS/main/leaflet.py`) dedup whole files; winnowing (`stages/text.py`)
and CDC (`stages/cdc.py`) are sampled/landmarked refinements. This module
is the EXACT sub-document form: the gram key is the raw ``L``-code-point
window itself (utf-32 bytes — equal windows ⇔ equal ``substr`` values),
so df counts are string-exact, not hash-exact, and the DuckDB twin is
bit-identical with no HUGEINT hash arithmetic at all.

Shape (two single-key exchanges, every kernel vectorized):

1. ``map_batches`` gram emission — all batch texts concatenated into one
   uint32 code-point array, ``sliding_window_view`` for the windows,
   windows crossing a document boundary masked out. The gram travels as
   ``fixed_size_binary(4·L)`` (zero-copy from the contiguous window
   matrix); the bucket tag is a vectorized word-fold hash of the window
   — bucketing only, never identity (grouping compares the bytes).
2. ONE ``groupby(gram-bucket)`` exchange; per bucket group an Arrow
   ``group_by(gram).count_distinct(doc)`` finds cross-document grams and
   ``is_in`` keeps their (doc, pos) occurrences.
3. ONE ``groupby(doc-bucket)`` exchange; per bucket group a lexsort +
   segment kernel unions the ``[pos, pos+L)`` intervals per document —
   ``covered = Σ min(next_pos − pos, L)`` with the last interval of each
   document contributing ``L``.

Scale note: the exchange moves ``4·L`` bytes per corpus position — this
is the EXACT primitive, priced accordingly (the paper's suffix-array
variant has the same output). At 100 TB you run the sampled detectors
(winnowing / CDC / MinHash) first and reserve this for the candidate
subset they surface; within the exchange everything is bucketed with no
driver participation, so the shape itself holds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DUPSPAN_L = 25  # window length (code points); the dedup threshold

_PHI = np.uint64(0x9E3779B97F4A7C15)


def _window_rows(b: pa.Table, L: int, id_col: str) -> pa.Table:
    """Batch → one row per in-document window: (doc_id, pos [1-based],
    n_chars, gram fixed_size_binary(4L), _bucket-ready uint64 hash)."""
    texts = pc.fill_null(b["text"], "").to_pylist()
    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    lens = pc.utf8_length(pc.fill_null(b["text"], "")).to_numpy(
        zero_copy_only=False).astype(np.int64)
    blob = "".join(texts)
    cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
    n = len(cp)
    empty = pa.table({
        id_col: pa.array([], pa.int64()),
        "pos": pa.array([], pa.int64()),
        "n_chars": pa.array([], pa.int64()),
        "gram": pa.Array.from_buffers(pa.binary(4 * L), 0,
                                      [None, pa.py_buffer(b"")]),
        "_h": pa.array([], pa.uint64())})
    if n < L:
        return empty
    offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
    doc_ix = np.repeat(np.arange(len(texts)), lens)
    starts = np.arange(n - L + 1)
    pos_in = starts - offs[doc_ix[starts]]
    valid = pos_in <= lens[doc_ix[starts]] - L
    vs = starts[valid]
    if len(vs) == 0:
        return empty
    wins = np.ascontiguousarray(
        np.lib.stride_tricks.sliding_window_view(cp, L)[vs])
    # word-fold hash for the bucket tag (identity stays the bytes)
    w64 = wins.astype(np.uint64)
    h = np.zeros(len(vs), np.uint64)
    with np.errstate(over="ignore"):
        for j in range(L):
            h = (h ^ w64[:, j]) * _PHI
            h ^= h >> np.uint64(29)
    nch = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    gram = pa.Array.from_buffers(pa.binary(4 * L), len(vs),
                                 [None, pa.py_buffer(wins.tobytes())])
    return pa.table({
        id_col: pa.array(ids[doc_ix[vs]]),
        "pos": pa.array(pos_in[valid] + 1),
        "n_chars": pa.array(nch[doc_ix[vs]]),
        "gram": gram,
        "_h": pa.array(h)})


def dup_span_coverage(ds: ray.data.Dataset, L: int = DUPSPAN_L,
                      id_col: str = "doc_id",
                      num_buckets: int | None = None) -> ray.data.Dataset:
    """Per-document exact duplicated-span report: ``(doc_id, dup_grams,
    covered_chars, covered_frac)`` for every document with ≥1 position
    whose ``L``-gram occurs in another document. ``covered_chars`` is the
    size of the union of the duplicated ``[pos, pos+L)`` intervals;
    ``covered_frac`` is the single IEEE division by ``n_chars`` after the
    final integer reduce."""
    import ray as _ray
    if num_buckets is None:
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)
    nb = np.uint64(num_buckets)

    def emit(b: pa.Table) -> pa.Table:
        t = _window_rows(b, L, id_col)
        h = t["_h"].to_numpy(zero_copy_only=False)
        bucket = ((h >> np.uint64(3)) % nb).astype(np.int64)
        return t.drop_columns(["_h"]).append_column("_bucket",
                                                    pa.array(bucket))

    def dup_positions(g: pa.Table) -> pa.Table:
        dd = g.select(["gram", id_col]).group_by(["gram"]).aggregate(
            [(id_col, "count_distinct")])
        dup = dd.filter(pc.greater(dd[f"{id_col}_count_distinct"], 1))
        mask = pc.is_in(g["gram"], value_set=dup["gram"].combine_chunks())
        return g.filter(mask).select([id_col, "pos", "n_chars"])

    def per_doc(g: pa.Table) -> pa.Table:
        doc = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = g["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = g["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(doc) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dup_grams": pa.array([], pa.int64()),
                             "covered_chars": pa.array([], pa.int64()),
                             "covered_frac": pa.array([], pa.float64())})
        o = np.lexsort((pos, doc))
        doc, pos, nch = doc[o], pos[o], nch[o]
        new = np.empty(len(doc), bool)
        new[0] = True
        new[1:] = doc[1:] != doc[:-1]
        seg = np.flatnonzero(new)
        contrib = np.full(len(doc), L, np.int64)
        cont = np.flatnonzero(~new[1:])  # rows i with i+1 in same doc
        contrib[cont] = np.minimum(pos[cont + 1] - pos[cont], L)
        covered = np.add.reduceat(contrib, seg)
        dup_grams = np.diff(np.concatenate([seg, [len(doc)]]))
        return pa.table({
            id_col: pa.array(doc[seg]),
            "dup_grams": pa.array(dup_grams.astype(np.int64)),
            "covered_chars": pa.array(covered),
            "covered_frac": pa.array(
                covered.astype(np.float64) / nch[seg].astype(np.float64))})

    rows = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
    dups = rows.groupby("_bucket").map_groups(dup_positions,
                                              batch_format="pyarrow")

    def retag(b: pa.Table) -> pa.Table:
        d = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("_bucket2",
                               pa.array(d % np.int64(num_buckets)))

    return (dups.map_batches(retag, batch_format="pyarrow")
            .groupby("_bucket2").map_groups(per_doc,
                                            batch_format="pyarrow"))


def dup_span_coverage_sql(L: int = DUPSPAN_L, table: str = "documents",
                          id_col: str = "doc_id") -> str:
    """Bit-exact DuckDB twin: same grams (substr), same df>1 rule, same
    interval union (LEAD window), same single final division."""
    return f"""
WITH g AS (
  SELECT {id_col}, n_chars,
         UNNEST(generate_series(1, length(text) - {L - 1})) AS pos, text
  FROM {table} WHERE length(text) >= {L}
),
gg AS (
  SELECT {id_col}, n_chars, pos,
         substr(text, CAST(pos AS INT), {L}) AS gram
  FROM g
),
df AS (
  SELECT gram FROM gg GROUP BY gram HAVING COUNT(DISTINCT {id_col}) > 1
),
dup AS (SELECT {id_col}, n_chars, pos FROM gg JOIN df USING (gram)),
seg AS (
  SELECT {id_col}, n_chars, pos,
         LEAD(pos) OVER (PARTITION BY {id_col} ORDER BY pos) AS nxt
  FROM dup
),
per AS (
  SELECT {id_col}, n_chars,
         CAST(COUNT(*) AS BIGINT) AS dup_grams,
         CAST(SUM(CASE WHEN nxt IS NULL THEN {L}
                       WHEN nxt - pos >= {L} THEN {L}
                       ELSE nxt - pos END) AS BIGINT) AS covered_chars
  FROM seg GROUP BY {id_col}, n_chars
)
SELECT {id_col}, dup_grams, covered_chars,
       CAST(covered_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
         AS covered_frac
FROM per
"""
