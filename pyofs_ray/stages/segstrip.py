"""Global frequent-segment stripping — the CCNet / RefinedWeb "line-level
deduplication" step re-expressed over a corpus whose documents carry no
newlines: a *segment* is an aligned run of ``k`` non-empty whitespace
tokens (a pseudo-paragraph), and any segment whose document frequency
reaches ``min_df`` anywhere in the corpus is removed from every document.
This is the GLOBAL counterpart of `flagship.host_boilerplate_strip`
(which learns a per-host vocabulary): it kills cross-site template text,
license boilerplate and mirrored passages no matter where they appear.

Scale shape: two corpus scans (detect + apply), like every
learn-then-apply curation operator here. Detection emits per-batch
distinct (segment, doc) partials — a document never spans batches, so
per-batch df partials are exact — and sums them through ONE
segment-keyed bucket exchange (`agg.bucketed_group_agg`; segment
cardinality tracks the corpus, never a Ray sort-groupby). The frequent
set (df ≥ min_df) is bounded by repeated content, pulled once behind a
LOUD row guard and broadcast via ray.put; the apply pass is a stateless
vectorized map (Arrow `is_in` on segment strings, ListArray + binary_join
reassembly — no Python loop over docs or tokens). Past the broadcast
guard the co-bucket join plan of `host_boilerplate_strip` applies
verbatim with key = segment.

Reference analogue: PyOFS drops repeated/overlapping granule coverage
before compositing (`write_daily_average.py:289-311` skip-existing);
this is the text-corpus equivalent at passage granularity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .agg import bucketed_group_agg

SEG_K = 16          # tokens per segment (pseudo-paragraph)
SEG_MIN_DF = 4      # drop segments appearing in >= this many documents
SEG_FREQ_BCAST_MAX = 5_000_000  # loud guard on the broadcast frequent set


def _doc_segments(b: pa.Table, k: int, id_col: str, text_col: str):
    """Per-batch aligned k-token segments. Returns (row_idx, seg_idx,
    seg_strings): one entry per segment, in (doc, position) order;
    ``row_idx`` indexes the batch row the segment came from."""
    b = b.combine_chunks()
    toks = pc.split_pattern_regex(b[text_col], r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat2 = flat.filter(pa.array(ne))
    if isinstance(flat2, pa.ChunkedArray):
        flat2 = flat2.combine_chunks()
    p2 = parent[ne]
    n = len(p2)
    if n == 0:
        return (np.array([], np.int64), np.array([], np.int64),
                pa.array([], pa.string()))
    newdoc = np.r_[True, p2[1:] != p2[:-1]]
    starts = np.flatnonzero(newdoc)
    sizes = np.diff(np.append(starts, n))
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
    seg = pos // k
    newseg = newdoc.copy()
    newseg[1:] |= seg[1:] != seg[:-1]
    segstart = np.flatnonzero(newseg)
    seglens = np.diff(np.append(segstart, n))
    offsets = np.zeros(len(segstart) + 1, np.int32)
    np.cumsum(seglens, out=offsets[1:])
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     flat2.cast(pa.string()))
    segstr = pc.binary_join(lists, " ")
    return p2[segstart], seg[segstart], segstr


def frequent_segments(ds: ray.data.Dataset, k: int = SEG_K,
                      min_df: int = SEG_MIN_DF, *,
                      id_col: str = "doc_id", text_col: str = "text",
                      ) -> ray.data.Dataset:
    """(seg, df) rows for every segment with df ≥ ``min_df``."""

    def df_partial(b: pa.Table) -> pa.Table:
        rows, _si, segstr = _doc_segments(b, k, id_col, text_col)
        if len(rows) == 0:
            return pa.table({"seg": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        d = b[id_col].to_numpy(zero_copy_only=False)[rows]
        t = pa.table({"seg": segstr, "d": pa.array(d)})
        dd = t.group_by(["seg", "d"]).aggregate([])
        g = dd.group_by("seg").aggregate([("seg", "count")])
        return pa.table({"seg": g["seg"],
                         "df": g["seg_count"].cast(pa.int64())})

    df = bucketed_group_agg(
        ds.map_batches(df_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["seg"], aggs=[("df", "sum", "df")])
    return df.map_batches(
        lambda b: b.filter(pc.greater_equal(b["df"], min_df))
        if b.num_rows and "df" in b.column_names else b,
        batch_format="pyarrow")


def frequent_segment_strip(ds: ray.data.Dataset, k: int = SEG_K,
                           min_df: int = SEG_MIN_DF, *,
                           id_col: str = "doc_id", text_col: str = "text",
                           broadcast_max_rows: int = SEG_FREQ_BCAST_MAX,
                           path: str = "auto") -> ray.data.Dataset:
    """Every document with its frequent segments removed:
    (id_col, clean_text, n_removed) — single-spaced reassembly, empty
    string when everything was boilerplate. ``ds`` must be re-readable
    (a parquet-backed Dataset; it is scanned twice: detect + apply).

    Apply plans: ``"broadcast"`` (frequent set ≤ ``broadcast_max_rows``:
    ray.put once, stateless vectorized map) or ``"cobucket"`` (r5 — the
    unbounded-frequent-set plan: ONE segment-keyed exchange marks hit
    (doc, seg_idx) pairs against the co-partitioned frequent rows, ONE
    doc-keyed exchange rejoins the slim hits with the documents for
    group-local reassembly; the frequent set never materializes
    anywhere). ``"auto"`` counts the materialized frequent set and
    picks. Both plans emit identical rows (equality pytest)."""
    freq = frequent_segments(ds, k, min_df, id_col=id_col,
                             text_col=text_col).materialize()
    if path == "auto":
        path = "broadcast" if freq.count() <= broadcast_max_rows \
            else "cobucket"
    if path == "cobucket":
        return _strip_cobucket(ds, freq, k, id_col, text_col)
    if path != "broadcast":
        raise ValueError(f"unknown path {path!r}")
    ft = pa.concat_tables(
        [t for t in ray.get(freq.to_arrow_refs())
         if t.num_rows and "seg" in t.column_names] or
        [pa.table({"seg": pa.array([], pa.string()),
                   "df": pa.array([], pa.int64())})])
    if ft.num_rows > broadcast_max_rows:
        raise ValueError(
            f"frequent_segment_strip: {ft.num_rows} frequent segments "
            f"exceed the broadcast cap ({broadcast_max_rows}) — use "
            'path="cobucket" (or "auto")')
    freq_ref = ray.put(ft["seg"].combine_chunks())

    def strip(b: pa.Table) -> pa.Table:
        fr = ray.get(freq_ref)
        rows, _si, segstr = _doc_segments(b, k, id_col, text_col)
        nb = len(b)
        if len(rows) == 0:
            return pa.table({
                id_col: b[id_col],
                "clean_text": pa.array([""] * nb, pa.string()),
                "n_removed": pa.array(np.zeros(nb, np.int64))})
        hit = pc.is_in(segstr, value_set=fr).to_numpy(zero_copy_only=False)
        keep = ~hit
        kept_counts = np.bincount(rows[keep], minlength=nb)
        removed = np.bincount(rows[hit], minlength=nb)
        offsets = np.zeros(nb + 1, np.int32)
        np.cumsum(kept_counts, out=offsets[1:])
        segstr2 = segstr.combine_chunks() if isinstance(
            segstr, pa.ChunkedArray) else segstr
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            segstr2.filter(pa.array(keep)).cast(pa.string()))
        clean = pc.binary_join(lists, " ")
        return pa.table({id_col: b[id_col],
                         "clean_text": clean,
                         "n_removed": pa.array(removed, pa.int64())})

    return ds.map_batches(strip, batch_format="pyarrow",
                          zero_copy_batch=True)


def _strip_cobucket(ds: ray.data.Dataset, freq: ray.data.Dataset,
                    k: int, id_col: str, text_col: str
                    ) -> ray.data.Dataset:
    """Unbounded-frequent-set apply (see `frequent_segment_strip`)."""
    import ray as _ray

    from .agg import hash_bucket_tag

    cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    nb = max(8, cpus)

    # exchange 1: segment-keyed hit marking -------------------------------
    def tag_doc_segs(b: pa.Table) -> pa.Table:
        rows, seg_idx, segstr = _doc_segments(b, k, id_col, text_col)
        d = b[id_col].to_numpy(zero_copy_only=False)[rows] \
            if len(rows) else np.array([], np.int64)
        t = pa.table({"seg": segstr,
                      id_col: pa.array(d.astype(np.int64)),
                      "seg_idx": pa.array(seg_idx.astype(np.int64)
                                          if len(rows) else
                                          np.array([], np.int64)),
                      "_role": pa.array(np.zeros(len(rows), np.int64))})
        return hash_bucket_tag(t, ["seg"], nb)

    def tag_freq(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "seg" not in b.column_names:
            return b
        n = len(b)
        t = pa.table({"seg": b["seg"],
                      id_col: pa.array(np.zeros(n, np.int64)),
                      "seg_idx": pa.array(np.zeros(n, np.int64)),
                      "_role": pa.array(np.ones(n, np.int64))})
        return hash_bucket_tag(t, ["seg"], nb)

    def mark(g: pa.Table) -> pa.Table:
        isf = pc.equal(g["_role"], pa.scalar(1, pa.int64()))
        fr = pc.unique(g.filter(isf)["seg"].combine_chunks())
        ds_rows = g.filter(pc.invert(isf))
        hits = ds_rows.filter(pc.is_in(ds_rows["seg"], value_set=fr))
        return pa.table({id_col: hits[id_col], "seg_idx": hits["seg_idx"]})

    hits = (ds.map_batches(tag_doc_segs, batch_format="pyarrow",
                           zero_copy_batch=True)
              .union(freq.map_batches(tag_freq, batch_format="pyarrow"))
              .groupby("_bucket").map_groups(mark, batch_format="pyarrow"))

    # exchange 2: doc-keyed rejoin + group-local strip --------------------
    def tag_docs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or text_col not in b.column_names:
            return b
        t = pa.table({id_col: b[id_col].cast(pa.int64()),
                      text_col: b[text_col],
                      "seg_idx": pa.array(
                          np.full(len(b), -1, np.int64)),
                      "_role": pa.array(np.zeros(len(b), np.int64))})
        return hash_bucket_tag(t, [id_col], nb)

    def tag_hits(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "seg_idx" not in b.column_names:
            return b
        n = len(b)
        t = pa.table({id_col: b[id_col].cast(pa.int64()),
                      text_col: pa.array([""] * n, pa.string()),
                      "seg_idx": b["seg_idx"].cast(pa.int64()),
                      "_role": pa.array(np.ones(n, np.int64))})
        return hash_bucket_tag(t, [id_col], nb)

    def strip_group(g: pa.Table) -> pa.Table:
        ish = pc.equal(g["_role"], pa.scalar(1, pa.int64()))
        hit_t = g.filter(ish)
        docs = g.filter(pc.invert(ish)).select([id_col, text_col])
        nb_docs = docs.num_rows
        if nb_docs == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "clean_text": pa.array([], pa.string()),
                             "n_removed": pa.array([], pa.int64())})
        hit_keys = set(zip(hit_t[id_col].to_pylist(),
                           hit_t["seg_idx"].to_pylist()))
        rows, seg_idx, segstr = _doc_segments(docs, k, id_col, text_col)
        doc_ids = docs[id_col].to_numpy(zero_copy_only=False)
        if len(rows) == 0:
            return pa.table({
                id_col: docs[id_col],
                "clean_text": pa.array([""] * nb_docs, pa.string()),
                "n_removed": pa.array(np.zeros(nb_docs, np.int64))})
        hit = np.fromiter(
            ((int(doc_ids[r]), int(s)) in hit_keys
             for r, s in zip(rows, seg_idx)), bool, len(rows))
        keep = ~hit
        kept_counts = np.bincount(rows[keep], minlength=nb_docs)
        removed = np.bincount(rows[hit], minlength=nb_docs)
        offsets = np.zeros(nb_docs + 1, np.int32)
        np.cumsum(kept_counts, out=offsets[1:])
        segstr2 = segstr.combine_chunks() if isinstance(
            segstr, pa.ChunkedArray) else segstr
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            segstr2.filter(pa.array(keep)).cast(pa.string()))
        return pa.table({id_col: docs[id_col].cast(pa.int64()),
                         "clean_text": pc.binary_join(lists, " "),
                         "n_removed": pa.array(removed, pa.int64())})

    return (ds.map_batches(tag_docs, batch_format="pyarrow",
                           zero_copy_batch=True)
              .union(hits.map_batches(tag_hits, batch_format="pyarrow"))
              .groupby("_bucket").map_groups(strip_group,
                                             batch_format="pyarrow"))


def segment_dedup_strip_sql(k: int = SEG_K, min_df: int = SEG_MIN_DF,
                            table: str = "documents") -> str:
    """DuckDB twin: identical alignment (0-based position among NON-EMPTY
    tokens, floor-div by k), identical single-space reassembly."""
    return f"""
WITH raw AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS token,
         generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) AS pos
  FROM {table}
),
toks AS (
  SELECT doc_id, token,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS tpos
  FROM raw WHERE token <> ''
),
segs AS (
  SELECT doc_id, tpos // {k} AS seg_idx,
         STRING_AGG(token, ' ' ORDER BY tpos) AS seg
  FROM toks GROUP BY 1, 2
),
freq AS (
  SELECT seg FROM (
    SELECT seg, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM segs GROUP BY 1) WHERE df >= {min_df}
),
kept AS (
  SELECT s.doc_id,
         STRING_AGG(s.seg, ' ' ORDER BY s.seg_idx)
             FILTER (WHERE f.seg IS NULL) AS clean_text,
         CAST(COUNT(*) FILTER (WHERE f.seg IS NOT NULL) AS BIGINT)
             AS n_removed
  FROM segs s LEFT JOIN freq f ON s.seg = f.seg
  GROUP BY 1
)
SELECT d.doc_id, COALESCE(kp.clean_text, '') AS clean_text,
       COALESCE(kp.n_removed, CAST(0 AS BIGINT)) AS n_removed
FROM {table} d LEFT JOIN kept kp USING (doc_id)
"""
