"""Token-n-gram train/eval decontamination: exact verbatim-passage overlap
between hash-split partitions of the corpus.

The document-level contamination audit (`pipelines.corpus.split_contamination`)
only catches NEAR-DUPLICATE documents crossing a split boundary; real eval
leakage is usually a *passage* — a quote, a boilerplate block, a copied
paragraph — embedded in an otherwise-unrelated training document. The
standard curation answer (the GPT-3 / Llama decontamination recipe) is exact
token-n-gram matching at EVERY token position: flag an eval document when any
of its n-grams also occurs verbatim in any train document. Position-dense
shingling is what makes the detector alignment-free — a strided character
window would only fire when the copied passage happens to share the stride
phase in both documents.

Reference analogue: the skip-existing overlap checks of
`/root/reference/main/write_daily_average.py:289-311` test *whole outputs*
for identity; this operator generalizes identity to shared sub-ranges, the
same way PyOFS's granule de-overlap (`viirs.py:202-241`) tests sub-extents
rather than whole granules.

Scale shape (100 TB):
- N-gram emission is one stateless ``map_batches`` pass: tokens come from
  the vectorized RE2 split (the `tfidf.py` kernel), docs are sorted by
  window count so every window step slices a PREFIX of the batch
  (zero-copy) and builds its n-gram with two Arrow kernels
  (``list_slice`` + ``binary_join``) — no per-row Python, no wasted mask
  work on the heavy tail. Per-doc de-duplication happens inside the same
  batch (a doc is one input row, so its n-grams never span batches).
- Exchange 1 buckets by ``fnv1a64(ngram) % B``: inside a bucket group the
  train n-gram set and the eval membership test are single Arrow
  ``unique`` / ``is_in`` kernels. Only (doc_id, ngram, split) rows move —
  never full documents.
- Exchange 2 is a tiny ``bucketed_group_agg`` summing per-bucket hit
  partials per doc; output is bounded by the number of CONTAMINATED eval
  docs, not the corpus.

The split label is a pure function of doc_id (``sample.split_labels``), so
no corpus join is needed on either side; the DuckDB twin
(`shingle_contamination_sql`) re-derives the identical windows with 1-based
inclusive list slicing over ``range()`` and the identical splits via the
splitmix64 HUGEINT twin — results are bit-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..core.hashing import fnv1a64
from .agg import bucketed_group_agg
from .sample import split_labels

DEFAULT_NGRAM = 8


def shingle_rows(ds: ray.data.Dataset, *, id_col: str = "doc_id",
                 text_col: str = "text",
                 ngram: int = DEFAULT_NGRAM) -> ray.data.Dataset:
    """Distinct (doc_id, s) token-n-gram rows: ``s`` is the space-joined
    window of ``ngram`` consecutive non-empty whitespace tokens, at EVERY
    token position. Exactly ``max(m - ngram + 1, 1)`` windows per doc
    (``m`` = token count) — a doc shorter than ``ngram`` tokens
    contributes its whole token sequence as one (shorter) window, and a
    zero-token doc contributes the empty string, matching the SQL twin's
    ``range()`` + truncating-slice semantics."""

    def emit(b: pa.Table) -> pa.Table:
        texts = b[text_col].combine_chunks() \
            if isinstance(b[text_col], pa.ChunkedArray) else b[text_col]
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern_regex(texts, r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        m = np.bincount(parent[keep_np], minlength=len(b)).astype(np.int64)
        # rebuild the per-doc token lists with empties dropped
        lists = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(m)], pa.int32()),
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
            else flat)
        n_win = np.maximum(m - (ngram - 1), 1)
        # Sort docs by window count DESC: step j's survivors are then a
        # PREFIX, so each step is a zero-copy slice instead of a filter.
        order = np.argsort(-n_win, kind="stable")
        lists = lists.take(pa.array(order))
        ids, n_win = ids[order], n_win[order]
        neg = -n_win
        out_s, out_id = [], []
        for j in range(int(n_win[0]) if len(n_win) else 0):
            k = int(np.searchsorted(neg, -(j + 1), side="right"))
            sl = pc.list_slice(lists.slice(0, k), start=j, stop=j + ngram)
            out_s.append(pc.binary_join(sl, " "))
            out_id.append(ids[:k])
        t = pa.table({
            "doc_id": pa.array(np.concatenate(out_id) if out_id
                               else np.array([], np.int64)),
            "s": pa.concat_arrays([a.combine_chunks() if isinstance(
                a, pa.ChunkedArray) else a for a in out_s])
            if out_s else pa.array([], pa.string()),
        })
        # distinct per doc — global, because a doc never spans batches
        return t.group_by(["doc_id", "s"]).aggregate([])

    return ds.map_batches(emit, batch_format="pyarrow")


def shingle_contamination(ds: ray.data.Dataset, splits: dict[str, float],
                          salt: int, *, id_col: str = "doc_id",
                          text_col: str = "text",
                          ngram: int = DEFAULT_NGRAM,
                          train_label: str = "train",
                          num_buckets: int | None = None,
                          prefilter: str | None = None,
                          bloom_fpr: float = 0.01) -> ray.data.Dataset:
    """Eval documents sharing ≥1 verbatim token ``ngram``-gram with any
    train document. Output: ``doc_id, split, n_hits`` where ``n_hits``
    counts the doc's DISTINCT contaminated n-grams.

    ``prefilter="bloom"`` — the 100-TB exchange diet: a first pass builds
    a Bloom filter of the EVAL side's n-gram hashes (the minority split —
    a slim uint64 column), and the main exchange then drops every train
    row whose hash cannot be an eval gram. Bloom filters have NO false
    negatives, so the candidate set is a superset and the in-bucket exact
    string compare makes the OUTPUT bit-identical to the direct path —
    only the exchange shrinks (eval rows + Bloom survivors instead of the
    full corpus gram stream), at the price of tokenizing the corpus
    twice. Pick it when the exchange, not the scan, is the bottleneck.

    ``prefilter="auto"`` applies that break-even mechanically instead of
    trusting the caller: the Bloom pays for its extra full tokenize pass
    only when (a) the exchange crosses a NETWORK (>1 Ray node — on a
    single node the "exchange" is shared-memory plasma and the direct
    path wins at every measured scale: 1.1 s vs 1.9 s at sf0.1, see
    BENCH_r04) and (b) the droppable majority is large (train/eval row
    ratio ≥ 4, read off the split fractions — the Bloom can only drop
    train rows, so a 50/50 split halves the exchange at best). Auto
    therefore resolves to the direct path in this sandbox and to the
    Bloom diet on a real cluster with a small eval split."""
    if num_buckets is None:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)

    if prefilter == "auto":
        import ray as _ray_auto
        n_nodes = len([n for n in _ray_auto.nodes() if n.get("Alive")]) \
            if _ray_auto.is_initialized() else 1
        eval_frac = 1.0 - float(splits.get(train_label, 0.0))
        cross_network = n_nodes > 1
        majority_droppable = eval_frac > 0 and \
            (1.0 - eval_frac) / eval_frac >= 4.0
        prefilter = "bloom" if (cross_network and majority_droppable) \
            else None

    rows = shingle_rows(ds, id_col=id_col, text_col=text_col, ngram=ngram)

    bf = None
    if prefilter == "bloom":
        from .bloom import build_bloom_distributed

        def eval_hashes(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            keep = split_labels(ids, splits, salt) != train_label
            s = b["s"].combine_chunks() if isinstance(
                b["s"], pa.ChunkedArray) else b["s"]
            return pa.table({"h": pa.array(
                fnv1a64(s)[keep].view(np.int64))})

        bf = build_bloom_distributed(
            rows.map_batches(eval_hashes, batch_format="pyarrow"),
            "h", fpr=bloom_fpr)
    elif prefilter is not None:
        raise ValueError(f"unknown prefilter {prefilter!r}")
    import ray as _ray2
    bf_ref = _ray2.put(bf)

    def tag(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        lab = split_labels(ids, splits, salt)
        h = fnv1a64(b["s"].combine_chunks() if isinstance(
            b["s"], pa.ChunkedArray) else b["s"])
        b = (b.append_column("split", pa.array(lab))
              .append_column("_bucket", pa.array(
                  (h % np.uint64(num_buckets)).astype(np.int64))))
        filt = _ray2.get(bf_ref)
        if filt is None:
            return b
        # train rows whose hash cannot be an eval gram never matter; a
        # Bloom has no false negatives, so dropping them is lossless
        keep = (lab != train_label) | filt.contains(h)
        return b.filter(pa.array(keep))

    tagged = rows.map_batches(tag, batch_format="pyarrow")

    def detect(g: pa.Table) -> pa.Table:
        is_train = pc.equal(g["split"], train_label)
        train_s = pc.unique(g.filter(is_train)["s"].combine_chunks())
        ev = g.filter(pc.invert(is_train))
        hits = ev.filter(pc.is_in(ev["s"], value_set=train_s))
        part = hits.group_by(["doc_id"]).aggregate([("s", "count")])
        return pa.table({
            "doc_id": part["doc_id"],
            "n_hits": part["s_count"].combine_chunks().cast(pa.int64()),
        })

    partials = tagged.groupby("_bucket").map_groups(
        detect, batch_format="pyarrow")
    total = bucketed_group_agg(partials, keys=["doc_id"],
                               aggs=[("n_hits", "sum", "n_hits")])

    def attach_split(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"].cast(pa.int64()),
            "split": pa.array(split_labels(ids, splits, salt)),
            "n_hits": b["n_hits"].cast(pa.int64()),
        })

    return total.map_batches(attach_split, batch_format="pyarrow")


def shingle_contamination_sql(table: str, split_sql: str, *,
                              ngram: int = DEFAULT_NGRAM,
                              train_label: str = "train") -> str:
    """Bit-exact DuckDB twin: identical window bounds via ``range()`` (the
    lateral-safe list form — ``generate_series`` rejects lateral column
    parameters in DuckDB 1.x), identical 1-based inclusive truncating list
    slices, identical splits via ``split_sql`` (the splitmix64 HUGEINT
    twin). DuckDB string literals are raw, so the regex is ``'\\s+'`` with
    a single backslash in the emitted SQL."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM {table}
), sh AS (
  SELECT doc_id,
         array_to_string(
           tk[CAST(g AS INTEGER):CAST(g + {ngram - 1} AS INTEGER)],
           ' ') AS s
  FROM toks,
       UNNEST(range(1, GREATEST(len(tk) - {ngram - 1}, 1) + 1)) AS t(g)
), d AS (SELECT DISTINCT doc_id, s FROM sh),
sp AS ({split_sql}),
tr AS (SELECT DISTINCT d.s FROM d JOIN sp USING (doc_id)
       WHERE sp.split = '{train_label}')
SELECT d.doc_id, sp.split, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM d JOIN sp USING (doc_id) JOIN tr USING (s)
WHERE sp.split <> '{train_label}'
GROUP BY 1, 2"""
