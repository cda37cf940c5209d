"""TF-IDF-style distinctive-term extraction: per document, the top-k
tokens ranked by (tf DESC, df ASC, token ASC) — highest in-document
frequency, rarest corpus-wide.

Pure-integer ranking: the classic ``tf·ln(N/df)`` score orders ties the
same way but its transcendental ``ln`` is not reproducible bit-for-bit
across libm implementations, so the operator ranks on the exact (tf, df)
integer pair instead and emits both counts — callers can derive any float
score with a single IEEE op downstream, and the DuckDB twin is exact.

Scale shape — TWO all-to-all exchanges over the (doc, token) row stream:

1. token-hash bucket exchange carrying BOTH row kinds from ONE corpus
   scan: per-batch Arrow ``group_by`` compresses each block to its
   distinct (doc, token, tf) rows plus per-token df partials (a doc's
   rows never span blocks — each doc is one input row); inside a bucket
   group the partials combine to the global df and attach to the tf rows
   via vectorized ``pc.index_in``.
2. doc-hash bucket exchange for the per-document top-k: one lexsort +
   segment-rank kernel per bucket group (no per-doc Python).

A plain ``groupby(token)`` / ``groupby(doc)`` would hit Ray 2.49's
sort-aggregate pathology on these corpus-cardinality keys (see
``agg.bucketed_group_agg``); both exchanges here sort ~B bucket values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..core.hashing import fnv1a64


def tf_df_exchange(docs: ray.data.Dataset, *, id_col: str = "doc_id",
                   text_col: str = "text", num_buckets: int = 64,
                   finish=None) -> ray.data.Dataset:
    """The shared first exchange of the tf·idf family: ONE corpus scan
    emitting per-batch (doc, token, tf) rows plus per-token df partials,
    a token-hash bucket exchange, and — inside each bucket group — the
    global df attached to the tf rows via vectorized ``pc.index_in``.

    ``finish(t)`` (optional) maps the group's attached table
    ``(doc_id, token, tf, df)`` to that group's output inside the SAME
    map_groups call — use it to pre-reduce (e.g. per-doc partial sums)
    without materializing the full (doc, token) row stream between
    exchanges."""

    def tf_and_df_partials(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b[text_col], r"\s+")
        doc = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        ids = b[id_col].take(doc.filter(keep))
        flat = flat.filter(keep)
        tf = (pa.table({"doc_id": ids, "token": flat})
              .group_by(["doc_id", "token"]).aggregate([("token", "count")]))
        dfp = (tf.select(["token"]).group_by("token")
               .aggregate([("token", "count")]))
        n_tf, n_df = len(tf), len(dfp)
        token = pa.concat_arrays([tf["token"].combine_chunks(),
                                  dfp["token"].combine_chunks()])
        out = pa.table({
            "token": token,
            "doc_id": pa.concat_arrays([
                tf["doc_id"].combine_chunks().cast(pa.int64()),
                pa.nulls(n_df, pa.int64())]),
            "n": pa.concat_arrays([
                tf["token_count"].combine_chunks().cast(pa.int64()),
                dfp["token_count"].combine_chunks().cast(pa.int64())]),
            "_side": pa.array(np.r_[np.ones(n_tf, np.int8),
                                    np.zeros(n_df, np.int8)]),
        })
        bucket = fnv1a64(token) % np.uint64(num_buckets)
        return out.append_column("_bucket", pa.array(bucket.astype(np.int64)))

    tagged = docs.map_batches(tf_and_df_partials, batch_format="pyarrow")

    def attach_df(g: pa.Table) -> pa.Table:
        is_tf = pc.equal(g["_side"], pa.scalar(1, pa.int8()))
        tf_rows = g.filter(is_tf)
        dfp = g.filter(pc.invert(is_tf))
        df = dfp.select(["token", "n"]).group_by("token").aggregate(
            [("n", "sum")])
        idx = pc.index_in(tf_rows["token"], value_set=df["token"].combine_chunks())
        if pc.any(pc.is_null(idx)).as_py():
            # every tf row's token has a df partial from its own batch
            raise KeyError("tf_df_exchange: token missing from the "
                           "combined df map — bucket tags diverged")
        out = pa.table({
            "doc_id": tf_rows["doc_id"],
            "token": tf_rows["token"],
            "tf": tf_rows["n"],
            "df": df["n_sum"].combine_chunks().cast(pa.int64()).take(idx),
        })
        return finish(out) if finish is not None else out

    return tagged.groupby("_bucket").map_groups(
        attach_df, batch_format="pyarrow")


def distinctive_terms(docs: ray.data.Dataset, *, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Top-k distinctive whitespace tokens per document (tf DESC, df ASC,
    token ASC). Output columns: ``doc_id, token, tf, df`` (exact int64
    counts; no floats)."""

    def tag_doc_bucket(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_b2", pa.array(doc % num_buckets))

    with_df = tf_df_exchange(docs, id_col=id_col, text_col=text_col,
                             num_buckets=num_buckets, finish=tag_doc_bucket)

    def topk(g: pa.Table) -> pa.Table:
        doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = g["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = g["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        # fixed-width '<U' so the lexsort compares in C (code-point order
        # == DuckDB's binary collation on this ASCII vocabulary)
        token = np.asarray(g["token"].to_pylist(), dtype=str)
        order = np.lexsort((token, dfv, -tf, doc))
        ds_, n = doc[order], len(doc)
        new = np.empty(n, bool)
        if n:
            new[0] = True
            new[1:] = ds_[1:] != ds_[:-1]
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new, pos, -1))
        rank = pos - seg_start
        sel = order[rank < k]
        return pa.table({
            "doc_id": pa.array(doc[sel]),
            "token": pa.array(token[sel].tolist(), type=pa.string()),
            "tf": pa.array(tf[sel]),
            "df": pa.array(dfv[sel]),
        })

    return with_df.groupby("_b2").map_groups(topk, batch_format="pyarrow")


# bitlen lookup: bitlen(q) = searchsorted([1,2,4,...], q, 'right') — exact
# integer log2 floor + 1, no libm (the DuckDB twin uses LENGTH(BIN(q)))
_POW2 = (np.uint64(1) << np.arange(63, dtype=np.uint64)).astype(np.int64)


def token_surprisal(docs: ray.data.Dataset, n_docs: int, *,
                    id_col: str = "doc_id", text_col: str = "text",
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Per-document integer surprisal: ``Σ_tokens tf · bitlen(N // df)``
    — the pure-integer analogue of ``Σ tf·log2(N/df)`` (documents scoring
    high are dominated by corpus-rare vocabulary; low scores mean
    boilerplate). Transcendental-free so the DuckDB twin
    (``LENGTH(BIN(n // df))``) is bit-exact.

    Output: ``doc_id, surprisal, total_tf, n_terms`` (all int64).

    Scale shape: the shared :func:`tf_df_exchange` token-bucket exchange,
    with the per-doc PARTIAL sums computed inside each bucket group (a
    doc's tokens span token buckets, so partials — not rows — flow into
    the second exchange), then one `bucketed_group_agg` over doc_id.
    Both exchanges carry pre-combined partials, never the raw (doc,
    token) stream."""
    from .agg import bucketed_group_agg

    def per_doc_partials(t: pa.Table) -> pa.Table:
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.searchsorted(_POW2, n_docs // dfv, side="right").astype(
            np.int64)
        part = pa.table({
            "doc_id": t["doc_id"],
            "s": pa.array(tf * w),
            "t": pa.array(tf),
            "one": pa.array(np.ones(len(tf), np.int64)),
        })
        g = part.group_by("doc_id").aggregate(
            [("s", "sum"), ("t", "sum"), ("one", "sum")])
        return pa.table({
            "doc_id": g["doc_id"],
            "s": g["s_sum"].combine_chunks().cast(pa.int64()),
            "t": g["t_sum"].combine_chunks().cast(pa.int64()),
            "one": g["one_sum"].combine_chunks().cast(pa.int64()),
        })

    partials = tf_df_exchange(docs, id_col=id_col, text_col=text_col,
                              num_buckets=num_buckets,
                              finish=per_doc_partials)
    return bucketed_group_agg(
        partials, keys=("doc_id",),
        aggs=(("s", "sum", "surprisal"), ("t", "sum", "total_tf"),
              ("one", "sum", "n_terms")))


def bigram_successors(docs: ray.data.Dataset, *, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Top-k successor table — the count side of a bigram language model:
    for every token, its ``k`` most frequent next-tokens with exact int64
    counts (``P(next|token)`` is then one IEEE division away; the twin
    keeps the counts so it stays bit-exact).

    Output: ``token, next_token, n, rank`` (rank 1-based by count DESC,
    next_token ASC).

    Scale shape: per-batch adjacency extraction + partial (w1, w2)
    counts (Arrow group_by — blocks compress before any exchange), ONE
    token-hash bucket exchange, per-bucket combine + the same lexsort /
    segment-rank top-k kernel as `distinctive_terms`. Output rows are
    vocabulary-bounded (≤ k per distinct token)."""

    def pair_partials(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b[text_col], r"\s+")
        doc = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        doc = doc.filter(keep).to_numpy(zero_copy_only=False)
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "_bucket": pa.array([], pa.int64())})
        same = doc[1:] == doc[:-1]
        idx = np.flatnonzero(same)
        w1 = flat.take(pa.array(idx))
        w2 = flat.take(pa.array(idx + 1))
        g = (pa.table({"w1": w1, "w2": w2}).group_by(["w1", "w2"])
             .aggregate([("w2", "count")]))
        bucket = fnv1a64(g["w1"].combine_chunks()) % np.uint64(num_buckets)
        return pa.table({
            "w1": g["w1"], "w2": g["w2"],
            "n": g["w2_count"].combine_chunks().cast(pa.int64()),
            "_bucket": pa.array(bucket.astype(np.int64)),
        })

    partials = docs.map_batches(pair_partials, batch_format="pyarrow")

    def topk(g: pa.Table) -> pa.Table:
        gg = g.select(["w1", "w2", "n"]).group_by(["w1", "w2"]).aggregate(
            [("n", "sum")])
        w1 = np.asarray(gg["w1"].to_pylist(), dtype=str)
        w2 = np.asarray(gg["w2"].to_pylist(), dtype=str)
        n = gg["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((w2, -n, w1))
        ws, m = w1[order], len(w1)
        new = np.empty(m, bool)
        if m:
            new[0] = True
            new[1:] = ws[1:] != ws[:-1]
        pos = np.arange(m, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new, pos, -1))
        rank = pos - seg_start
        sel = order[rank < k]
        return pa.table({
            "token": pa.array(w1[sel].tolist(), type=pa.string()),
            "next_token": pa.array(w2[sel].tolist(), type=pa.string()),
            "n": pa.array(n[sel]),
            "rank": pa.array((rank[rank < k] + 1)),
        })

    return partials.groupby("_bucket").map_groups(
        topk, batch_format="pyarrow")


def sparse_query_topk(docs: ray.data.Dataset, query_tokens: tuple[str, ...],
                      n_docs: int, *, k: int = 20, id_col: str = "doc_id",
                      text_col: str = "text") -> "pa.Table":
    """Sparse (lexical) retrieval: top-k documents for a fixed query token
    set, scored ``Σ_{t∈Q∩doc} tf(doc,t) · bitlen(N // df(t))`` — the
    integer-exact BM25-style rank (same transcendental-free idf convention
    as :func:`token_surprisal`; rarer query terms weigh more, repeated
    ones add linearly). Ties break doc_id ASC. Returns the k-row result
    (driver-bounded by construction).

    Scale shape: the corpus scan filters tokens to the BROADCAST query set
    immediately (per-doc rows bounded by |Q|), so the only all-to-all is a
    ≤|Q|-group token exchange where each group computes its own global df
    (rows are per-doc distinct) and reduces to per-doc partial scores; a
    doc-key `bucketed_group_agg` sums them, and the top-k finishes with
    per-block partial top-k → one ≤(k·blocks)-row coalesced sort. No
    driver pull is corpus-sized."""
    from .agg import bucketed_group_agg

    qset = pa.array(sorted(set(query_tokens)), pa.string())

    def tf_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b[text_col], r"\s+")
        doc = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.and_(pc.not_equal(flat, ""), pc.is_in(flat, value_set=qset))
        ids = b[id_col].take(doc.filter(keep))
        flat = flat.filter(keep)
        t = (pa.table({"doc_id": ids, "token": flat})
             .group_by(["doc_id", "token"]).aggregate([("token", "count")]))
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "token": t["token"],
            "tf": t["token_count"].combine_chunks().cast(pa.int64()),
        })

    rows = docs.map_batches(tf_rows, batch_format="pyarrow")

    def score_token_group(g: pa.Table) -> pa.Table:
        # one group per query token: rows are per-doc distinct, so the
        # group's row count IS the token's global df
        df = len(g)
        w = int(np.searchsorted(_POW2, n_docs // df, side="right"))
        tf = g["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": g["doc_id"],
                         "part": pa.array(tf * np.int64(w))})

    partials = rows.groupby("token").map_groups(
        score_token_group, batch_format="pyarrow")
    scores = bucketed_group_agg(partials, keys=("doc_id",),
                                aggs=(("part", "sum", "score"),))

    def block_topk(b: pa.Table) -> pa.Table:
        s = b["score"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, -s))[:k]
        return pa.table({"doc_id": pa.array(d[order]),
                         "score": pa.array(s[order])})

    head = (scores.map_batches(block_topk, batch_format="pyarrow")
            .repartition(1).map_batches(block_topk, batch_format="pyarrow"))
    return head


def sparse_query_topk_sql(table: str, query_tokens: tuple[str, ...],
                          k: int = 20) -> str:
    """Bit-exact DuckDB twin (``LENGTH(BIN(x))`` = bitlen)."""
    lits = ", ".join("'" + t + "'" for t in sorted(set(query_tokens)))
    return f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {table}),
d AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '')) AS token
  FROM {table}
), tfq AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM d WHERE token IN ({lits}) GROUP BY 1, 2
), dfq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tfq GROUP BY 1
)
SELECT doc_id,
       CAST(SUM(tf * LENGTH(BIN((SELECT n FROM n) // df))) AS BIGINT)
         AS score
FROM tfq JOIN dfq USING (token)
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {k}"""


COLLOC_SCALE = 1 << 20
COLLOC_MIN_SUPPORT = 5


def bigram_collocations(docs: ray.data.Dataset, n_tokens: int, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 30, min_support: int = COLLOC_MIN_SUPPORT,
                        num_buckets: int = 64) -> "pa.Table":
    """Top-k collocations: adjacent token pairs ranked by POINTWISE MUTUAL
    INFORMATION — except PMI's ``log`` never happens: PMI order is the
    order of ``n_xy·N / (n_x·n_y)``, so the score is the exact integer
    ``(n_xy · N · 2^20) // (n_x · n_y)`` (ties (w1, w2) ASC) and the
    DuckDB twin (HUGEINT arithmetic) is bit-identical. Raises loudly if
    the int64 product bound would be crossed (shard N or lower SCALE
    there; the twin's HUGEINT keeps going).

    Scale shape — TWO exchanges, both carrying pre-combined partials:

    1. token-hash buckets carrying THREE row kinds from ONE corpus scan:
       per-batch unigram counts, and each per-batch bigram count TWICE
       (bucketed once by w1, once by w2). In-group, unigram partials
       combine to the global n(w) and attach to the pair rows vectorized.
    2. pair-hash buckets: n_xy sums over side-1 rows only (each batch
       emitted the pair on both sides), n_x/n_y via max (each non-null on
       exactly one side), then the integer score + per-block partial
       top-k → one k-row finish.
    """
    from ..core.hashing import fnv1a64

    def partials(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b[text_col], r"\s+")
        doc = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        doc = doc.filter(keep).to_numpy(zero_copy_only=False)
        uni = (pa.table({"w": flat}).group_by("w")
               .aggregate([("w", "count")]))
        n_uni = len(uni)
        if len(flat) >= 2:
            same = doc[1:] == doc[:-1]
            idx = np.flatnonzero(same)
            pairs = (pa.table({"w1": flat.take(pa.array(idx)),
                               "w2": flat.take(pa.array(idx + 1))})
                     .group_by(["w1", "w2"]).aggregate([("w2", "count")]))
        else:
            pairs = pa.table({"w1": pa.array([], pa.string()),
                              "w2": pa.array([], pa.string()),
                              "w2_count": pa.array([], pa.int64())})
        n_pair = len(pairs)
        empty = pa.nulls(n_uni, pa.string())
        w1 = pa.concat_arrays([
            uni["w"].combine_chunks().cast(pa.string()),
            pairs["w1"].combine_chunks().cast(pa.string()),
            pairs["w1"].combine_chunks().cast(pa.string())])
        w2 = pa.concat_arrays([
            empty, pairs["w2"].combine_chunks().cast(pa.string()),
            pairs["w2"].combine_chunks().cast(pa.string())])
        n = pa.concat_arrays([
            uni["w_count"].combine_chunks().cast(pa.int64()),
            pairs["w2_count"].combine_chunks().cast(pa.int64()),
            pairs["w2_count"].combine_chunks().cast(pa.int64())])
        side = np.r_[np.zeros(n_uni, np.int8), np.ones(n_pair, np.int8),
                     np.full(n_pair, 2, np.int8)]
        # bucket by the token whose count this row needs: w (side 0),
        # w1 (side 1), w2 (side 2)
        bucket_tok = pa.concat_arrays([
            uni["w"].combine_chunks().cast(pa.string()),
            pairs["w1"].combine_chunks().cast(pa.string()),
            pairs["w2"].combine_chunks().cast(pa.string())])
        bucket = (fnv1a64(bucket_tok) % np.uint64(num_buckets)).astype(
            np.int64)
        return pa.table({"w1": w1, "w2": w2, "n": n,
                         "_side": pa.array(side),
                         "_tok": bucket_tok,
                         "_bucket": pa.array(bucket)})

    tagged = docs.map_batches(partials, batch_format="pyarrow")

    def attach(g: pa.Table) -> pa.Table:
        is_uni = pc.equal(g["_side"], pa.scalar(0, pa.int8()))
        uni = (g.filter(is_uni).select(["_tok", "n"]).group_by("_tok")
                .aggregate([("n", "sum")]))
        pairs = g.filter(pc.invert(is_uni))
        idx = pc.index_in(pairs["_tok"],
                          value_set=uni["_tok"].combine_chunks())
        if pc.any(pc.is_null(idx)).as_py():
            raise KeyError("bigram_collocations: pair token missing from "
                           "its own bucket's unigram partials")
        nw = uni["n_sum"].combine_chunks().cast(pa.int64()).take(idx)
        b2 = (fnv1a64(pc.binary_join_element_wise(
            pairs["w1"].combine_chunks().cast(pa.string()),
            pairs["w2"].combine_chunks().cast(pa.string()), "\x1f"))
            % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"w1": pairs["w1"], "w2": pairs["w2"],
                         "n": pairs["n"].cast(pa.int64()),
                         "nw": nw, "_side": pairs["_side"],
                         "_b2": pa.array(b2)})

    half = tagged.groupby("_bucket").map_groups(attach,
                                                batch_format="pyarrow")

    def score(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        s1 = df[df._side == 1].groupby(["w1", "w2"]).agg(
            n_xy=("n", "sum"), n_x=("nw", "max"))
        s2 = df[df._side == 2].groupby(["w1", "w2"]).agg(
            n_y=("nw", "max"))
        m = s1.join(s2, how="inner").reset_index()
        m = m[m.n_xy >= min_support]
        if not len(m):
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n_xy": pa.array([], pa.int64()),
                             "n_x": pa.array([], pa.int64()),
                             "n_y": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        n_xy = m.n_xy.to_numpy().astype(np.int64)
        n_x = m.n_x.to_numpy().astype(np.int64)
        n_y = m.n_y.to_numpy().astype(np.int64)
        if (int(n_xy.max()) * int(n_tokens) > (1 << 62) // COLLOC_SCALE
                or int(n_x.max()) * int(n_y.max()) >= 1 << 63):
            raise OverflowError(
                "bigram_collocations: n_xy·N·SCALE or n_x·n_y would cross "
                "int64 — shard the corpus or lower COLLOC_SCALE (the SQL "
                "twin's HUGEINT keeps going)")
        sc = (n_xy * np.int64(n_tokens) * np.int64(COLLOC_SCALE)) \
            // (n_x * n_y)
        order = np.lexsort((m.w2.to_numpy(), m.w1.to_numpy(), -sc))[:k]
        return pa.table({
            "w1": pa.array(m.w1.to_numpy()[order], pa.string()),
            "w2": pa.array(m.w2.to_numpy()[order], pa.string()),
            "n_xy": pa.array(n_xy[order]), "n_x": pa.array(n_x[order]),
            "n_y": pa.array(n_y[order]), "score": pa.array(sc[order]),
        })

    parts = half.groupby("_b2").map_groups(score, batch_format="pyarrow")

    def final(b: pa.Table) -> pa.Table:
        sc = b["score"].to_numpy(zero_copy_only=False).astype(np.int64)
        w1 = np.asarray(b["w1"].to_pylist(), dtype=str)
        w2 = np.asarray(b["w2"].to_pylist(), dtype=str)
        order = np.lexsort((w2, w1, -sc))[:k]
        return pa.table({
            "w1": pa.array(w1[order].tolist(), pa.string()),
            "w2": pa.array(w2[order].tolist(), pa.string()),
            "n_xy": b["n_xy"].take(pa.array(order)),
            "n_x": b["n_x"].take(pa.array(order)),
            "n_y": b["n_y"].take(pa.array(order)),
            "score": b["score"].take(pa.array(order)),
        })

    return (parts.repartition(1)
                 .map_batches(final, batch_format="pyarrow",
                              batch_size=None))


def bigram_collocations_sql(table: str, n_tokens_sql: str, *, k: int = 30,
                            min_support: int = COLLOC_MIN_SUPPORT) -> str:
    """Bit-exact HUGEINT twin of the integer PMI-order score."""
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
  FROM {table}
), pos AS (
  SELECT doc_id, g.i AS i, t[CAST(g.i AS INTEGER)] AS w,
         len(t) AS m, t
  FROM tk, UNNEST(range(1, len(t) + 1)) AS g(i)
), uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM pos GROUP BY 1
), bi AS (
  SELECT w AS w1, t[CAST(i + 1 AS INTEGER)] AS w2,
         CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM pos WHERE i < m GROUP BY 1, 2
), tot AS (SELECT {n_tokens_sql} AS n)
SELECT w1, w2, n_xy, u1.n AS n_x, u2.n AS n_y,
       CAST(CAST(n_xy AS HUGEINT) * (SELECT n FROM tot) * {COLLOC_SCALE}
            // (CAST(u1.n AS HUGEINT) * u2.n) AS BIGINT) AS score
FROM bi JOIN uni u1 ON u1.w = bi.w1 JOIN uni u2 ON u2.w = bi.w2
WHERE n_xy >= {min_support}
ORDER BY score DESC, w1, w2
LIMIT {k}"""
