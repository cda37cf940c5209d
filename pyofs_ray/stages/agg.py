"""Two-stage (partial → final) grouped aggregation with hot-key salting.

Analogue of PyOFS's per-cell time means (`wcofs.py:420-453` `data_average`,
`hf_radar.py:136-173` nan-aware mean, `wcofs.py:1234-1279` ensemble mean —
SURVEY.md A1–A3), built the way a 100 TB shuffle has to be built
(SURVEY.md §7.3, north_rule "explicit two-stage shuffle"):

1. **partial**: inside stateless ``map_batches``, collapse each Arrow batch to
   one row per key with ``pyarrow.Table.group_by`` — sums/counts only, in
   fixed int64 where exactness matters. A 64 Ki-row batch over ~2k hot cells
   shrinks ~30×, so the wide exchange moves partials, not rows.
2. **final**: ``ds.groupby(keys).aggregate(Sum(...))`` over the partials.
   Derived ratios (means) are computed *after* the final sum, so results are
   reduction-order-invariant (ints) — bit-stable vs the DuckDB oracle.

Salting: the partial stage already neutralizes skew *within* a batch (a batch
contributes ≤1 row per key regardless of how hot the key is), which is exactly
the salted-combiner effect — the implicit salt is the block id. For
float-valued payloads at extreme skew, ``salt_mod`` adds an explicit
``salt = page_key % salt_mod`` to the partial key so one hot cell's partials
spread over ``salt_mod`` reducers before the tiny second pass.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum


def partial_group_sums(
    batch: pa.Table,
    keys: Sequence[str],
    int_sum_cols: Sequence[str] = (),
    count_name: str = "doc_count",
    salt_col: str | None = None,
    salt_mod: int = 0,
) -> pa.Table:
    """Collapse one batch to per-key partial sums + count (vectorized)."""
    cols = list(keys) + [c for c in int_sum_cols if c in batch.column_names]
    t = batch.select(cols)
    group_keys = list(keys)
    if salt_col is not None and salt_mod > 1:
        salt = pc.cast(pc.subtract(batch[salt_col], pc.multiply(
            pc.divide(batch[salt_col], salt_mod), salt_mod)), pa.int64())
        t = t.append_column("_salt", salt)
        group_keys = group_keys + ["_salt"]
    aggs = [(c, "sum") for c in int_sum_cols] + [(keys[0], "count")]
    g = t.group_by(group_keys).aggregate(aggs)
    out_cols: dict[str, pa.Array] = {}
    for k in group_keys:  # includes _salt when salted
        out_cols[k] = g[k]
    for c in int_sum_cols:
        out_cols[f"{c}_sum"] = g[f"{c}_sum"].cast(pa.int64())
    out_cols[count_name] = g[f"{list(keys)[0]}_count"].cast(pa.int64())
    return pa.table(out_cols)


def auto_partitions() -> int:
    """Shuffle partition count for *partial-combined* (key-bounded) data.

    Ray's groupby inherits the upstream block count, so a 64-block read of a
    tiny table pays a 64×64 shuffle of near-empty partitions (~5 s of pure
    task scheduling). Partial outputs are bounded by key cardinality, not
    input rows — coalesce them to a CPU-scaled count before the exchange.
    Scales with the cluster: ~CPU/4 reduce partitions (hundreds on a
    256-node cluster, each holding |keys|/N rows).
    """
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus // 4)


_BUCKET_PHI = np.uint64(0x9E3779B97F4A7C15)


def _col_words(col) -> np.ndarray:
    """(n, k) uint64 word matrix per key column — int64 keys as one word,
    string/binary keys as their fixed-width padded bytes (all vectorized;
    downstream group_by handles the native type)."""
    v = col.to_numpy(zero_copy_only=False)
    if v.dtype.kind in "iu":
        return v.astype(np.int64).view(np.uint64)[:, None]
    s = v.astype("S")  # fixed-width bytes, NUL-padded
    n, w = len(s), s.dtype.itemsize
    k = max(1, -(-w // 8))
    buf = np.zeros((n, k * 8), np.uint8)
    if w:
        buf[:, :w] = s.view(np.uint8).reshape(n, w)
    return buf.view(np.uint64)


def hash_bucket_tag(b: pa.Table, keys: Sequence[str],
                    num_buckets: int) -> pa.Table:
    """Append the deterministic `_bucket = hash(keys) % B` column — the
    one hash every same-key-same-bucket exchange in the repo shares
    (process-independent, unlike Python's salted `hash`).

    PADDING-INVARIANT (r5 fix): `_col_words` pads strings to the BATCH
    max width, so an unconditional mix let trailing NUL words mutate the
    hash — the same key hashed differently in batches with different
    max string lengths (measured: a 4-row frequent-segment table vs the
    corpus segment stream bucketed the identical segment apart, so a
    co-partitioned join matched nothing; the same effect could split a
    key's partials across buckets in any variable-width string exchange
    whenever batch maxima diverge). Zero words are skipped, so the hash
    depends only on the key's own bytes."""
    nb = np.uint64(num_buckets)
    h = np.zeros(len(b), np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            for j_col in _col_words(b[k]).T:
                hj = (h ^ j_col) * _BUCKET_PHI
                hj ^= hj >> np.uint64(29)
                h = np.where(j_col != 0, hj, h)
    return b.append_column(
        "_bucket", pa.array(((h >> np.uint64(3)) % nb).astype(np.int64)))


def bucketed_group_agg(ds: ray.data.Dataset, keys: Sequence[str],
                       aggs: Sequence[tuple[str, str, str]],
                       num_buckets: int | None = None,
                       coalesce: bool = False) -> ray.data.Dataset:
    """Exact per-key aggregation over int64 key column(s) via an explicit
    hash-bucket exchange: tag ``hash(keys) % B`` per batch, ONE
    ``groupby(_bucket)`` over ~CPU distinct values, Arrow ``group_by``
    combine inside each bucket group.

    ``aggs``: (column, fn, out_name) triples, fn ∈ {"sum", "min", "max"}
    (the decomposable aggregates — combine-of-partials == global).

    Why not ``groupby(keys).aggregate(...)``: Ray 2.49's sort-based
    aggregate degrades badly on HIGH-CARDINALITY keys (measured on a 406k
    partial-row / 351k-key gram-df table: 50 s direct, 11 s after
    repartition, 0.9 s this shape — the sort's boundary sampling and
    per-key merge dominate). A same-key-same-bucket exchange with ~B
    distinct sort values keeps the all-to-all trivial and every combine
    vectorized. The caller should pre-combine per batch
    (``partial_group_sums``) when batches repeat keys."""
    if num_buckets is None:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)
    keys = list(keys)
    aggs = list(aggs)

    def tag(b: pa.Table) -> pa.Table:
        return hash_bucket_tag(b, keys, num_buckets)

    def combine(g: pa.Table) -> pa.Table:
        gg = g.group_by(keys).aggregate([(c, fn) for c, fn, _ in aggs])
        cols = {k: gg[k] for k in keys}
        for c, fn, out in aggs:
            col = gg[f"{c}_{fn}"]
            if pa.types.is_integer(col.type):
                col = col.cast(pa.int64())
            cols[out] = col
        return pa.table(cols)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    if coalesce:
        # the sort exchange inherits the upstream block count: a 64-block
        # read of PARTIAL rows pays a 64-wide shuffle of near-empty
        # partitions (~1.4 s measured on dedup_exact at sf0.1). When the
        # input is pre-combined per batch (key-bounded partials), coalesce
        # to ~CPU/4 blocks first, same as two_stage_cell_agg. Keep False
        # (default) for row-sized inputs (raw gram/edge/message tables) —
        # there the repartition moves the whole dataset a second time.
        tagged = tagged.repartition(auto_partitions())
    return tagged.groupby("_bucket").map_groups(combine,
                                                batch_format="pyarrow")


def bucketed_int64_group_sum(ds: ray.data.Dataset, key: str,
                             sum_cols: Sequence[str],
                             num_buckets: int | None = None
                             ) -> ray.data.Dataset:
    """Single-key all-sum convenience wrapper of `bucketed_group_agg`."""
    return bucketed_group_agg(ds, [key], [(c, "sum", c) for c in sum_cols],
                              num_buckets=num_buckets)


def two_stage_cell_agg(
    ds: ray.data.Dataset,
    keys: Sequence[str] = ("cell_id",),
    int_sum_cols: Sequence[str] = ("n_chars",),
    count_name: str = "doc_count",
    batch_size: int = 65536,
    agg_partitions: int | None = None,
) -> ray.data.Dataset:
    """rows → one row per key with ``<count_name>`` and ``<col>_sum`` columns.

    Partial combine in map_batches, coalesce the (key-bounded) partials,
    then a small groupby-sum shuffle.
    """
    keys = list(keys)
    partial = ds.map_batches(
        lambda b: partial_group_sums(b, keys, int_sum_cols, count_name),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    partial = partial.repartition(agg_partitions or auto_partitions())
    sum_aggs = [Sum(f"{c}_sum", alias_name=f"{c}_sum") for c in int_sum_cols]
    sum_aggs.append(Sum(count_name, alias_name=count_name))
    return partial.groupby(keys).aggregate(*sum_aggs)


def salted_two_stage_agg(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    int_sum_cols: Sequence[str],
    salt_col: str,
    salt_mod: int = 16,
    count_name: str = "doc_count",
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Explicit salted aggregation for hot keys (north_rule; SURVEY.md §7.3):

    1. per-batch partial on ``(keys…, salt)`` where ``salt = salt_col %
       salt_mod`` — a hot key's partials spread over ``salt_mod`` reducers;
    2. shuffle-sum on the salted key (the wide exchange; no reducer sees a
       whole hot key);
    3. tiny final groupby on the bare keys (≤ |keys| × salt_mod rows).

    Results equal the unsalted path exactly (int sums are associative);
    needed when per-key state is large (float payloads, sketches) or when a
    single key would overflow one reducer. ``two_stage_cell_agg`` already
    neutralizes count/sum skew via batch-local combining — this is the
    heavier artillery, kept explicit and tested.
    """
    keys = list(keys)
    partial = ds.map_batches(
        lambda b: partial_group_sums(b, keys, int_sum_cols, count_name,
                                     salt_col=salt_col, salt_mod=salt_mod),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)
    mid_aggs = [Sum(f"{c}_sum", alias_name=f"{c}_sum") for c in int_sum_cols]
    mid_aggs.append(Sum(count_name, alias_name=count_name))
    mid = (partial.repartition(auto_partitions())
           .groupby([*keys, "_salt"]).aggregate(*mid_aggs))
    final_aggs = [Sum(f"{c}_sum", alias_name=f"{c}_sum") for c in int_sum_cols]
    final_aggs.append(Sum(count_name, alias_name=count_name))
    return mid.drop_columns(["_salt"]).groupby(keys).aggregate(*final_aggs)


def coalesced_int_sum_finish(ds: ray.data.Dataset, keys: Sequence[str],
                             sum_cols: Sequence[str]) -> ray.data.Dataset:
    """Final reduce for key-bounded int64 partials WITHOUT a Ray groupby.

    Round-4 rule (CLAUDE.md): a ≤~2k-key finish must not pay the sort-based
    all-to-all (~4 s fixed at sf0.1) — coalesce the partials to one block
    and run a single Arrow ``group_by`` sum. Partials come from
    ``partial_group_sums`` fused into an upstream exchange (e.g. a
    ``bucketed_hash_join(post=...)``), so total input here is
    ≤ num_buckets × |keys| rows. Output columns keep the input names.
    """
    keys, sum_cols = list(keys), list(sum_cols)

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(c, "sum") for c in sum_cols])
        cols = {k: g[k] for k in keys}
        for c in sum_cols:
            cols[c] = g[f"{c}_sum"].cast(pa.int64())
        return pa.table(cols)

    return ds.repartition(1).map_batches(final, batch_format="pyarrow",
                                         batch_size=None,
                                         zero_copy_batch=True)


def exact_topk(ds: ray.data.Dataset, cols: Sequence[str],
               descending: Sequence[bool], k: int) -> ray.data.Dataset:
    """Global ORDER BY <numeric cols…> LIMIT k without a Sort all-to-all.

    Per-block lexsort top-k (np.lexsort — exact keys, so ties are
    deterministic IF ``cols`` is a total order, e.g. ends in a unique id),
    then a coalesced final top-k over the ≤ k×blocks survivors. Payload
    columns ride along via ``Table.take``. Replaces ``ds.sort(...).limit(k)``
    whose sort moves EVERY row through an exchange to keep k of them.
    Sort keys must be int/uint/float with no NaN/null (descending is
    implemented by negation).
    """
    cols, desc = list(cols), list(descending)

    def block_topk(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        keys = []
        for c, d in zip(cols, desc):
            a = t[c].to_numpy(zero_copy_only=False)
            if a.dtype.kind not in "iuf":
                raise TypeError(f"exact_topk: non-numeric sort key {c!r} "
                                f"({a.dtype}); sort on the exact integer "
                                "or float column instead")
            if a.dtype.kind == "u":  # negation must not wrap
                a = a.astype(np.int64)
            keys.append(-a if d else a)
        order = np.lexsort(tuple(reversed(keys)))[:k]
        return t.take(pa.array(order))

    head = ds.map_batches(block_topk, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    return head.repartition(1).map_batches(block_topk,
                                           batch_format="pyarrow",
                                           batch_size=None,
                                           zero_copy_batch=True)


def add_mean_column(batch: pa.Table, sum_col: str, count_col: str, out: str) -> pa.Table:
    """mean = int_sum / count, computed once after the final reduce —
    deterministic (single IEEE division, no float accumulation)."""
    mean = pc.divide(pc.cast(batch[sum_col], pa.float64()), pc.cast(batch[count_col], pa.float64()))
    return batch.append_column(out, mean)


def grouped_mode(ds: ray.data.Dataset, key: str, value_col: str,
                 num_buckets: int | None = None) -> ray.data.Dataset:
    """Per-``key`` modal value with a deterministic tie-break (count DESC,
    value ASC) — the categorical analogue of `grouped_low_quantiles`
    (PyOFS reduces per-cell fields to representative values the same
    way; here the representative is the most frequent category).

    Output: ``key, mode, mode_count`` (value dtype preserved).

    Scale shape: per-batch partial (key, value) counts compress each
    block before ONE key-hash bucket exchange; the per-bucket finish
    combines partials and picks each key's argmax with a vectorized
    lexsort + segment-head kernel. Exchange payload is bounded by
    distinct (key, value) pairs per block, never raw rows."""
    if num_buckets is None:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)

    def partial(b: pa.Table) -> pa.Table:
        h = (b.select([key, value_col]).group_by([key, value_col])
             .aggregate([(value_col, "count")]))
        k = h[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "k": h[key].cast(pa.int64()),
            "v": h[value_col],
            "c": h[f"{value_col}_count"].combine_chunks().cast(pa.int64()),
            "_bucket": pa.array(k % num_buckets),
        })

    def finish(g: pa.Table) -> pa.Table:
        gg = g.select(["k", "v", "c"]).group_by(["k", "v"]).aggregate(
            [("c", "sum")])
        k = gg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = gg["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        varr = gg["v"].combine_chunks()
        # order: key ASC, count DESC, value ASC → first row per key wins.
        # value sorts in C as fixed-width '<U'/native (code-point order ==
        # DuckDB binary collation on ASCII vocabularies; ints are native)
        v_np = varr.to_numpy(zero_copy_only=False)
        if v_np.dtype == object:
            v_np = v_np.astype(str)
        order = np.lexsort((v_np, -c, k))
        ks = k[order]
        head = np.empty(len(ks), bool)
        if len(ks):
            head[0] = True
            head[1:] = ks[1:] != ks[:-1]
        pick = order[head]
        return pa.table({key: pa.array(k[pick]),
                         "mode": varr.take(pa.array(pick)),
                         "mode_count": pa.array(c[pick])})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_bucket").map_groups(finish, batch_format="pyarrow"))


def grouped_mode_sql(table: str, key: str, value_col: str) -> str:
    return f"""
WITH h AS (
  SELECT {key} AS k, {value_col} AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
)
SELECT k AS {key}, v AS mode, c AS mode_count FROM (
  SELECT k, v, c,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY c DESC, v ASC) AS rn
  FROM h
) WHERE rn = 1"""
