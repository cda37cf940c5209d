"""Join stages: broadcast hash join (small side) and bucketed hash join
(both sides large).

Analogues: PyOFS's model↔obs co-registration (SURVEY.md J6,
`validation/data_assimilation_validation.py:119-249`) and study-area /
station lookups (J2) — every reference join has one small side held in
class-attribute caches; here the small side is ``ray.put`` once and joined
per batch with pyarrow's hash join (no shuffle at all). When both sides are
genuinely large, ``bucketed_hash_join`` runs the portable explicit pattern:
add ``bucket = key % B`` to both sides, union with a side tag, group by
bucket, and join each bucket pairwise inside ``map_groups`` — one shuffle,
B-way parallel, hot keys manageable by raising B (document per call).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


class BroadcastJoiner:
    """Actor: join each streaming batch against a broadcast small table."""

    def __init__(self, small_ref, keys: Sequence[str], join_type: str = "inner"):
        small = ray.get(small_ref)
        small = small.combine_chunks() if isinstance(small, pa.Table) else pa.Table.from_pandas(small)
        # strip embedded pandas metadata: it propagates through Table.join
        # into every output batch and makes schemas unhashable (log spam +
        # lost schema-dedup fast path downstream)
        self.small = small.replace_schema_metadata(None)
        self.keys = list(keys)
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.join_type in ("semi", "anti"):
            jt = "left semi" if self.join_type == "semi" else "left anti"
            return batch.join(self.small.select(self.keys), keys=self.keys, join_type=jt)
        return batch.join(self.small, keys=self.keys, join_type=self.join_type)


def _memo_joiner(ref, keys, join_type) -> BroadcastJoiner:
    """Per-worker memoized joiner (`core.memo.memo_broadcast`): the
    prepared small side amortizes across batches and pipelines with no
    actor-pool spin-up, and the shared LRU keeps concurrent joins (e.g.
    Q5's two dimension joins under one union) from evicting each other."""
    from ..core.memo import memo_broadcast

    return memo_broadcast(f"joiner:{ref.hex()}:{','.join(keys)}:{join_type}",
                          lambda: BroadcastJoiner(ref, keys, join_type))


def broadcast_join(ds: ray.data.Dataset, small: pa.Table, keys: Sequence[str],
                   join_type: str = "inner", compute: str = "tasks",
                   concurrency=(1, 8), batch_size: int = 65536) -> ray.data.Dataset:
    ref = ray.put(small)
    if compute == "actors":
        return ds.map_batches(
            BroadcastJoiner,
            fn_constructor_kwargs={"small_ref": ref, "keys": keys,
                                   "join_type": join_type},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
            zero_copy_batch=True,
        )

    keys = list(keys)

    def join_batch(b: pa.Table) -> pa.Table:
        return _memo_joiner(ref, keys, join_type)(b)

    return ds.map_batches(join_batch, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def bucketed_hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
                       key: str, num_buckets: int = 64,
                       suffix: str = "_r",
                       join_type: str = "inner",
                       left_fn=None, right_fn=None,
                       post=None) -> ray.data.Dataset:
    """Explicit partitioned hash join on an int64 key (both sides large).

    One groupby shuffle on ``(key % num_buckets)``; each bucket's left/right
    rows meet in a single ``map_groups`` Arrow hash join. Skewed keys: raise
    ``num_buckets`` (same key always lands in one bucket; the *bucket* is the
    scheduling unit, so B should be ≳ cluster cores).

    ``join_type``: ``"inner"`` (default, output = left ⊕ right columns),
    ``"left_outer"`` (every left row survives; unmatched right payload is
    null), ``"semi"`` / ``"anti"`` (output = left columns only; right side
    acts as a distributed filter — the scale form of a broadcast keep/drop
    set).

    ``left_fn`` / ``right_fn`` / ``post``: optional per-bucket Arrow-table
    transforms fused INTO the single exchange — ``left_fn``/``right_fn``
    rewrite a side's bucket slice before the join (all rows of a key are
    co-located, so a per-``key`` aggregate + HAVING filter is sound here),
    ``post`` rewrites the joined bucket (e.g. a ``partial_group_sums``
    combine). Fusing avoids a second all-to-all after the join — Ray 2.49
    charges seconds of fixed wall per extra exchange in one plan.
    """

    def _as_arrow(ds: ray.data.Dataset) -> tuple[ray.data.Dataset, pa.Schema]:
        s = ds.schema()
        s = s.base_schema if hasattr(s, "base_schema") else s
        if isinstance(s, pa.Schema):
            return ds, s
        # pandas-block upstream (e.g. map_groups): coerce to Arrow blocks
        ds = ds.map_batches(lambda b: b, batch_format="pyarrow")
        s = ds.schema()
        return ds, s.base_schema if hasattr(s, "base_schema") else s

    (left, ls), (right, rs) = _as_arrow(left), _as_arrow(right)
    if ls is None or rs is None:
        side = "left" if ls is None else "right"
        raise ValueError(
            f"bucketed_hash_join: {side} side has no schema (it is empty "
            "with no type information) — materialize it with a typed "
            "schema or skip the join when a side is known-empty")
    lcols, rcols = list(ls.names), list(rs.names)
    # union needs one schema: pad each side with the other's columns as nulls
    all_fields = [pa.field(n, ls.field(n).type if n in lcols else rs.field(n).type)
                  for n in lcols + [c for c in rcols if c not in lcols]]

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            bucket = pa.array(b[key].to_numpy(zero_copy_only=False).astype(np.int64) % num_buckets)
            cols = {}
            for f in all_fields:
                cols[f.name] = (b[f.name] if f.name in b.column_names
                                else pa.nulls(len(b), f.type))
            t = pa.table(cols)
            return t.append_column("_bucket", bucket).append_column(
                "_side", pa.array(np.full(len(b), side, np.int8)))
        return fn

    from .agg import auto_partitions

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))
    both = both.repartition(max(auto_partitions(), num_buckets // 4))

    # Per-bucket join runs in Arrow end to end: the null-padded union
    # columns NEVER pass through pandas float64, so int64 payloads ≥ 2^53
    # (packed cell_ids, 64-bit hashes) stay exact.
    arrow_jt = {"inner": "inner", "left_outer": "left outer",
                "semi": "left semi", "anti": "left anti"}[join_type]

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g["_side"]
        l = g.filter(pc.equal(side, 0)).select(lcols)
        r = g.filter(pc.equal(side, 1)).select(rcols)
        if left_fn is not None:
            l = left_fn(l)
        if right_fn is not None:
            r = right_fn(r)
        if join_type in ("semi", "anti"):
            # membership mask, not an Acero join: identical semantics
            # (dup right keys collapse in the value set) and it carries
            # ANY left payload — Acero refuses list<…> non-key fields
            # (e.g. embedding columns through a bbox semi-filter)
            rk = r[key]
            if isinstance(rk, pa.ChunkedArray):
                rk = rk.combine_chunks()
            mask = pc.is_in(l[key], value_set=rk)
            if join_type == "anti":
                mask = pc.invert(mask)
            out = l.filter(mask)
        else:
            out = l.join(r, keys=key, join_type=arrow_jt,
                         left_suffix="", right_suffix=suffix)
        return post(out) if post is not None else out

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")


def native_hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
                     on: str, right_on: str | None = None,
                     num_partitions: int | None = None,
                     join_type: str = "inner") -> ray.data.Dataset:
    """Ray's built-in hash-partitioned ``Dataset.join`` (available in this
    Ray version) — the native alternative to ``bucketed_hash_join``. Kept
    side-by-side: the explicit bucketed pattern is portable and lets us
    salt hot keys manually; the native join manages partitioning itself."""
    from .agg import auto_partitions

    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions or max(auto_partitions(), 8),
                     on=(on,), right_on=(right_on,) if right_on else None)
