"""Window / session operators over the events log (streaming-shaped
semantics per the Ray guide: ordered, partitioned log → per-key windowing
inside ``groupby(key).map_groups`` over the sorted group).

The reference is strictly batch (SURVEY.md §2.9); these cover the
watermark/session/window semantics a web-scale event pipeline needs. The
ordering assumption is explicit: within a user, events are processed in
``ts`` order (ties don't affect results — gap computation and session
counts are invariant under equal-ts permutations).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ..sources.readers import read_parquet_clean

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize(sf_dir: str) -> ray.data.Dataset:
    """Per-user sessions: a new session starts when the gap to the previous
    event exceeds 30 min. Output: (user_id, session_id, session_start,
    session_end, n_events); session_id is the 1-based per-user ordinal."""
    from ..stages.agg import auto_partitions

    # parallel READ (override_num_blocks) instead of a repartition before
    # the groupby: the groupby shuffle spreads reduce work over the input
    # block count, so splitting at the read gets the same map_groups
    # parallelism without an extra all-to-all (~1s fixed wall saved)
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"],
                            override_num_blocks=auto_partitions())

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        ts = g.ts.to_numpy("datetime64[us]").astype(np.int64)
        brk = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            brk[1:] = (ts[1:] - ts[:-1] > SESSION_GAP_US).astype(np.int64)
        sid = np.cumsum(brk)
        out = pd.DataFrame({"user_id": g.user_id.to_numpy(), "session_id": sid,
                            "ts": g.ts.to_numpy()})
        agg = out.groupby(["user_id", "session_id"], as_index=False).agg(
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("ts", "size"))
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


# Above this edge-row count (2 rows per batch) the boundary fix-up walk runs
# distributed (groupby(user).map_groups) instead of on the driver. ~100k
# edge rows walk in well under a second driver-side; beyond that the
# per-user decomposition keeps driver cost O(fix-up rows), not O(batches).
EDGE_DRIVER_ROWS = 200_000


def _walk_user_edges(u: int, g: pd.DataFrame, BK: list[str]) -> tuple[list, list, list]:
    """Boundary fix-up walk for ONE user's batch-edge rows (sorted by
    batch key): returns (offsets, drops, merged) for that user.

    Correctness of the decomposition: the global sort on (user_id, ts)
    makes each user's events — and therefore the batches they span —
    contiguous, so chains only ever merge *within* a user and ordinal
    offsets are per-user state. A user's walk needs nothing from any other
    user, which makes the fix-up embarrassingly parallel by user (the
    scale form runs it inside ``groupby(user_id).map_groups``)."""
    offsets: list[tuple] = []    # (user, *bk4, off)
    drops: list[tuple] = []      # (*bk4, user, sid0)
    merged: list[dict] = []
    cum = 0                      # u's finalized sessions so far
    chain: dict | None = None    # u's open tail chain

    def close(c):
        # "pieces" counts constituent summaries — >1 means a real merge
        if c is not None and c["pieces"] > 1:
            drops.extend(c["keys"])
            merged.append(c)

    for bk, gb in g.groupby(BK, sort=True):
        f, l = gb.iloc[0], gb.iloc[-1]
        is_first = int(bk[0]) == u    # u is the batch's first user
        is_last = int(bk[2]) == u     # u is the batch's last user
        if is_first and is_last:
            # sorted order: first AND last row are u's ⇒ the whole batch is
            # u's. Group shapes (see block_sessions comment): a real
            # (first, last) pair has edge flags {1, 2}; one row is one
            # single-session batch; ≥2 rows all edge=3 are content-identical
            # single-session batches from one equal-(user, ts) run —
            # collapse them into one pseudo batch with summed n_events.
            collided = len(gb) >= 2 and (gb.edge == 3).all()
            single = len(gb) == 1 or collided
            f_n = int(gb.n_events.sum()) if collided else int(f.n_events)
            f_pieces = len(gb) if collided else 1
            merged_first = (chain is not None
                            and int(f.start_us) - chain["end"] <= SESSION_GAP_US)
            if merged_first:
                chain["end"] = int(gb.end_us.max()) if collided else int(f.end_us)
                chain["n"] += f_n
                chain["keys"].append((*bk, u, int(f.sid0)))
                chain["pieces"] += f_pieces
            else:
                close(chain)
                chain = None
            off_f = cum - (1 if merged_first else 0)
            if off_f:
                offsets.append((u, *bk, off_f))
            cum += int(l.sid0) - (1 if merged_first else 0)
            if single and merged_first:
                pass                                # chain already spans it
            else:
                if merged_first:
                    close(chain)                    # chain ended inside batch
                chain = {"user": u,
                         "start": int(f.start_us) if collided else int(l.start_us),
                         "end": int(gb.end_us.max()) if collided else int(l.end_us),
                         "n": f_n if collided else int(l.n_events),
                         "ordinal": cum,
                         "pieces": f_pieces,
                         "keys": [(*bk, u, int(l.sid0))]}
        elif is_first:
            # u's run ends inside this batch; u's only edge row is the
            # batch's first session
            merged_first = (chain is not None
                            and int(f.start_us) - chain["end"] <= SESSION_GAP_US)
            if merged_first:
                chain["end"] = int(f.end_us)
                chain["n"] += int(f.n_events)
                chain["keys"].append((*bk, u, int(f.sid0)))
                chain["pieces"] += 1
            off_f = cum - (1 if merged_first else 0)
            if off_f:
                offsets.append((u, *bk, off_f))
            close(chain)                            # u never recurs
            chain = None
        else:
            # u's run begins in this batch (u is its last user); u's edge
            # row is the batch's last session, which opens u's chain
            if cum:
                offsets.append((u, *bk, cum))
            cum += int(l.sid0)
            chain = {"user": u, "start": int(l.start_us), "end": int(l.end_us),
                     "n": int(l.n_events), "ordinal": cum, "pieces": 1,
                     "keys": [(*bk, u, int(l.sid0))]}
    close(chain)
    return offsets, drops, merged


_FIX_COLS = ["kind", "user_id", "bk_user", "bk_ts", "bk_lu", "bk_lt",
             "sid0", "off", "start", "end", "n", "ordinal"]


def _walk_user_frame(g: pd.DataFrame, BK: list[str]) -> pd.DataFrame:
    """map_groups wrapper: one user's edge rows → wide fix-up rows
    (kind 0 = offset, 1 = drop, 2 = merged chain)."""
    g = g.sort_values(BK + ["sid0"])
    u = int(g.user_id.iloc[0])
    offsets, drops, merged = _walk_user_edges(u, g, BK)
    rows = []
    for (uu, b1, b2, b3, b4, off) in offsets:
        rows.append((0, uu, b1, b2, b3, b4, 0, off, 0, 0, 0, 0))
    for (b1, b2, b3, b4, uu, sid0) in drops:
        rows.append((1, uu, b1, b2, b3, b4, sid0, 0, 0, 0, 0, 0))
    for m in merged:
        rows.append((2, m["user"], 0, 0, 0, 0, 0, 0,
                     m["start"], m["end"], m["n"], m["ordinal"]))
    if not rows:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in _FIX_COLS})
    return pd.DataFrame(rows, columns=_FIX_COLS).astype(np.int64)


def _split_fix_frame(fix: pd.DataFrame, BK: list[str]) -> tuple[list, list, list]:
    if fix.empty or "kind" not in fix.columns:  # zero-row pull loses columns
        return [], [], []
    offsets = [tuple(r) for r in fix[fix.kind == 0][
        ["user_id", *BK, "off"]].to_numpy()]
    drops = [tuple(r) for r in fix[fix.kind == 1][
        [*BK, "user_id", "sid0"]].to_numpy()]
    merged = [{"user": r[0], "start": r[1], "end": r[2], "n": r[3],
               "ordinal": r[4]}
              for r in fix[fix.kind == 2][
                  ["user_id", "start", "end", "n", "ordinal"]].to_numpy()]
    return offsets, drops, merged


def sessionize_sorted(sf_dir: str, batch_size: int | None = None,
                      edge_mode: str = "auto") -> ray.data.Dataset:
    """Scale-form sessionization — identical output to ``sessionize`` with
    no per-group Python (`map_groups` pays ~0.5 ms/group; at 10⁸ users that
    is a day of pure overhead):

    1. one global sort on (user_id, ts): every user's events form a
       contiguous run, and each map batch is a contiguous slice of the
       global order;
    2. per-batch **vectorized** sessionization over all users at once
       (numpy cumsum over break flags) → one summary row per session,
       labeled with the batch key (the batch's first (user, ts) — a
       content-derived label that sorts batches in data order);
    3. boundary fix-up decomposed BY USER: only a batch's first/last
       session can merge across a boundary, and only its first/last *user*
       can need ordinal re-basing (any other user is fully contained in the
       batch) — and because the sort keeps each user's run contiguous, the
       ≤2 edge rows per batch interact only within a user. Small edge sets
       walk per-user on the driver; above ``EDGE_DRIVER_ROWS`` the same
       walk runs distributed in ``groupby(user).map_groups``
       (``edge_mode="grouped"``), so the driver never scans O(batches)
       rows. Merges and per-(user, batch) ordinal offsets broadcast into
       one final vectorized pass over the session-bounded summaries.
    """
    from ..stages.agg import auto_partitions

    # parallel read: the sort's map side spreads over input blocks
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"],
                            override_num_blocks=auto_partitions())
    sorted_ds = ds.sort(["user_id", "ts"])

    def block_sessions(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = (b["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        n = len(u)
        empty = {"user_id": np.array([], np.int64)}
        if n == 0:
            return pa.table({
                "user_id": pa.array(empty["user_id"]), "sid0": pa.array([], pa.int64()),
                "start_us": pa.array([], pa.int64()), "end_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()), "edge": pa.array([], pa.int8()),
                "bk_user": pa.array([], pa.int64()), "bk_ts": pa.array([], pa.int64()),
                "bk_lu": pa.array([], pa.int64()), "bk_lt": pa.array([], pa.int64())})
        brk = np.ones(n, dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > SESSION_GAP_US)
        first = np.nonzero(brk)[0]
        last = np.append(first[1:] - 1, n - 1)
        su, st, en = u[first], t[first], t[last]
        cnt = (last - first + 1).astype(np.int64)
        # per-user session ordinal within the batch (1-based)
        new_user = np.ones(len(su), dtype=bool)
        new_user[1:] = su[1:] != su[:-1]
        user_first = np.maximum.accumulate(
            np.where(new_user, np.arange(len(su)), 0))
        sid0 = np.arange(len(su)) - user_first + 1
        edge = np.zeros(len(su), dtype=np.int8)
        edge[0] |= 1
        edge[-1] |= 2
        # 4-component batch key (first AND last row): two distinct batches
        # can only collide on all four when both lie inside one run of
        # identical (user, ts) rows — and then both are content-identical
        # single-session batches the walk can safely collapse. A 2-component
        # key would silently merge different batches of a same-timestamp
        # burst (bot traffic) and lose sessions.
        return pa.table({
            "user_id": pa.array(su), "sid0": pa.array(sid0),
            "start_us": pa.array(st), "end_us": pa.array(en),
            "n_events": pa.array(cnt), "edge": pa.array(edge),
            "bk_user": pa.array(np.full(len(su), u[0])),
            "bk_ts": pa.array(np.full(len(su), t[0])),
            "bk_lu": pa.array(np.full(len(su), u[-1])),
            "bk_lt": pa.array(np.full(len(su), t[-1])),
        })

    # session summaries are events/avg-session-length — bounded, pinned for
    # the two consumers (edge pull + final pass)
    # batch_size=None → one batch per sorted block; any batch size is
    # correct (batches are contiguous slices of the sort order) — tests use
    # small sizes to force sessions and users across many boundaries
    partials = sorted_ds.map_batches(block_sessions, batch_format="pyarrow",
                                     batch_size=batch_size,
                                     zero_copy_batch=True).materialize()

    import pyarrow.compute as pc
    BK = ["bk_user", "bk_ts", "bk_lu", "bk_lt"]
    edges_ds = partials.map_batches(
        lambda b: b.filter(pc.greater(b["edge"], 0)), batch_format="pyarrow")

    edges = None
    if edge_mode == "auto":
        # ONE bounded probe pull decides the mode and doubles as the
        # driver-mode edge set (a separate count() would cost a full extra
        # pipeline launch — seconds of fixed wall in Ray 2.49)
        probe = edges_ds.limit(EDGE_DRIVER_ROWS + 1).to_pandas()
        if len(probe) <= EDGE_DRIVER_ROWS:
            edge_mode, edges = "driver", probe
        else:
            edge_mode = "grouped"
    if edge_mode == "driver":
        if edges is None:
            edges = edges_ds.to_pandas()
        edges = edges.sort_values(BK + ["sid0"]).reset_index(drop=True)
        offsets, drops, merged = [], [], []
        # boundary interactions never cross users (the sort keeps a user's
        # run contiguous), so the walk decomposes per user; run each user's
        # tiny group inline
        for u, g in edges.groupby("user_id", sort=False):
            o, d, m = _walk_user_edges(int(u), g, BK)
            offsets.extend(o); drops.extend(d); merged.extend(m)
    else:
        # distributed form: the same per-user walk inside
        # groupby(user).map_groups — no serial driver scan over batches;
        # the driver receives only the emitted fix-up rows (bounded by
        # sessions that actually cross a batch boundary)
        fix = (edges_ds.groupby("user_id")
               .map_groups(lambda g: _walk_user_frame(g, BK),
                           batch_format="pandas").to_pandas())
        offsets, drops, merged = _split_fix_frame(fix, BK)

    def _typed(cols: list[str], rows: list[tuple]) -> pd.DataFrame:
        if rows:
            return pd.DataFrame(rows, columns=cols)
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})

    off_df = _typed(["user_id", *BK, "off"], offsets)
    drop_df = _typed([*BK, "user_id", "sid0"], drops).assign(_drop=True)
    import ray as _ray
    fix_ref = _ray.put((off_df, drop_df))

    def apply_fix(df: pd.DataFrame) -> pd.DataFrame:
        off_df, drop_df = _ray.get(fix_ref)
        df = df.merge(off_df, on=["user_id", *BK], how="left")
        df = df.merge(drop_df, on=[*BK, "user_id", "sid0"], how="left")
        df = df[df._drop.isna()]
        sid = (df.sid0 + df.off.fillna(0)).astype(np.int64)
        return pd.DataFrame({
            "user_id": df.user_id.to_numpy(),
            "session_id": sid.to_numpy(),
            "session_start": df.start_us.to_numpy().astype("datetime64[us]"),
            "session_end": df.end_us.to_numpy().astype("datetime64[us]"),
            "n_events": df.n_events.to_numpy(),
        })

    out = partials.map_batches(apply_fix, batch_format="pandas")
    if merged:
        mdf = pd.DataFrame({
            "user_id": np.array([m["user"] for m in merged], np.int64),
            "session_id": np.array([m["ordinal"] for m in merged], np.int64),
            "session_start": np.array([m["start"] for m in merged],
                                      np.int64).astype("datetime64[us]"),
            "session_end": np.array([m["end"] for m in merged],
                                    np.int64).astype("datetime64[us]"),
            "n_events": np.array([m["n"] for m in merged], np.int64),
        })
        out = out.union(ray.data.from_pandas(mdf))
    return out


SESSIONIZE_SQL = """
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM e
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, session_id
"""


def top_order_per_customer(sf_dir: str) -> ray.data.Dataset:
    """Per-customer argmax order (max price, tie → lowest orderkey) — the
    per-group 'first record' semantics (SURVEY.md O3) as a distributed
    two-stage argmax (`stages.composite.last_per_cell`)."""
    from ..stages.composite import last_per_cell

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        neg = pc.negate(b["o_orderkey"])
        return b.append_column("neg_orderkey", neg)

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = last_per_cell(ds, keys=("o_custkey",),
                        order_cols=("o_totalprice", "neg_orderkey"),
                        payload_cols=("o_orderkey", "o_totalprice"))
    return out.select_columns(["o_custkey", "o_orderkey", "o_totalprice"])


def top3_orders_per_customer(sf_dir: str) -> ray.data.Dataset:
    """Per-customer top-3 orders by price (grouped top-k, k>1 — the
    'first k records per group' generalization of O3)."""
    import pyarrow.compute as pc

    from ..stages.composite import topk_per_key

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderkey", "o_totalprice"])
    ds = ds.map_batches(
        lambda b: b.append_column("neg_orderkey", pc.negate(b["o_orderkey"])),
        batch_format="pyarrow", zero_copy_batch=True)
    out = topk_per_key(ds, keys=("o_custkey",),
                       order_cols=("o_totalprice", "neg_orderkey"), k=3,
                       payload_cols=("o_orderkey", "o_totalprice"))
    return out.select_columns(["o_custkey", "o_orderkey", "o_totalprice", "rank"])


TOP3_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rank
  FROM orders
) WHERE rank <= 3
"""


TOP_ORDER_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""


# ---------------------------------------------- peak interval concurrency
def events_max_concurrency(sf_dir: str,
                           window_s: int = 300) -> ray.data.Dataset:
    """Peak number of simultaneously-active events per type, where each
    event occupies the half-open interval [ts, ts + window_s).

    Classic boundary sweep: flat-expand each event into (+1 at start,
    -1 at end) boundary rows in ``map_batches`` (no driver work), then one
    per-type kernel (event_type is low-cardinality, so a plain
    groupby.map_groups group holds one type's boundaries): lexsort by
    (t, delta) — ends BEFORE starts at equal t, the half-open convention —
    cumsum, max. Ties among equal (t, delta) rows can permute freely: the
    running sum passes through the same value set, so the max is
    order-invariant (and the SQL window twin agrees for the same reason).
    """
    import pyarrow.compute as pc

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])
    w_us = window_s * 1_000_000

    def boundaries(b: pa.Table) -> pa.Table:
        t = b["ts"].cast(pa.int64())
        n = len(b)
        return pa.table({
            "event_type": pa.concat_arrays(
                [b["event_type"].combine_chunks()] * 2),
            "t": pa.concat_arrays([t.combine_chunks(),
                                   pc.add(t, w_us).combine_chunks()]),
            "d": pa.array(np.r_[np.ones(n, np.int64),
                                -np.ones(n, np.int64)]),
        })

    def sweep(g: pa.Table) -> pa.Table:
        t = g["t"].to_numpy(zero_copy_only=False)
        d = g["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, t))
        peak = int(np.cumsum(d[order]).max())
        return pa.table({"event_type": g["event_type"][:1],
                         "peak": pa.array([peak], pa.int64())})

    return (ds.map_batches(boundaries, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("event_type")
              .map_groups(sweep, batch_format="pyarrow"))


EVENTS_MAX_CONCURRENCY_SQL = """
WITH b AS (
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS t,
         CAST(1 AS BIGINT) AS d
  FROM events
  UNION ALL
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) + 300000000,
         CAST(-1 AS BIGINT)
  FROM events
), c AS (
  SELECT event_type,
         SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS cur
  FROM b
)
SELECT event_type, CAST(MAX(cur) AS BIGINT) AS peak
FROM c GROUP BY event_type"""


# ------------------------------------- in-session co-occurrence pairs
def session_type_pairs(sf_dir: str) -> ray.data.Dataset:
    """Market-basket co-occurrence over sessions: for every session (same
    30-min-gap rule as `sessionize`), the set of DISTINCT event types it
    contains, expanded to unordered type pairs and counted corpus-wide —
    the "viewed-together" analysis of a training-data event log.

    Shape: ONE hash-bucket exchange on user_id co-locates each user's
    events; a single vectorized kernel per bucket sessionizes (lexsort +
    gap cumsum), dedupes (session, type), and enumerates pairs with the
    same segment arithmetic as co-citation (`stages.cocite._pair_rows` —
    reused verbatim on integer type codes). The pair vocabulary is
    |types|² (tiny), so the count finish is one coalesced Arrow combine,
    not a Ray groupby.
    """
    import pyarrow.compute as pc

    from ..stages.cocite import _pair_rows

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])
    num_buckets = 32

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.and_(pc.is_valid(b["user_id"]),
                                     pc.is_valid(b["ts"])),
                             pc.is_valid(b["event_type"])))
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("_bucket", pa.array(u % num_buckets))

    def kernel(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = (g["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        typ = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, u))
        u, t, typ = u[order], t[order], typ[order]
        brk = np.ones(len(u), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > SESSION_GAP_US)
        sess = np.cumsum(brk) - 1          # bucket-local session index
        utyp, code = np.unique(typ, return_inverse=True)
        # distinct (session, type): sessions are bucket-local ints, so one
        # packed int64 key dedup suffices (|types| < 2^20 by assert)
        assert len(utyp) < (1 << 20)
        packed = sess.astype(np.int64) * (1 << 20) + code
        uniq = np.unique(packed)
        pairs = _pair_rows(pa.table({
            "dst": pa.array(uniq >> 20),
            "src": pa.array(uniq & ((1 << 20) - 1))}))
        cnt = pa.table({
            "a": pairs["src_a"], "b": pairs["src_b"], "one": pairs["one"]
        }).group_by(["a", "b"]).aggregate([("one", "sum")])
        ai = cnt["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bi = cnt["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "type_a": pa.array(utyp[ai]), "type_b": pa.array(utyp[bi]),
            "n": cnt["one_sum"].cast(pa.int64())})

    parts = (ds.map_batches(tag, batch_format="pyarrow")
               .groupby("_bucket").map_groups(kernel,
                                              batch_format="pyarrow"))

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["type_a", "type_b"]).aggregate([("n", "sum")])
        return pa.table({"type_a": g["type_a"], "type_b": g["type_b"],
                         "n": g["n_sum"].cast(pa.int64())})

    return parts.repartition(1).map_batches(combine, batch_format="pyarrow",
                                            batch_size=None)


SESSION_TYPE_PAIRS_SQL = """
WITH e AS (
  SELECT user_id, ts, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), d AS (
  SELECT DISTINCT user_id, sid, event_type FROM s
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n
FROM d a JOIN d b ON a.user_id = b.user_id AND a.sid = b.sid
                 AND a.event_type < b.event_type
GROUP BY 1, 2
"""


# ------------------------------------- trapezoidal time-weighted average
def events_time_weighted_avg(sf_dir: str) -> ray.data.Dataset:
    """Per-user TIME-weighted mean of `value` (trapezoidal rule over the
    event timeline) — the irregular-sampling average an observation
    time-series needs (PyOFS averages model fields over uneven pass
    times; a plain AVG over-weights bursts):
        twa = Σ (vᵢ+vᵢ₊₁)·Δtᵢ / (2·Σ Δtᵢ),  Δt in whole seconds.

    Exactness: values as int64 cents, Δt as int64 floor-seconds
    (per-interval floor in BOTH engines), one IEEE division after the
    final reduce; users whose events span < 1 s are excluded (den 0) in
    both. A float-shadow check raises loudly if the int64 accumulator
    could have wrapped (DuckDB runs the same sum in HUGEINT).

    Shape: ONE hash-bucket exchange on user_id, then a single vectorized
    lexsort + adjacent-diff + `np.add.at` kernel per bucket — no per-user
    Python, same pattern as the as-of/sessionize family.
    """
    import pyarrow.compute as pc

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "value"])
    num_buckets = 32

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["user_id"]),
                             pc.is_valid(b["ts"])))
        v_c = pc.cast(pc.round(
            pc.multiply(pc.fill_null(b["value"], 0.0), pa.scalar(100.0)),
            round_mode="half_towards_infinity"), pa.int64())
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": b["user_id"], "ts": b["ts"],
                         "event_id": b["event_id"], "v_c": v_c,
                         "_bucket": pa.array(u % num_buckets)})

    def kernel(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = (g["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["v_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, t, u))
        u, t, v = u[order], t[order], v[order]
        same = u[1:] == u[:-1]
        dt_s = (t[1:] - t[:-1]) // 1_000_000
        term = (v[:-1] + v[1:]) * dt_s
        uu, inv = np.unique(u, return_inverse=True)
        num = np.zeros(len(uu), np.int64)
        den = np.zeros(len(uu), np.int64)
        np.add.at(num, inv[:-1][same], term[same])
        np.add.at(den, inv[:-1][same], dt_s[same])
        # float shadow: loud failure instead of silent int64 wrap
        shadow = np.zeros(len(uu), np.float64)
        np.add.at(shadow, inv[:-1][same], term[same].astype(np.float64))
        if len(num) and np.abs(num.astype(np.float64) - shadow).max() > 2**32:
            raise OverflowError("events_time_weighted_avg: per-user "
                                "trapezoid sum left int64 range — rescale "
                                "Δt or shard the timeline")
        keep = den > 0
        return pa.table({"user_id": pa.array(uu[keep]),
                         "twa_num": pa.array(num[keep]),
                         "dur_s": pa.array(den[keep])})

    per_user = (ds.map_batches(tag, batch_format="pyarrow")
                  .groupby("_bucket").map_groups(kernel,
                                                 batch_format="pyarrow"))

    def finish(b: pa.Table) -> pa.Table:
        num = b["twa_num"].to_numpy(zero_copy_only=False).astype(np.int64)
        den = b["dur_s"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"], "twa_num": b["twa_num"],
            "dur_s": b["dur_s"],
            "twa": pa.array(num.astype(np.float64)
                            / (2 * den).astype(np.float64))})

    return per_user.map_batches(finish, batch_format="pyarrow",
                                zero_copy_batch=True)


EVENTS_TWA_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT) AS v_c
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), p AS (
  SELECT user_id, v_c,
         LEAD(v_c) OVER w AS v2,
         (epoch_us(LEAD(ts) OVER w) - epoch_us(ts)) // 1000000 AS dt_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), a AS (
  SELECT user_id,
         SUM((CAST(v_c AS HUGEINT) + v2) * dt_s) AS num,
         SUM(dt_s) AS den
  FROM p WHERE v2 IS NOT NULL GROUP BY 1
)
SELECT user_id, CAST(num AS BIGINT) AS twa_num, CAST(den AS BIGINT) AS dur_s,
       CAST(num AS DOUBLE) / CAST(2 * den AS DOUBLE) AS twa
FROM a WHERE den > 0
"""
