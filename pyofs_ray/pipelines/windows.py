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
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

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

    from ..stages.agg import auto_partitions

    return (ds.repartition(auto_partitions())
              .groupby("user_id").map_groups(per_user, batch_format="pandas"))


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


TOP_ORDER_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""
