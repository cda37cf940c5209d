"""Data-placement operators: rendezvous (HRW) shard assignment and
max-min-fair (water-filling) budget allocation.

Both answer cluster-operations questions the 100 TB deployment hits
before any query runs: WHERE does a key live when the shard count
changes (HRW — only ~1/(S+1) of keys move on grow, vs ~all under
modulo), and HOW MUCH of a bounded budget does each producer get
(water-filling — saturate small producers, share the rest equally).

Reference capability analogue: PyOFS's per-dataset output partitioning
and download quotas (`state/manifest`, SURVEY.md K6/O2) are the static
forms of these two decisions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..core.hashing import splitmix64
from ..core.sqlgen_sample import MOD64, _mulmod64, to_u64

_GOLDEN = 0x9E3779B97F4A7C15
_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB


def _salts(num_shards: int) -> np.ndarray:
    """Deterministic per-shard salts (uint64)."""
    return splitmix64(np.arange(1, num_shards + 1, dtype=np.uint64)
                      * np.uint64(_GOLDEN))


def hrw_assign(keys: np.ndarray, num_shards: int) -> np.ndarray:
    """Highest-random-weight shard per key: argmax_j of
    splitmix64(key ^ salt_j); ties (never in practice, but the twin
    must agree) go to the LOWEST shard — np.argmax's first occurrence."""
    st = _salts(num_shards)
    w = splitmix64(keys.astype(np.int64).view(np.uint64)[:, None]
                   ^ st[None, :])
    return np.argmax(w, axis=1).astype(np.int64)


def hrw_shard_plan(ds: ray.data.Dataset, num_shards: int,
                   key_col: str = "doc_id") -> ray.data.Dataset:
    """Shard-population + regrow-movement report: per shard under S
    shards — ``n_docs``, ``n_after`` (population under S+1) and
    ``n_moved`` (keys this shard loses on grow). The HRW property makes
    movement one-directional: existing shards' weights are unchanged,
    so a key moves iff the NEW shard out-bids its old winner — every
    mover lands on shard S, and total movement ≈ N/(S+1).

    ONE execution: both assignments per batch (2 vectorized mixes),
    per-shard partials (≤ S+1 keys), coalesced finish."""

    def partials(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        a = hrw_assign(k, num_shards)
        a2 = hrw_assign(k, num_shards + 1)
        n = np.zeros(num_shards + 1, np.int64)
        n2 = np.zeros(num_shards + 1, np.int64)
        mv = np.zeros(num_shards + 1, np.int64)
        np.add.at(n, a, 1)
        np.add.at(n2, a2, 1)
        np.add.at(mv, a[a != a2], 1)
        sh = np.arange(num_shards + 1, dtype=np.int64)
        return pa.table({"shard": pa.array(sh), "n_docs": pa.array(n),
                         "n_after": pa.array(n2), "n_moved": pa.array(mv)})

    def finish(b: pa.Table) -> pa.Table:
        sh = b["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {c: np.zeros(num_shards + 1, np.int64)
               for c in ("n_docs", "n_after", "n_moved")}
        for c in out:
            np.add.at(out[c], sh,
                      b[c].to_numpy(zero_copy_only=False))
        return pa.table({"shard": pa.array(
            np.arange(num_shards + 1, dtype=np.int64)),
            **{c: pa.array(v) for c, v in out.items()}})

    return (ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1)
            .map_batches(finish, batch_format="pyarrow", batch_size=None))


def _mix_expr_ctes(pairs_cte: str, key_expr: str) -> str:
    """splitmix64 of ``key_expr`` (a HUGEINT in [0, 2^64)) over the rows
    of ``pairs_cte`` — expression-level version of
    `sqlgen_sample._mix_ctes` for cross-join key spaces."""
    return f"""
m0 AS (SELECT *, (({key_expr}) + {_GOLDEN}) % {MOD64} AS z0 FROM {pairs_cte}),
m1 AS (SELECT *, {_mulmod64('xor(z0, z0 >> 30)', _C1)} AS z1 FROM m0),
m2 AS (SELECT *, {_mulmod64('xor(z1, z1 >> 27)', _C2)} AS z2 FROM m1),
mw AS (SELECT *, xor(z2, z2 >> 31) AS w FROM m2)"""


def hrw_shard_plan_sql(num_shards: int, table: str = "documents",
                       key_col: str = "doc_id") -> str:
    def assign_cte(tag: str, s: int) -> str:
        salts = ", ".join(f"({j}, {int(v)})"
                          for j, v in enumerate(_salts(s)))
        return f"""
s{tag}(j, salt) AS (VALUES {salts}),
p{tag} AS (
  SELECT {key_col} AS k, j,
         xor({to_u64(key_col)}, CAST(salt AS HUGEINT)) AS key0
  FROM {table}, s{tag}
),
{_mix_expr_ctes(f'p{tag}', 'key0').replace('m0', f'{tag}m0')
            .replace('m1', f'{tag}m1').replace('m2', f'{tag}m2')
            .replace('mw', f'{tag}mw')},
a{tag} AS (
  SELECT k, j AS shard FROM (
    SELECT k, j, ROW_NUMBER() OVER
      (PARTITION BY k ORDER BY w DESC, j ASC) AS rk
    FROM {tag}mw) WHERE rk = 1
)"""

    return f"""
WITH {assign_cte('a', num_shards)},
{assign_cte('b', num_shards + 1)},
j AS (SELECT aa.k, aa.shard AS sa, ab.shard AS sb
      FROM aa JOIN ab ON aa.k = ab.k),
sh AS (SELECT UNNEST(generate_series(0, {num_shards})) AS shard)
SELECT sh.shard,
       CAST(COALESCE(SUM(CASE WHEN j.sa = sh.shard THEN 1 END), 0)
            AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(CASE WHEN j.sb = sh.shard THEN 1 END), 0)
            AS BIGINT) AS n_after,
       CAST(COALESCE(SUM(CASE WHEN j.sa = sh.shard AND j.sa <> j.sb
                          THEN 1 END), 0) AS BIGINT) AS n_moved
FROM sh LEFT JOIN j ON j.sa = sh.shard OR j.sb = sh.shard
GROUP BY sh.shard
"""


def waterfill_alloc(hosts: np.ndarray, counts: np.ndarray,
                    budget: int) -> np.ndarray:
    """Max-min-fair integer allocation: every host gets
    ``min(count, t)`` for the highest waterline ``t`` that fits the
    budget; the remainder goes +1 each to the first R unsaturated hosts
    in host order. Vectorized closed form over the SORTED count prefix
    (no per-level scan)."""
    n = len(counts)
    if n == 0:
        return np.zeros(0, np.int64)
    c = counts.astype(np.int64)
    total = int(c.sum())
    if total <= budget:
        return c.copy()
    cs = np.sort(c)
    P = np.cumsum(cs)
    # waterline candidates between sorted breakpoints: saturating the i
    # smallest hosts and levelling the rest uses P[i-1] + (n-i)*t tokens
    Pprev = np.concatenate([[0], P[:-1]])
    rem = n - np.arange(n)
    # max t if exactly the first i hosts are saturated (t < cs[i])
    t_cand = (budget - Pprev) // rem
    feasible = t_cand < cs  # waterline below the next breakpoint
    # the TRUE i is the first feasible one (smallest unsaturated count
    # above the line); with total > budget one always exists
    i = int(np.flatnonzero(feasible)[0])
    t = int(t_cand[i])
    base = np.minimum(c, t)
    r = budget - int(base.sum())
    alloc = base.copy()
    unsat = np.flatnonzero(c > t)
    order = np.argsort(hosts[unsat].astype(str), kind="stable")
    alloc[unsat[order[:r]]] += 1
    return alloc


def crawl_budget_waterfill(per_host: ray.data.Dataset,
                           budget: int) -> ray.data.Dataset:
    """(host, cnt) → (host, cnt, alloc) under a global fetch budget.

    The waterline and remainder R are scalars derivable from the count
    DISTRIBUTION; the per-host table coalesces for the finish (bounded
    by #hosts — the same documented judgment as the repo's other
    per-host finals; at an extreme host count, compute t from the count
    histogram and broadcast, keeping only the R-winner selection
    global)."""

    def finish(b: pa.Table) -> pa.Table:
        hosts = np.asarray(b["host"].to_pylist(), dtype=object)
        cnt = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(hosts.astype(str), kind="stable")
        hosts, cnt = hosts[order], cnt[order]
        alloc = waterfill_alloc(hosts, cnt, budget)
        return pa.table({"host": pa.array(list(hosts), pa.string()),
                         "cnt": pa.array(cnt),
                         "alloc": pa.array(alloc)})

    return per_host.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def crawl_budget_waterfill_sql(budget: int) -> str:
    """Composed after a CTE named ``hc(host, cnt)``. The level scan
    (generate_series × SUM(LEAST)) is the twin's readability form of
    the same waterline."""
    return f"""
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS sc FROM hc),
lv AS (
  SELECT t FROM (
    SELECT UNNEST(generate_series(0, (SELECT MAX(cnt) FROM hc))) AS t
  ) WHERE (SELECT SUM(LEAST(cnt, t)) FROM hc) <= {budget}
),
wl AS (SELECT CASE WHEN (SELECT sc FROM tot) <= {budget}
              THEN (SELECT MAX(cnt) FROM hc)
              ELSE (SELECT MAX(t) FROM lv) END AS t),
base AS (
  SELECT h.host, h.cnt, LEAST(h.cnt, wl.t) AS base, wl.t AS t
  FROM hc h, wl
),
r AS (SELECT {budget} - CAST(SUM(base) AS BIGINT) AS rem FROM base),
ranked AS (
  SELECT host, cnt, base, t,
         CASE WHEN cnt > t THEN ROW_NUMBER() OVER
           (PARTITION BY (cnt > t) ORDER BY host) ELSE NULL END AS rk
  FROM base
)
SELECT host, cnt,
       CAST(base + CASE WHEN (SELECT sc FROM tot) <= {budget} THEN 0
         WHEN rk IS NOT NULL AND rk <= (SELECT rem FROM r) THEN 1
         ELSE 0 END AS BIGINT) AS alloc
FROM ranked
"""
