"""Hierarchical rollups, funnel conversion, grouped correlation, and
time-decayed counts — analytic extensions of the reference's reporting
layer (PyOFS aggregates per-cell/per-dataset summaries at several
granularities, e.g. `wcofs.py:420-453` daily → monthly means; here the
hierarchy is (region, nation) / (event day) and the engine shape is the
same two-stage partial → single-exchange reduce).

Exactness: every reduce is int64 (cents / scaled / bit-weights); floats
are derived by single IEEE ops AFTER the final sum, so each query is
bit-identical to its DuckDB twin under any parallel schedule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..sources.readers import read_parquet_clean
from ..stages.agg import bucketed_group_agg, two_stage_cell_agg
from ..stages.join import broadcast_join
from .relational import _cents


# ------------------------------------------------ ROLLUP(r_name, n_name)
def orders_rollup_revenue(sf_dir: str) -> ray.data.Dataset:
    """Revenue rollup over the (region, nation) hierarchy in ONE exchange.

    orders ⋈ customer→nation→region (broadcast small side) → two-stage
    int-cents sum at the FINEST level (r_name, n_name); the region
    subtotals and the grand total are then derived from that ≤|nation|-row
    table in a bounded coalesced finish — never a second pass over the
    fact table (GROUP BY ROLLUP as partial reuse, SURVEY.md §7.3).
    Subtotal rows carry NULL keys exactly like the SQL ROLLUP.
    """
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    nr = nation.join(region, keys="n_regionkey", right_keys="r_regionkey")
    lookup = cust.join(nr.select(["n_nationkey", "n_name", "r_name"]),
                       keys="c_nationkey", right_keys="n_nationkey")
    lookup = lookup.select(["c_custkey", "r_name", "n_name"]) \
                   .rename_columns(["o_custkey", "r_name", "n_name"])

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b["o_custkey"],
                         "price_c": _cents(b["o_totalprice"])})

    joined = broadcast_join(orders.map_batches(prep, batch_format="pyarrow"),
                            lookup, keys=["o_custkey"])
    agg = two_stage_cell_agg(joined, keys=("r_name", "n_name"),
                             int_sum_cols=("price_c",),
                             count_name="order_count")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # bounded by |nation| rows: expand the three rollup levels locally
        fine = df[["r_name", "n_name", "price_c_sum", "order_count"]]
        reg = (fine.groupby("r_name", sort=False, as_index=False)
               [["price_c_sum", "order_count"]].sum())
        reg["n_name"] = None
        tot = pd.DataFrame({
            "r_name": [None], "n_name": [None],
            "price_c_sum": [fine.price_c_sum.sum()],
            "order_count": [fine.order_count.sum()]})
        allr = pd.concat([fine, reg, tot], ignore_index=True)
        return pd.DataFrame({
            "r_name": allr.r_name, "n_name": allr.n_name,
            "revenue": allr.price_c_sum.to_numpy(np.int64) / 100.0,
            "order_count": allr.order_count.astype(np.int64)})

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


ORDERS_ROLLUP_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


# ------------------------------------------------------ funnel conversion
_US_PER_DAY = 86_400_000_000
_FUNNEL_BASE_US = 1_704_067_200_000_000  # TIMESTAMP '2024-01-01' epoch µs


def events_funnel(sf_dir: str) -> ray.data.Dataset:
    """signup → purchase conversion: per-user first-touch times via a
    two-stage MIN (per-batch `pa.Table.group_by` pre-combine, then one
    hash-bucket exchange on user_id), then a streaming count of converted
    users (signup strictly before purchase). The per-user table never
    lands on the driver — the finish is partial counts → 3-int sum.
    """
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["user_id"]),
                             pc.is_valid(b["ts"])))
        et = b["event_type"]
        keep = pc.or_(pc.equal(et, "signup"), pc.equal(et, "purchase"))
        b = b.filter(keep)
        ts_us = pc.cast(b["ts"], pa.int64())
        is_s = pc.equal(b["event_type"], "signup")
        t = pa.table({
            "user_id": b["user_id"],
            "s_us": pc.if_else(is_s, ts_us, pa.scalar(None, pa.int64())),
            "p_us": pc.if_else(is_s, pa.scalar(None, pa.int64()), ts_us)})
        # per-batch pre-combine: ≤1 row per user leaves the batch
        g = t.group_by("user_id").aggregate([("s_us", "min"),
                                             ("p_us", "min")])
        return pa.table({"user_id": g["user_id"], "s_us": g["s_us_min"],
                         "p_us": g["p_us_min"]})

    per_user = bucketed_group_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["user_id"],
        aggs=[("s_us", "min", "s_us"), ("p_us", "min", "p_us")],
        coalesce=True)

    def partial_counts(b: pa.Table) -> pa.Table:
        # all-Arrow int64 (no float round-trip: µs epochs exceed 2^53).
        # pc.less is NULL when either side is; pc.sum skips NULLs.
        s, p = b["s_us"], b["p_us"]
        conv = pc.sum(pc.cast(pc.less(s, p), pa.int64())).as_py() or 0
        return pa.table({
            "users_signup": pa.array([len(s) - s.null_count], pa.int64()),
            "users_purchase": pa.array([len(p) - p.null_count], pa.int64()),
            "users_converted": pa.array([int(conv)], pa.int64())})

    def final(b: pa.Table) -> pa.Table:
        return pa.table({
            "users_signup": pa.array(
                [pc.sum(b["users_signup"]).as_py() or 0], pa.int64()),
            "users_purchase": pa.array(
                [pc.sum(b["users_purchase"]).as_py() or 0], pa.int64()),
            "users_converted": pa.array(
                [pc.sum(b["users_converted"]).as_py() or 0], pa.int64())})

    return (per_user.map_batches(partial_counts, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


EVENTS_FUNNEL_SQL = """
WITH m AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IN ('signup', 'purchase')
  GROUP BY user_id)
SELECT CAST(COUNT(s) AS BIGINT) AS users_signup,
       CAST(COUNT(p) AS BIGINT) AS users_purchase,
       CAST(SUM(CASE WHEN s IS NOT NULL AND p IS NOT NULL AND s < p
                     THEN 1 ELSE 0 END) AS BIGINT) AS users_converted
FROM m
"""


# ------------------------------------------- grouped Pearson correlation
def lineitem_qty_disc_corr(sf_dir: str) -> ray.data.Dataset:
    """Pearson corr(l_quantity, l_discount) per l_returnflag from six
    exact int64 moment sums (Σx, Σy, Σx², Σy², Σxy, n in cents) collected
    in one two-stage exchange; the correlation is derived from the exact
    integers by a fixed IEEE expression after the final reduce, so the
    result is reduction-order invariant and bit-equal to the SQL twin.

    Magnitude bound: x ≤ 5·10³ cents, y ≤ 10² cents ⇒ Σx², n·Σxy stay
    < 2⁶³ up to ~10¹⁰ rows; beyond that, widen to two-limb sums.
    """
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        x = _cents(b["l_quantity"]).to_numpy(zero_copy_only=False)
        y = _cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "sx": pa.array(x), "sy": pa.array(y),
            "sxx": pa.array(x * x), "syy": pa.array(y * y),
            "sxy": pa.array(x * y)})

    agg = two_stage_cell_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=("l_returnflag",),
        int_sum_cols=("sx", "sy", "sxx", "syy", "sxy"),
        count_name="n")

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy()
        sx = b["sx_sum"].to_numpy()
        sy = b["sy_sum"].to_numpy()
        sxx = b["sxx_sum"].to_numpy()
        syy = b["syy_sum"].to_numpy()
        sxy = b["sxy_sum"].to_numpy()
        cov = (n * sxy - sx * sy).astype(np.float64)
        vx = (n * sxx - sx * sx).astype(np.float64)
        vy = (n * syy - sy * sy).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = cov / (np.sqrt(vx) * np.sqrt(vy))
        mask = (vx > 0) & (vy > 0)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "corr_qty_disc": pa.array(
                np.where(mask, corr, np.nan), pa.float64(),
                mask=~mask),
            "n": pa.array(n, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


LINEITEM_CORR_SQL = """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qx) AS BIGINT) AS sx, CAST(SUM(dx) AS BIGINT) AS sy,
         CAST(SUM(qx * qx) AS BIGINT) AS sxx,
         CAST(SUM(dx * dx) AS BIGINT) AS syy,
         CAST(SUM(qx * dx) AS BIGINT) AS sxy
  FROM (SELECT l_returnflag,
               CAST(ROUND(l_quantity * 100) AS BIGINT) AS qx,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS dx
        FROM lineitem)
  GROUP BY l_returnflag)
SELECT l_returnflag,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                    * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
            END AS corr_qty_disc,
       n
FROM s
"""


# --------------------------------------------------- time-decayed counts
def events_decayed_counts(sf_dir: str) -> ray.data.Dataset:
    """Recency-weighted activity per event type: weight 2^(day index from
    2024-01-01) as an exact int64 bit-shift (the integer analogue of an
    exponential half-life of one day), summed two-stage. Deterministic
    and overflow-guarded: the prep raises if any day index leaves the
    0..62 window rather than silently wrapping.
    """
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["ts"]),
                             pc.is_valid(b["event_type"])))
        ts_us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = (ts_us - _FUNNEL_BASE_US) // _US_PER_DAY
        if len(day) and (day.min() < 0 or day.max() > 62):
            raise ValueError(
                f"decay day index out of the exact int64 window: "
                f"[{day.min()}, {day.max()}]")
        return pa.table({"event_type": b["event_type"],
                         "w": pa.array(np.int64(1) << day, pa.int64())})

    agg = two_stage_cell_agg(ds.map_batches(prep, batch_format="pyarrow"),
                             keys=("event_type",), int_sum_cols=("w",),
                             count_name="n")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"],
                         "decayed_weight": b["w_sum"].cast(pa.int64()),
                         "n": b["n"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


EVENTS_DECAYED_SQL = f"""
SELECT event_type,
       CAST(SUM(CAST(1 AS BIGINT) << CAST(
           (CAST(epoch_us(ts) AS BIGINT) - {_FUNNEL_BASE_US})
             // {_US_PER_DAY} AS BIGINT)) AS BIGINT) AS decayed_weight,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE ts IS NOT NULL AND event_type IS NOT NULL
GROUP BY event_type
"""


# ----------------------------------------- JSON props field extraction
_PROPS_RE = r'"k": (-?\d+)'


def events_props_stats(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured extraction: parse the integer ``k`` field out of
    the JSON ``props`` column (RE2 capture on both engines — the
    vectorized form of per-record metadata decoding; PyOFS parses
    per-granule attribute strings the same way) and aggregate per
    event_type. All int64; one low-cardinality exchange."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "props"])

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], _PROPS_RE.replace(
            "(-?\\d+)", "(?P<v>-?\\d+)"))
        k = pc.struct_field(m, "v").cast(pa.int64())
        if pc.any(pc.is_null(k)).as_py():
            raise ValueError("events_props_stats: a props row did not "
                             "match the '\"k\": <int>' shape")
        return pa.table({"event_type": b["event_type"], "k": k,
                         "one": pa.array(np.ones(len(b), np.int64))})

    return bucketed_group_agg(
        ev.map_batches(extract, batch_format="pyarrow"),
        ["event_type"],
        [("k", "sum", "k_sum"), ("k", "min", "k_min"),
         ("k", "max", "k_max"), ("one", "sum", "n")])


EVENTS_PROPS_SQL = f"""
WITH x AS (
  SELECT event_type,
         CAST(regexp_extract(props, '{_PROPS_RE}', 1) AS BIGINT) AS k
  FROM events
)
SELECT event_type, CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(MIN(k) AS BIGINT) AS k_min, CAST(MAX(k) AS BIGINT) AS k_max,
       CAST(COUNT(*) AS BIGINT) AS n
FROM x GROUP BY event_type
"""


# --------------------------------------------------- day × type pivot
PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_day_type_pivot(sf_dir: str) -> ray.data.Dataset:
    """Crosstab: one row per day with a count column per event type
    (``n_click … n_view``) — the wide reporting shape. One-hot int
    columns per batch, then a single day-keyed two-stage sum; unknown
    event types raise (the column set is the schema contract)."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def onehot(b: pa.Table) -> pa.Table:
        d = pc.divide(b["ts"].cast(pa.int64()),
                      pa.scalar(_US_PER_DAY, pa.int64()))
        et = b["event_type"]
        cols = {"day": d}
        seen = pa.array(np.zeros(len(b), bool))
        for t in PIVOT_TYPES:
            m = pc.equal(et, t)
            seen = pc.or_(seen, m)
            cols[f"n_{t}"] = m.cast(pa.int64())
        if not pc.all(seen).as_py() and len(b):
            raise ValueError("events_day_type_pivot: event_type outside "
                             f"the pivot vocabulary {PIVOT_TYPES}")
        return pa.table(cols)

    agg = two_stage_cell_agg(ev.map_batches(onehot, batch_format="pyarrow"),
                             keys=("day",),
                             int_sum_cols=tuple(f"n_{t}" for t in PIVOT_TYPES),
                             count_name="n_total")
    return agg.map_batches(
        lambda t: pa.table({"day": t["day"], "n_total": t["n_total"],
                            **{f"n_{x}": t[f"n_{x}_sum"]
                               for x in PIVOT_TYPES}}),
        batch_format="pyarrow")


EVENTS_PIVOT_SQL = f"""
SELECT CAST(epoch_us(ts) AS BIGINT) // {_US_PER_DAY} AS day,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in PIVOT_TYPES)}
FROM events GROUP BY 1
"""


# -------------------------------------------------- retention cohorts
def events_retention_cohorts(sf_dir: str) -> ray.data.Dataset:
    """Cohort retention matrix: users grouped by the day of their FIRST
    event (the cohort), counted as active per whole-day offset since —
    the canonical product-analytics rollup (and the temporal analogue of
    the reference's per-pass coverage audits: membership derived from
    each key's earliest record).

    Scale shape — four exchanges, all key-bucketed, no driver state:
    day-index map → `bucketed_group_agg` min per user (first day) →
    `bucketed_hash_join` back onto the event stream (both sides keyed
    user_id) → exact (user, cohort, offset) DISTINCT via a second
    `bucketed_group_agg` (one output row per triple, immune to Ray
    slicing a group's output across blocks) → small (cohort, offset)
    count. All int64 day arithmetic (µs // day on non-negative epochs),
    bit-exact vs the twin."""
    from ..stages.join import bucketed_hash_join

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def days(b: pa.Table) -> pa.Table:
        d = pc.divide(b["ts"].cast(pa.int64()),
                      pa.scalar(_US_PER_DAY, pa.int64()))
        return pa.table({"user_id": b["user_id"].cast(pa.int64()), "d": d})

    dd = ev.map_batches(days, batch_format="pyarrow")
    firsts = bucketed_group_agg(dd, ["user_id"], [("d", "min", "f")])
    joined = bucketed_hash_join(dd, firsts, key="user_id")

    def triple(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "cohort_day": b["f"],
            "days_since": pc.subtract(b["d"], b["f"]),
        })

    tri = joined.map_batches(triple, batch_format="pyarrow")
    distinct = bucketed_group_agg(
        tri, ["user_id", "cohort_day", "days_since"],
        [("user_id", "min", "_x")])
    agg = two_stage_cell_agg(distinct, keys=("cohort_day", "days_since"),
                             int_sum_cols=(), count_name="n_users")
    return agg.map_batches(
        lambda t: t.select(["cohort_day", "days_since", "n_users"]),
        batch_format="pyarrow")


WAU_WINDOW = 7  # trailing days per window


def events_rolling_active_users(sf_dir: str,
                                window: int = WAU_WINDOW
                                ) -> ray.data.Dataset:
    """Rolling distinct active users (WAU): for every day, the number of
    distinct users with ≥1 event in the trailing ``window`` days — the
    rolling COUNT DISTINCT that naive windowing cannot pre-aggregate
    (distincts don't sum across days).

    Scale shape: distinct (user, day) FIRST (bucketed — collapses each
    user's intra-day events before any expansion), then a ``window``-fold
    flat expansion ``day+j``, a second bucketed distinct over the
    expanded pairs (a user active on several days inside one window must
    count once), and a small per-day count. Rows exchanged are bounded
    by ``window × active-user-days``, never raw events."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def days(b: pa.Table) -> pa.Table:
        d = pc.divide(b["ts"].cast(pa.int64()),
                      pa.scalar(_US_PER_DAY, pa.int64()))
        return pa.table({"user_id": b["user_id"].cast(pa.int64()), "d": d})

    ud = bucketed_group_agg(
        ev.map_batches(days, batch_format="pyarrow"),
        ["user_id", "d"], [("d", "min", "_x")])

    def expand(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.tile(np.arange(window, dtype=np.int64), len(u))
        return pa.table({"user_id": pa.array(np.repeat(u, window)),
                         "day": pa.array(np.repeat(d, window) + j)})

    pairs = bucketed_group_agg(
        ud.map_batches(expand, batch_format="pyarrow"),
        ["user_id", "day"], [("day", "min", "_x")])
    agg = two_stage_cell_agg(pairs, keys=("day",), int_sum_cols=(),
                             count_name="wau")
    return agg.map_batches(lambda t: t.select(["day", "wau"]),
                           batch_format="pyarrow")


BURST_MULT = 2        # burst: day count > MULT × trailing-week mean
BURST_LOOKBACK = 7    # calendar days in the trailing window
BURST_SEED_MOD = 16   # every (day % 16 == 3) day gets 3 extra copies


def events_burst_days(sf_dir: str) -> ray.data.Dataset:
    """Anomalous-traffic days: a day is a burst when its event count
    exceeds ``BURST_MULT`` × the mean of the trailing ``BURST_LOOKBACK``
    CALENDAR days (gaps count as absent, not zero rows — a RANGE frame,
    not a ROW frame). The mean divides by the days actually PRESENT in
    the window (``wdays``), so warmup/partial windows don't over-trigger.
    All-integer test ``wdays·cnt > MULT·wsum`` — no float mean, bit-exact
    vs the twin; days with an empty trailing window are excluded.

    The fixture's daily volume is FLAT (max day/trailing-mean ratio
    ~1.08), so — like `dedup_canonical_url` / `doc_prefix_clusters` —
    the query SEEDS deterministic spikes (every ``day % BURST_SEED_MOD
    == 3`` day replicated 4×) in both the pipeline and the twin, keeping
    the gate non-vacuous.

    Scale shape: the daily-count reduce is the only full pass (two-stage,
    day-keyed — output bounded by the date range); the window compare
    runs in a single coalesced finish over that date-bounded table
    (prefix-sum + two searchsorteds per day, vectorized)."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])

    def days(b: pa.Table) -> pa.Table:
        d = pc.divide(b["ts"].cast(pa.int64()),
                      pa.scalar(_US_PER_DAY, pa.int64()))
        dd = d.to_numpy(zero_copy_only=False).astype(np.int64)
        spike = dd[dd % BURST_SEED_MOD == 3]
        return pa.table({"day": pa.array(
            np.concatenate([dd, np.repeat(spike, 3)]))})

    daily = two_stage_cell_agg(ev.map_batches(days, batch_format="pyarrow"),
                               keys=("day",), int_sum_cols=(),
                               count_name="cnt")

    def finish(b: pa.Table) -> pa.Table:
        d = b["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d)
        d, c = d[order], c[order]
        p = np.concatenate([[0], np.cumsum(c)])
        lo = np.searchsorted(d, d - BURST_LOOKBACK, side="left")
        hi = np.searchsorted(d, d, side="left")
        wsum = p[hi] - p[lo]
        wdays = hi - lo
        keep = (wsum > 0) & (wdays * c > BURST_MULT * wsum)
        return pa.table({"day": pa.array(d[keep]),
                         "cnt": pa.array(c[keep]),
                         "wsum": pa.array(wsum[keep]),
                         "wdays": pa.array(wdays[keep])})

    # date-range-bounded coalesced finish (same pattern as flagship.py's
    # pyramid finish): the daily table has one row per distinct day
    return daily.repartition(1).map_batches(finish, batch_format="pyarrow")


EVENTS_BURST_SQL = f"""
WITH base AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // {_US_PER_DAY} AS day FROM events
), spiked AS (
  SELECT day FROM base
  UNION ALL
  SELECT day FROM base
  CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j)
  WHERE day % {BURST_SEED_MOD} = 3
), d AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS cnt FROM spiked GROUP BY 1
), w AS (
  SELECT day, cnt,
         CAST(COALESCE(SUM(cnt) OVER (
           ORDER BY day RANGE BETWEEN {BURST_LOOKBACK} PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS wsum,
         CAST(COUNT(cnt) OVER (
           ORDER BY day RANGE BETWEEN {BURST_LOOKBACK} PRECEDING
                               AND 1 PRECEDING) AS BIGINT) AS wdays
  FROM d
)
SELECT day, cnt, wsum, wdays FROM w
WHERE wsum > 0 AND wdays * cnt > {BURST_MULT} * wsum
"""


EVENTS_WAU_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) AS BIGINT) // {_US_PER_DAY} AS d
  FROM events
), js AS (
  SELECT UNNEST([{", ".join(f"CAST({j} AS BIGINT)" for j in range(WAU_WINDOW))}]) AS j
), exp AS (
  SELECT DISTINCT user_id, d + js.j AS day FROM ud CROSS JOIN js
)
SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM exp GROUP BY day
"""


EVENTS_RETENTION_SQL = f"""
WITH d AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) // {_US_PER_DAY} AS d
  FROM events
), f AS (
  SELECT user_id, MIN(d) AS f FROM d GROUP BY user_id
), tri AS (
  SELECT DISTINCT d.user_id, f.f AS cohort_day, d.d - f.f AS days_since
  FROM d JOIN f USING (user_id)
)
SELECT cohort_day, days_since, CAST(COUNT(*) AS BIGINT) AS n_users
FROM tri GROUP BY cohort_day, days_since
"""


FUNNEL_WINDOW_US = 7 * 86_400_000_000  # 7 days


def events_funnel_windowed(sf_dir: str,
                           window_us: int = FUNNEL_WINDOW_US
                           ) -> ray.data.Dataset:
    """Conversion-window funnel: users whose FIRST purchase AT/AFTER their
    first signup lands within ``window_us`` — the time-bounded form of
    `events_funnel` (global mins can't answer it: a purchase *before*
    signup must not count, so the reduce is conditional on the signup
    time). ONE user-bucket exchange carrying the signup/purchase rows,
    then a per-bucket vectorized kernel (segment min for the first
    signup, masked segment min for the first at/after purchase), then a
    4-int streaming count finish."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["user_id"]),
                             pc.is_valid(b["ts"])))
        et = b["event_type"]
        keep = pc.or_(pc.equal(et, "signup"), pc.equal(et, "purchase"))
        b = b.filter(keep)
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "is_s": pc.equal(b["event_type"], "signup").cast(pa.int8()),
            "ts_us": b["ts"].cast(pa.int64()),
            "_bucket": pa.array(u % 64),
        })

    tagged = ds.map_batches(prep, batch_format="pyarrow")
    BIG = np.int64(1 << 62)

    def kern(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        s = g["is_s"].to_numpy(zero_copy_only=False).astype(bool)
        t = g["ts_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, u))
        u, s, t = u[order], s[order], t[order]
        new = np.empty(len(u), bool)
        if len(u):
            new[0] = True
            new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(u)]
        s_min = np.minimum.reduceat(np.where(s, t, BIG), starts) \
            if len(u) else np.array([], np.int64)
        seg = np.repeat(np.arange(len(starts)), ends - starts) \
            if len(u) else np.array([], np.int64)
        # first purchase at/after the user's first signup
        p_ok = np.where(~s & (t >= s_min[seg]), t, BIG)
        p_after = np.minimum.reduceat(p_ok, starts) \
            if len(u) else np.array([], np.int64)
        has_p = np.zeros(len(starts), np.int64)
        if len(u):
            has_p = np.minimum.reduceat(np.where(s, BIG, t), starts) < BIG
        has_s = s_min < BIG
        conv = (s_min < BIG) & (p_after < BIG)
        within = conv & (p_after - s_min <= window_us)
        return pa.table({
            "users_signup": pa.array([int(has_s.sum())], pa.int64()),
            "users_purchase": pa.array([int(np.sum(has_p))], pa.int64()),
            "users_converted": pa.array([int(conv.sum())], pa.int64()),
            "users_converted_7d": pa.array([int(within.sum())],
                                           pa.int64()),
        })

    parts = tagged.groupby("_bucket").map_groups(kern,
                                                 batch_format="pyarrow")

    def final(b: pa.Table) -> pa.Table:
        return pa.table({c: pa.array(
            [int(pc.sum(b[c]).as_py() or 0)], pa.int64())
            for c in ("users_signup", "users_purchase",
                      "users_converted", "users_converted_7d")})

    return (parts.repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


EVENTS_FUNNEL_WINDOWED_SQL = f"""
WITH f AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p_any
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), pa_ AS (
  SELECT e.user_id, MIN(e.ts) AS p_after
  FROM events e JOIN f USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= f.s
  GROUP BY 1
)
SELECT CAST(COUNT(f.s) AS BIGINT) AS users_signup,
       CAST(COUNT(f.p_any) AS BIGINT) AS users_purchase,
       CAST(COUNT(pa_.p_after) AS BIGINT) AS users_converted,
       CAST(SUM(CASE WHEN epoch_us(pa_.p_after) - epoch_us(f.s)
                          <= {FUNNEL_WINDOW_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS users_converted_7d
FROM f LEFT JOIN pa_ USING (user_id)"""


# ------------------------------------------------ CUBE(day, event_type)
def events_cube_counts(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY CUBE(day, event_type) in ONE exchange: the fact table is
    reduced once at the finest (day, event_type) level (two-stage int-cents
    sum), then the three coarser grouping sets — (day), (event_type), ()
    — are derived from that ≤|days|·|types|-row table in a bounded
    coalesced finish, exactly like `orders_rollup_revenue` does for
    ROLLUP (SURVEY.md §7.3: partial reuse, never a second fact-table
    pass). Subtotal rows carry NULL keys like the SQL CUBE.
    """
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        day = pa.compute.floor_temporal(b["ts"], unit="day")
        val_c = _cents(pa.compute.fill_null(b["value"], 0.0))
        return pa.table({"day": day, "event_type": b["event_type"],
                         "val_c": val_c})

    agg = two_stage_cell_agg(ds.map_batches(prep, batch_format="pyarrow"),
                             keys=("day", "event_type"),
                             int_sum_cols=("val_c",), count_name="n_events")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # bounded by |days|×|types| rows: expand the four grouping sets
        fine = df[["day", "event_type", "val_c_sum", "n_events"]]
        by_day = (fine.groupby("day", sort=False, as_index=False)
                  [["val_c_sum", "n_events"]].sum())
        by_day["event_type"] = None
        by_type = (fine.groupby("event_type", sort=False, as_index=False)
                   [["val_c_sum", "n_events"]].sum())
        # NaT with the SAME datetime unit as the fine level — a bare pd.NaT
        # assignment defaults to ns and the concat would go object-dtype
        by_type["day"] = pd.Series(pd.NaT, index=by_type.index,
                                   dtype=fine["day"].dtype)
        tot = pd.DataFrame({
            "day": pd.Series([pd.NaT], dtype=fine["day"].dtype),
            "event_type": [None],
            "val_c_sum": [fine.val_c_sum.sum()],
            "n_events": [fine.n_events.sum()]})
        allr = pd.concat([fine, by_day, by_type, tot], ignore_index=True)
        return pd.DataFrame({
            "day": allr.day, "event_type": allr.event_type,
            "value_sum": allr.val_c_sum.to_numpy(np.int64) / 100.0,
            "n_events": allr.n_events.astype(np.int64)})

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


EVENTS_CUBE_SQL = """
SELECT date_trunc('day', ts) AS day, event_type,
       CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS value_sum,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY CUBE(1, 2)
"""


# ------------------------------------------------------- Pareto frontier
def orders_pareto(sf_dir: str) -> ray.data.Dataset:
    """2-D Pareto frontier over orders: an order is on the frontier iff no
    other order is at least as high-priced on an earlier-or-equal day with
    one criterion strict (minimize day, maximize price). The distributed
    shape exploits skyline decomposability — the global frontier is a
    subset of the union of per-block frontiers — so each block emits only
    its local skyline (vectorized per-date-max + running-cummax kernel)
    and ONE bounded `repartition(1)` finish re-runs the same kernel over
    the union. No all-pairs, no sort exchange; analogue of the
    reference's "newest best composite per window" selection
    (PyOFS `DataQuery` latest-pass compositing, SURVEY.md A4/O1).

    Exactness: day as int64 epoch-days, price as int64 cents; ties on
    (day, price) keep every tied order, exactly like the SQL twin.
    """
    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def _skyline_arrays(key, day, price):
        order = np.lexsort((-price, day))
        day_s, price_s, key_s = day[order], price[order], key[order]
        ud, first = np.unique(day_s, return_index=True)
        dmax = price_s[first]                       # per-date max price
        run = np.maximum.accumulate(dmax)
        prev = np.concatenate(([np.iinfo(np.int64).min], run[:-1]))
        keep_date = dmax > prev                     # date strictly improves
        pos = np.searchsorted(ud, day_s)
        keep = keep_date[pos] & (price_s == dmax[pos])
        return key_s[keep], day_s[keep], price_s[keep]

    def skyline(b: pa.Table) -> pa.Table:
        key = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        price = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)
        k, d, p = _skyline_arrays(key, day, price)
        return pa.table({"o_orderkey": pa.array(k), "day_i": pa.array(d),
                         "price_c": pa.array(p)})

    parts = ds.map_batches(skyline, batch_format="pyarrow",
                           zero_copy_batch=True)

    def finish(b: pa.Table) -> pa.Table:
        k, d, p = _skyline_arrays(
            b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["day_i"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["price_c"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({
            "o_orderkey": pa.array(k),
            "day": pa.array(d * 86_400_000_000).cast(pa.timestamp("us")),
            "o_totalprice": pa.array(p.astype(np.float64) / 100.0)})

    return parts.repartition(1).map_batches(finish, batch_format="pyarrow",
                                            batch_size=None)


ORDERS_PARETO_SQL = """
WITH o AS (
  SELECT o_orderkey,
         date_trunc('day', o_orderdate) AS day,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
), d AS (
  SELECT day, MAX(price_c) AS dmax,
         MAX(MAX(price_c)) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM o GROUP BY day
)
SELECT o.o_orderkey, o.day,
       CAST(o.price_c AS DOUBLE) / 100.0 AS o_totalprice
FROM o JOIN d USING (day)
WHERE o.price_c = d.dmax AND (d.prevmax IS NULL OR d.dmax > d.prevmax)
"""
