"""Temporal pipeline queries: as-of order attribution and sliding-window
activity features over the `events` table, each with a bit-exact DuckDB
twin (tiebreaks fully specified — see `stages/temporal.py`)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.readers import read_parquet_clean
from ..stages.temporal import asof_join, interval_join, sliding_window_agg

US_PER_DAY = 86_400_000_000
ASOF_TOL_DAYS = 8766  # ~24 years: splits the fixture into matched + null

_ASOF_COLS = "e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate, o.o_totalprice"


def _events(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/events.parquet", columns=columns)


def _asof(sf_dir: str, tolerance_us: int | None) -> ray.data.Dataset:
    ev = _events(sf_dir, ["event_id", "user_id", "ts"])
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    # key columns differ by name: align the right key to the left's
    orders = orders.map_batches(
        lambda b: b.rename_columns(
            ["user_id" if c == "o_custkey" else c for c in b.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)
    return asof_join(ev, orders, key="user_id", left_ts="ts",
                     right_ts="o_orderdate",
                     payload=["o_orderkey", "o_orderdate", "o_totalprice"],
                     tiebreak="o_orderkey", tolerance_us=tolerance_us)


def events_asof_order(sf_dir: str) -> ray.data.Dataset:
    """Each event joined to its user's most recent order at or before the
    event time (ties on order date broken by max orderkey)."""
    return _asof(sf_dir, None)


def events_asof_order_tol(sf_dir: str) -> ray.data.Dataset:
    """As-of with a match tolerance: orders older than ``ASOF_TOL_DAYS``
    before the event don't qualify — exercises the unmatched/null branch."""
    return _asof(sf_dir, ASOF_TOL_DAYS * US_PER_DAY)


def _asof_sql(tolerance: bool) -> str:
    tol = (f"AND o.o_orderdate >= e.ts - INTERVAL {ASOF_TOL_DAYS} DAYS"
           if tolerance else "")
    return f"""
SELECT event_id, user_id, ts, o_orderkey, o_orderdate, o_totalprice FROM (
  SELECT {_ASOF_COLS},
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC NULLS LAST,
                                     o.o_orderkey DESC NULLS LAST) AS rn
  FROM events e LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts {tol}
) WHERE rn = 1
"""


EVENTS_ASOF_SQL = _asof_sql(False)
EVENTS_ASOF_TOL_SQL = _asof_sql(True)


WINDOW_HOURS = 72


def events_sliding_window(sf_dir: str) -> ray.data.Dataset:
    """Per event: count and exact value sum of the same user's events in
    the trailing 72-hour range window (peers at the identical timestamp
    included — SQL RANGE-frame semantics)."""
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        # half_towards_infinity = DuckDB ROUND (half-away-from-zero)
        val_c = pc.cast(pc.round(
            pc.multiply(pc.fill_null(b["value"], 0.0), pa.scalar(100.0)),
            round_mode="half_towards_infinity"), pa.int64())
        return b.drop_columns(["value"]).append_column("val_c", val_c)

    win = sliding_window_agg(
        ev.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        key="user_id", ts="ts",
        window_us=WINDOW_HOURS * 3_600_000_000, value_cents="val_c")

    def finish(b: pa.Table) -> pa.Table:
        # single IEEE division from the exact int64 cents sum
        w_sum = pc.divide(pc.cast(b["w_sum_c"], pa.float64()),
                          pa.scalar(100.0))
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                         "ts": b["ts"], "w_count": b["w_count"],
                         "w_value_sum": w_sum})

    return win.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def clicks_nearest_error(sf_dir: str) -> ray.data.Dataset:
    """Each 'click' event joined to the same user's time-NEAREST 'error'
    event (either direction; exact-distance ties → backward; equal-ts ties
    → max err_id backward / min err_id forward). The ordered-join form of
    the reference's nearest-time alignment
    (`/root/reference/main/tracking/particle_contour.py:322`)."""
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    clicks = (ev.filter(expr="event_type == 'click'")
                .select_columns(["event_id", "user_id", "ts"]))

    def to_errors(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "error"))
        return pa.table({"user_id": b["user_id"], "err_id": b["event_id"],
                         "err_ts": b["ts"]})

    errors = ev.map_batches(to_errors, batch_format="pyarrow",
                            zero_copy_batch=True)
    return asof_join(clicks, errors, key="user_id", left_ts="ts",
                     right_ts="err_ts", payload=["err_id", "err_ts"],
                     tiebreak="err_id", direction="nearest")


CLICKS_NEAREST_ERROR_SQL = """
SELECT event_id, user_id, ts, err_id, err_ts FROM (
  SELECT c.event_id, c.user_id, c.ts,
         x.event_id AS err_id, x.ts AS err_ts,
         ROW_NUMBER() OVER (
             PARTITION BY c.event_id
             ORDER BY ABS(epoch_us(c.ts) - epoch_us(x.ts)) ASC,
                      CASE WHEN x.ts <= c.ts THEN 0 ELSE 1 END ASC,
                      CASE WHEN x.ts <= c.ts THEN -x.event_id
                           ELSE x.event_id END ASC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'click') c
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') x
    ON x.user_id = c.user_id
) WHERE rn = 1
"""


INCIDENT_MINUTES = 30


def events_incident_window(sf_dir: str) -> ray.data.Dataset:
    """Non-equi range join: every event within ±30 minutes of any 'error'
    event, across ALL users (cross-user incident correlation — no equality
    key). Self-matches excluded."""
    half_us = INCIDENT_MINUTES * 60_000_000
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def to_windows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "error"))
        t = b["ts"]
        return pa.table({
            "incident_id": b["event_id"], "incident_ts": t,
            "w_start": pc.subtract(t, pa.scalar(half_us, pa.duration("us"))),
            "w_end": pc.add(t, pa.scalar(half_us, pa.duration("us")))})

    windows = ev.map_batches(to_windows, batch_format="pyarrow",
                             zero_copy_batch=True)
    joined = interval_join(
        ev.select_columns(["event_id", "user_id", "ts"]), windows,
        point_ts="ts", start="w_start", end="w_end",
        payload=["incident_id", "incident_ts"],
        tile_us=2 * half_us)  # tile = window length → replication ≤ 2
    return joined.filter(
        expr="event_id != incident_id")


EVENTS_INCIDENT_SQL = f"""
SELECT e.event_id, e.user_id, e.ts, x.event_id AS incident_id,
       x.ts AS incident_ts
FROM events e JOIN events x
  ON x.event_type = 'error'
 AND e.ts BETWEEN x.ts - INTERVAL {INCIDENT_MINUTES} MINUTES
              AND x.ts + INTERVAL {INCIDENT_MINUTES} MINUTES
 AND e.event_id != x.event_id
"""


EVENTS_SLIDING_SQL = f"""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS w_count,
       CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT)) OVER w
            AS DOUBLE) / 100.0 AS w_value_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL {WINDOW_HOURS} HOURS PRECEDING
                       AND CURRENT ROW)
"""
