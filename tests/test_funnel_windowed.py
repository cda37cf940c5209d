"""Conversion-window funnel (rollups.events_funnel_windowed)."""

import numpy as np
import pandas as pd

from pyofs_ray.pipelines import rollups


def test_windowed_funnel_matches_pandas_reference():
    sf = "/root/testdata/sf0.001"
    got = rollups.events_funnel_windowed(sf).to_pandas().iloc[0]
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    ev = ev[ev.user_id.notna() & ev.ts.notna()]
    s = (ev[ev.event_type == "signup"].groupby("user_id").ts.min()
         .rename("s"))
    p_any = (ev[ev.event_type == "purchase"].groupby("user_id").ts.min())
    pu = ev[ev.event_type == "purchase"].merge(s, on="user_id")
    pu = pu[pu.ts >= pu.s]
    p_after = pu.groupby("user_id").ts.min().rename("pa")
    j = pd.concat([s, p_after], axis=1, join="outer")
    conv = j.dropna()
    within = ((conv.pa - conv.s).dt.total_seconds() * 1e6
              <= rollups.FUNNEL_WINDOW_US)
    assert got.users_signup == s.notna().sum()
    assert got.users_purchase == p_any.index.nunique()
    assert got.users_converted == len(conv)
    assert got.users_converted_7d == int(within.sum())
    # a purchase strictly before the first signup must not convert
    assert got.users_converted <= got.users_purchase


def test_q4_exists_counts_orders_once():
    """Semi-join semantics: an order with many qualifying lineitems
    counts once (inner-join + count would multiply)."""
    import duckdb
    from pyofs_ray.pipelines.relational import q4_exists_priority
    sf = "/root/testdata/sf0.001"
    got = (q4_exists_priority(sf).to_pandas()
           .sort_values("o_orderpriority").reset_index(drop=True))
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.execute("""
SELECT o_orderpriority, CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT)
         AS order_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1995-04-01'
  AND l.l_quantity >= 45
GROUP BY 1 ORDER BY 1""").fetchdf()
    assert got.equals(want)


def test_cumulative_users_monotone_and_total():
    from pyofs_ray.pipelines.relational import events_cumulative_users
    import pandas as pd
    sf = "/root/testdata/sf0.001"
    got = events_cumulative_users(sf).to_pandas()
    assert got.day.is_monotonic_increasing
    assert got.cumulative_users.is_monotonic_increasing
    assert (got.new_users > 0).all()
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts"]).dropna()
    assert got.cumulative_users.iloc[-1] == ev.user_id.nunique()
    assert got.new_users.sum() == ev.user_id.nunique()


def test_host_split_half_non_vacuous_and_exact_means():
    from pyofs_ray.pipelines.flagship import host_split_half, pages_dataset
    sf = "/root/testdata/sf0.001"
    got = host_split_half(sf).to_pandas()
    assert len(got) > 0  # the interleave is non-vacuous at every sf
    pages = pages_dataset(sf, with_html=False).to_pandas()
    pages["host"] = pages.url.str.split("/").str[2]
    pages["half"] = (pages.warc_ts.astype("int64") // 60_000_000) % 2
    pages["nc"] = pages.text.str.len()
    g = pages.groupby(["host", "half"]).nc.agg(["sum", "size"]).unstack()
    both = g.dropna()
    ref_even = both[("sum", 0)] / both[("size", 0)]
    m = got.set_index("host").sort_index()
    assert (m.index == both.index.sort_values()).all()
    assert np.allclose(m.mean_chars_even, ref_even.sort_index(), rtol=0,
                       atol=0)
