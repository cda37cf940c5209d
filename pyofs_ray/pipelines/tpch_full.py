"""The remaining ten classic TPC-H shapes (Q2, Q8, Q9, Q12, Q13, Q14,
Q15, Q16, Q19, Q20) — completing 22/22 coverage of the distributed
relational-query canon over the driver's TPC-H-ish tables, adapted to the
available schema (there is no ``partsupp`` table; supply-side facts come
from ``lineitem``, the same adaptation ``rel_q11_important_parts`` made).

Each query keeps the *distributed shape* that makes the original hard:

* Q2  — correlated scalar MIN subquery + join-back (which supplier offers
        each part's cheapest price) — min map is part-catalog-bounded.
* Q8  — market share: conditional share-of-total ratio over a
        fact⋈fact join with dimension filters on BOTH sides.
* Q9  — computed profit measure (price − cost·qty) with a part-attribute
        filter, grouped by (supplier nation, order year).
* Q12 — fact⋈fact join + CASE counts (priority classes per return flag).
* Q13 — LEFT-OUTER count distribution: per-customer order counts
        INCLUDING zero-order customers, then a histogram of the counts.
* Q14 — conditional revenue share (promo parts) in one scan.
* Q15 — argmax-with-ties: supplier(s) achieving the global max revenue.
* Q16 — grouped COUNT DISTINCT suppliers with an exclusion anti-set.
* Q19 — disjunctive bracket predicates (brand × size × quantity OR-of-3).
* Q20 — nested correlated half-sum threshold (2·qty_97 > qty_total).

House exactness rules (relational.py:8): money → int64 cents via
``_cents`` (`ROUND(x*100)` half-away-from-zero in the twin), all sums
exact int64, floats derived from the exact integers by fixed
written-order IEEE ops after the final reduce, predicates as integer
cross-multiplications (never a float compare).

Scale notes: every reduce here is either catalog-bounded (part,
supplier, nation, year keys → per-batch partials + the coalesced
single-block finish) or rides ONE bucketed exchange
(`bucketed_hash_join` on the order key / `bucketed_group_agg` on the
customer key for the genuinely fact-scaled Q13 counts). Reference
shapes: PyOFS's grouped means / ordered outputs (SURVEY.md §2.5-2.6);
join machinery `stages/join.py`, reduce machinery `stages/agg.py`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..sources.readers import read_parquet_clean
from ..stages.agg import (bucketed_group_agg, coalesced_int_sum_finish,
                          partial_group_sums)
from ..stages.join import broadcast_join, bucketed_hash_join
from .relational import _cents
from .tpch_extra import _nation_names


def _ts(s: str) -> pa.Scalar:
    return pa.scalar(np.datetime64(s, "us"))


def _part_cols(sf_dir: str, columns: list[str]) -> pa.Table:
    return pq.read_table(f"{sf_dir}/part.parquet", columns=columns)


# ------------------------------------------------------------------ Q2
def q2_min_cost_supplier(sf_dir: str) -> ray.data.Dataset:
    """Cheapest ASIA-supplied offer per STANDARD small part, with the
    supplier(s) achieving it (Q2's correlated-MIN + join-back shape;
    lineitem rows stand in for partsupp offers).

    One filtered scan is materialized (offers: part-set × ASIA-supplier
    slice of lineitem, ~1-2 % of rows — object-store-resident, never on
    the driver), the per-part MIN is catalog-bounded and finishes
    coalesced, and the join-back is a broadcast equality filter against
    that bounded min map — no second full scan, no all-to-all."""
    part = _part_cols(sf_dir, ["p_partkey", "p_type", "p_size"])
    keep = pc.and_(pc.equal(part["p_type"], "STANDARD"),
                   pc.less_equal(part["p_size"], 25))
    part_keys = part.filter(keep)["p_partkey"].combine_chunks()

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name", "s_acctbal",
                                  "s_nationkey"])
    names = _nation_names(sf_dir)
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    asia = {k for k, r in zip(nat["n_nationkey"].to_pylist(),
                              nat["n_regionkey"].to_pylist()) if r == 2}
    asia_supp = supp.filter(
        pc.is_in(supp["s_nationkey"],
                 value_set=pa.array(sorted(asia), pa.int64())))
    asia_keys = asia_supp["s_suppkey"].combine_chunks()

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey",
                                     "l_extendedprice"])

    def offers(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_in(b["l_partkey"], value_set=part_keys),
                    pc.is_in(b["l_suppkey"], value_set=asia_keys))
        b = b.filter(m)
        return pa.table({"l_partkey": b["l_partkey"],
                         "l_suppkey": b["l_suppkey"],
                         "ext_c": _cents(b["l_extendedprice"])})

    off = li.map_batches(offers, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()

    # per-part MIN: per-batch partial mins, coalesced part-bounded finish
    def pmin(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_partkey"]).aggregate([("ext_c", "min")])
        return pa.table({"l_partkey": g["l_partkey"],
                         "min_c": g["ext_c_min"].cast(pa.int64())})

    min_map = off.map_batches(pmin, batch_format="pyarrow") \
        .repartition(1).map_batches(pmin_final := (lambda t: pa.table({
            "l_partkey": (g := t.group_by(["l_partkey"]).aggregate(
                [("min_c", "min")]))["l_partkey"],
            "min_c": g["min_c_min"].cast(pa.int64())})),
            batch_format="pyarrow", batch_size=None)

    schema = pa.schema([("l_partkey", pa.int64()), ("min_c", pa.int64())])
    min_tbl = pa.concat_tables(
        [t.cast(schema) for t in min_map.iter_batches(batch_format="pyarrow")]
        or [schema.empty_table()])

    winners = broadcast_join(off, min_tbl, keys=["l_partkey"]).map_batches(
        lambda b: b.filter(pc.equal(b["ext_c"], b["min_c"])),
        batch_format="pyarrow")

    supp_small = pa.table({
        "l_suppkey": asia_supp["s_suppkey"],
        "s_name": asia_supp["s_name"],
        "s_acctbal": asia_supp["s_acctbal"],
        "n_name": pa.array([names[k] for k in
                            asia_supp["s_nationkey"].to_pylist()]),
    })
    out = broadcast_join(winners, supp_small, keys=["l_suppkey"])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": b["l_partkey"],
            "s_name": b["s_name"],
            "s_acctbal": b["s_acctbal"],
            "n_name": b["n_name"],
            "cost": pc.divide(pc.cast(b["ext_c"], pa.float64()), 100.0),
        })

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


Q2_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ext_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_regionkey = 2
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_type = 'STANDARD' AND p_size <= 25)
)
SELECT o.l_partkey AS p_partkey, s_name, s_acctbal, n_name,
       CAST(o.ext_c AS DOUBLE) / 100.0 AS cost
FROM offers o
JOIN supplier ON o.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o.ext_c = (SELECT MIN(o2.ext_c) FROM offers o2
                 WHERE o2.l_partkey = o.l_partkey)
"""


# ------------------------------------------------------------------ Q8
def q8_market_share(sf_dir: str, target_nation: int = 7) -> ray.data.Dataset:
    """NATION_7's share of ECONOMY-part revenue sold to ASIA customers,
    per order year 1996-1997. Conditional share-of-total over ONE
    fact⋈fact bucketed join; year-bounded rollup fused into the join."""
    part = _part_cols(sf_dir, ["p_partkey", "p_type"])
    econ_keys = part.filter(pc.equal(part["p_type"], "ECONOMY"))[
        "p_partkey"].combine_chunks()

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]
                         ).rename_columns(["l_suppkey", "s_nationkey"])

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    asia = sorted(k for k, r in zip(nat["n_nationkey"].to_pylist(),
                                    nat["n_regionkey"].to_pylist()) if r == 2)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    asia_cust = cust.filter(pc.is_in(
        cust["c_nationkey"], value_set=pa.array(asia, pa.int64())))
    asia_cust_keys = asia_cust["c_custkey"].combine_chunks()

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey", "l_suppkey",
                                     "l_extendedprice", "l_discount"])

    def prep_li(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["l_partkey"], value_set=econ_keys))
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _cents(b["l_discount"])))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"], "rev_s": rev})

    li = broadcast_join(li.map_batches(prep_li, batch_format="pyarrow",
                                       zero_copy_batch=True),
                        supp, keys=["l_suppkey"])

    lo, hi = _ts("1996-01-01"), _ts("1998-01-01")
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])

    def prep_o(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.greater_equal(b["o_orderdate"], lo),
                            pc.less(b["o_orderdate"], hi)),
                    pc.is_in(b["o_custkey"], value_set=asia_cust_keys))
        b = b.filter(m)
        return pa.table({"l_orderkey": b["o_orderkey"],
                         "o_year": pc.year(b["o_orderdate"])})

    orders = orders.map_batches(prep_o, batch_format="pyarrow",
                                zero_copy_batch=True)

    tgt = pa.scalar(target_nation, pa.int64())

    def post(t: pa.Table) -> pa.Table:
        nation_rev = pc.if_else(pc.equal(t["s_nationkey"], tgt),
                                t["rev_s"], pa.scalar(0, pa.int64()))
        t = pa.table({"o_year": t["o_year"], "total_s": t["rev_s"],
                      "nation_s": nation_rev})
        return partial_group_sums(t, ("o_year",), ("total_s", "nation_s"),
                                  count_name="_n").drop_columns(["_n"])

    joined = bucketed_hash_join(li, orders, key="l_orderkey", post=post)
    agg = coalesced_int_sum_finish(joined, ("o_year",),
                                   ("total_s_sum", "nation_s_sum"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_year": b["o_year"],
            "nation_rev_s": b["nation_s_sum"],
            "total_rev_s": b["total_s_sum"],
            "mkt_share": pc.divide(pc.cast(b["nation_s_sum"], pa.float64()),
                                   pc.cast(b["total_s_sum"], pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


Q8_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN s_nationkey = 7 THEN
            CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
            ELSE 0 END) AS BIGINT) AS nation_rev_s,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS total_rev_s,
       CAST(CAST(SUM(CASE WHEN s_nationkey = 7 THEN
            CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
            ELSE 0 END) AS BIGINT) AS DOUBLE)
       / CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n2.n_regionkey = 2
  AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# ------------------------------------------------------------------ Q9
def q9_product_profit(sf_dir: str) -> ray.data.Dataset:
    """Profit on red parts by (supplier nation, order year): amount =
    ext·(1−disc) − retailprice·qty (both sides in exact 10⁻⁴-dollar
    units; p_retailprice stands in for ps_supplycost). ONE bucketed
    fact⋈fact join; the ≤|nation|·|year| rollup fused + coalesced."""
    part = _part_cols(sf_dir, ["p_partkey", "p_name", "p_retailprice"])
    red = part.filter(pc.match_substring(part["p_name"], "red"))
    part_small = pa.table({"l_partkey": red["p_partkey"],
                           "retail_c": _cents(red["p_retailprice"])})

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]
                         ).rename_columns(["l_suppkey", "s_nationkey"])

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey", "l_suppkey",
                                     "l_quantity", "l_extendedprice",
                                     "l_discount"])
    li = broadcast_join(li, part_small, keys=["l_partkey"])
    li = broadcast_join(li, supp, keys=["l_suppkey"])

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _cents(b["l_discount"])))
        cost = pc.multiply(b["retail_c"], _cents(b["l_quantity"]))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "s_nationkey": b["s_nationkey"],
                         "amount_s": pc.subtract(rev, cost)})

    li = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda b: pa.table({"l_orderkey": b["o_orderkey"],
                            "o_year": pc.year(b["o_orderdate"])}),
        batch_format="pyarrow")

    gk = ("s_nationkey", "o_year")
    joined = bucketed_hash_join(
        li, orders, key="l_orderkey",
        post=lambda t: partial_group_sums(t, gk, ("amount_s",),
                                          count_name="_n")
                        .drop_columns(["_n"]))
    agg = coalesced_int_sum_finish(joined, gk, ("amount_s_sum",))
    names = _nation_names(sf_dir)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "nation": pa.array([names[k] for k in
                                b["s_nationkey"].to_pylist()]),
            "o_year": b["o_year"],
            "profit_s": b["amount_s_sum"],
            "sum_profit": pc.divide(pc.cast(b["amount_s_sum"], pa.float64()),
                                    10000.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                - CAST(ROUND(p_retailprice * 100) AS BIGINT)
                  * CAST(ROUND(l_quantity * 100) AS BIGINT))
            AS BIGINT) AS profit_s,
       CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                - CAST(ROUND(p_retailprice * 100) AS BIGINT)
                  * CAST(ROUND(l_quantity * 100) AS BIGINT))
            AS BIGINT) AS DOUBLE) / 10000.0 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# ----------------------------------------------------------------- Q12
def q12_shipmode_priority(sf_dir: str) -> ray.data.Dataset:
    """Priority-class line counts per return flag for 1997 shipments
    (l_returnflag stands in for l_shipmode). CASE counts fused into the
    single order-key join exchange; 3-key coalesced finish."""
    lo, hi = _ts("1997-01-01"), _ts("1998-01-01")
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_returnflag",
                                     "l_shipdate"])
    li = li.map_batches(
        lambda b: b.filter(pc.and_(pc.greater_equal(b["l_shipdate"], lo),
                                   pc.less(b["l_shipdate"], hi)))
                   .select(["l_orderkey", "l_returnflag"]),
        batch_format="pyarrow")

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderpriority"])
    orders = orders.map_batches(
        lambda b: pa.table({"l_orderkey": b["o_orderkey"],
                            "o_orderpriority": b["o_orderpriority"]}),
        batch_format="pyarrow")

    high_set = pa.array(["1-URGENT", "2-HIGH"])

    def post(t: pa.Table) -> pa.Table:
        is_high = pc.is_in(t["o_orderpriority"], value_set=high_set)
        one = pa.scalar(1, pa.int64())
        zero = pa.scalar(0, pa.int64())
        t = pa.table({"l_returnflag": t["l_returnflag"],
                      "high_n": pc.if_else(is_high, one, zero),
                      "low_n": pc.if_else(is_high, zero, one)})
        return partial_group_sums(t, ("l_returnflag",), ("high_n", "low_n"),
                                  count_name="_n").drop_columns(["_n"])

    joined = bucketed_hash_join(li, orders, key="l_orderkey", post=post)
    agg = coalesced_int_sum_finish(joined, ("l_returnflag",),
                                   ("high_n_sum", "low_n_sum"))
    return agg.map_batches(
        lambda b: pa.table({"l_returnflag": b["l_returnflag"],
                            "high_line_count": b["high_n_sum"],
                            "low_line_count": b["low_n_sum"]}),
        batch_format="pyarrow")


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# ----------------------------------------------------------------- Q13
def q13_customer_distribution(sf_dir: str) -> ray.data.Dataset:
    """Distribution of per-customer order counts INCLUDING zero-order
    customers (the LEFT-OUTER semantics that make Q13 awkward for pure
    inner-join engines). Per-customer counts are fact-scaled → ONE
    bucketed custkey exchange; the count histogram is value-bounded →
    partials + coalesced finish; the zero bucket is derived from the
    customer-catalog row count minus the served-customer count (exact —
    custkeys are FK-valid), never from a second fact pass."""
    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderpriority"])
    orders = orders.map_batches(
        lambda b: partial_group_sums(
            b.filter(pc.invert(pc.equal(b["o_orderpriority"], "5-LOW")))
             .select(["o_custkey"]),
            ("o_custkey",), (), count_name="c_count"),
        batch_format="pyarrow")
    per_cust = bucketed_group_agg(orders, keys=("o_custkey",),
                                  aggs=[("c_count", "sum", "c_count")],
                                  coalesce=True)

    hist = per_cust.map_batches(
        lambda b: partial_group_sums(b.select(["c_count"]), ("c_count",),
                                     (), count_name="custdist"),
        batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_count"]).aggregate([("custdist", "sum")])
        counts = g["c_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        dist = g["custdist_sum"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        zero = n_cust - int(dist.sum())
        if zero > 0:
            counts = np.concatenate([counts, [0]])
            dist = np.concatenate([dist, [zero]])
        return pa.table({"c_count": pa.array(counts),
                         "custdist": pa.array(dist)})

    return hist.repartition(1).map_batches(finish, batch_format="pyarrow",
                                           batch_size=None)


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_custkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) GROUP BY c_count
"""


# ----------------------------------------------------------------- Q14
def q14_promo_share(sf_dir: str) -> ray.data.Dataset:
    """Promo-part revenue share for one ship month — a conditional
    global ratio in ONE scan (part membership broadcast, single-row
    coalesced finish, share = one fixed IEEE expression)."""
    part = _part_cols(sf_dir, ["p_partkey", "p_type"])
    promo_keys = part.filter(pc.equal(part["p_type"], "PROMO"))[
        "p_partkey"].combine_chunks()
    lo, hi = _ts("1997-09-01"), _ts("1997-10-01")

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_shipdate",
                                     "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.greater_equal(b["l_shipdate"], lo),
                             pc.less(b["l_shipdate"], hi)))
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _cents(b["l_discount"])))
        promo = pc.if_else(pc.is_in(b["l_partkey"], value_set=promo_keys),
                           rev, pa.scalar(0, pa.int64()))
        t = pa.table({"_k": pa.array(np.zeros(len(b), np.int64)),
                      "promo_s": promo, "total_s": rev})
        return partial_group_sums(t, ("_k",), ("promo_s", "total_s"),
                                  count_name="_n").drop_columns(["_n"])

    partials = li.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = coalesced_int_sum_finish(partials, ("_k",),
                                   ("promo_s_sum", "total_s_sum"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "promo_rev_s": b["promo_s_sum"],
            "total_rev_s": b["total_s_sum"],
            "promo_share": pc.divide(
                pc.multiply(pa.scalar(100.0),
                            pc.cast(b["promo_s_sum"], pa.float64())),
                pc.cast(b["total_s_sum"], pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


Q14_SQL = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
            CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
            ELSE 0 END) AS BIGINT) AS promo_rev_s,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS total_rev_s,
       (100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
            CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
            ELSE 0 END) AS BIGINT) AS DOUBLE))
       / CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS DOUBLE) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# ----------------------------------------------------------------- Q15
def q15_top_supplier(sf_dir: str) -> ray.data.Dataset:
    """Supplier(s) achieving the GLOBAL max quarterly revenue — Q15's
    argmax-with-ties (the view + MAX self-reference). Supplier keys are
    catalog-bounded: per-batch partials, then max + equality filter in
    the same coalesced single-block finish (threshold and values cannot
    disagree)."""
    lo, hi = _ts("1997-01-01"), _ts("1997-04-01")
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_shipdate",
                                     "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.greater_equal(b["l_shipdate"], lo),
                             pc.less(b["l_shipdate"], hi)))
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _cents(b["l_discount"])))
        t = pa.table({"l_suppkey": b["l_suppkey"], "rev_s": rev})
        return partial_group_sums(t, ("l_suppkey",), ("rev_s",),
                                  count_name="_n").drop_columns(["_n"])

    partials = li.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_suppkey"]).aggregate([("rev_s_sum", "sum")])
        rev = g["rev_s_sum_sum"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        keep = rev == rev.max()
        return pa.table({"s_suppkey": g["l_suppkey"].take(
                             pa.array(np.flatnonzero(keep))),
                         "total_rev_s": pa.array(rev[keep])})

    top = partials.repartition(1).map_batches(finish,
                                              batch_format="pyarrow",
                                              batch_size=None)
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    out = broadcast_join(top, supp, keys=["s_suppkey"])
    return out.map_batches(
        lambda b: pa.table({
            "s_suppkey": b["s_suppkey"], "s_name": b["s_name"],
            "total_rev_s": b["total_rev_s"],
            "total_revenue": pc.divide(
                pc.cast(b["total_rev_s"], pa.float64()), 10000.0)}),
        batch_format="pyarrow")


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS s_key,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS total_rev_s
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_rev_s,
       CAST(total_rev_s AS DOUBLE) / 10000.0 AS total_revenue
FROM revenue JOIN supplier ON s_key = s_suppkey
WHERE total_rev_s = (SELECT MAX(total_rev_s) FROM revenue)
"""


# ----------------------------------------------------------------- Q16
def q16_supplier_counts(sf_dir: str) -> ray.data.Dataset:
    """Distinct-supplier counts per (brand, type, size) for a size set,
    excluding complaint suppliers (s_acctbal < 0 stands in for the
    comment LIKE filter). The distinct set is catalog-bounded
    (parts × suppliers attrs): per-batch distinct 4-tuples, global
    distinct + grouped count in one coalesced finish."""
    part = _part_cols(sf_dir, ["p_partkey", "p_brand", "p_type", "p_size"])
    sizes = pa.array([1, 9, 14, 19, 23, 36, 45, 49], pa.int64())
    keep = pc.and_(pc.and_(
        pc.invert(pc.equal(part["p_brand"], "Brand#45")),
        pc.invert(pc.equal(part["p_type"], "PROMO"))),
        pc.is_in(part["p_size"], value_set=sizes))
    part = part.filter(keep)
    part_small = pa.table({"l_partkey": part["p_partkey"],
                           "p_brand": part["p_brand"],
                           "p_type": part["p_type"],
                           "p_size": part["p_size"]})

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"])
    bad = supp.filter(pc.less(supp["s_acctbal"], 0.0))[
        "s_suppkey"].combine_chunks()

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])
    li = li.map_batches(
        lambda b: b.filter(pc.invert(pc.is_in(b["l_suppkey"],
                                              value_set=bad))),
        batch_format="pyarrow")
    li = broadcast_join(li, part_small, keys=["l_partkey"])

    quad = ("p_brand", "p_type", "p_size", "l_suppkey")

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(list(quad)).group_by(list(quad)).aggregate([])

    dd = li.map_batches(distinct, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        t = t.group_by(list(quad)).aggregate([])
        g = t.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [("l_suppkey", "count")])
        return pa.table({"p_brand": g["p_brand"], "p_type": g["p_type"],
                         "p_size": g["p_size"],
                         "supplier_cnt": g["l_suppkey_count"].cast(
                             pa.int64())})

    return dd.repartition(1).map_batches(finish, batch_format="pyarrow",
                                         batch_size=None)


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# ----------------------------------------------------------------- Q19
def q19_bracket_revenue(sf_dir: str) -> ray.data.Dataset:
    """Revenue under an OR of three (brand × size × quantity) brackets —
    Q19's disjunctive multi-predicate join. Part attrs broadcast, the
    whole disjunction one vectorized mask, single-row finish. Quantity
    compares run on the exact cent-scaled integers."""
    part = _part_cols(sf_dir, ["p_partkey", "p_brand", "p_size"])
    brands = pa.array(["Brand#12", "Brand#23", "Brand#34"])
    part = part.filter(pc.is_in(part["p_brand"], value_set=brands))
    part_small = pa.table({"l_partkey": part["p_partkey"],
                           "p_brand": part["p_brand"],
                           "p_size": part["p_size"]})

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_quantity",
                                     "l_extendedprice", "l_discount"])
    li = broadcast_join(li, part_small, keys=["l_partkey"])

    def bracket(b, brand, smax, qlo, qhi):
        q = _cents(b["l_quantity"])
        return pc.and_(pc.and_(pc.equal(b["p_brand"], brand),
                               pc.and_(pc.greater_equal(b["p_size"], 1),
                                       pc.less_equal(b["p_size"], smax))),
                       pc.and_(pc.greater_equal(q, qlo * 100),
                               pc.less_equal(q, qhi * 100)))

    def partial(b: pa.Table) -> pa.Table:
        m = pc.or_(pc.or_(bracket(b, "Brand#12", 5, 1, 11),
                          bracket(b, "Brand#23", 10, 10, 20)),
                   bracket(b, "Brand#34", 15, 20, 30))
        b = b.filter(m)
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _cents(b["l_discount"])))
        t = pa.table({"_k": pa.array(np.zeros(len(b), np.int64)),
                      "rev_s": rev})
        return partial_group_sums(t, ("_k",), ("rev_s",),
                                  count_name="n_items")

    partials = li.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    # driver-coalesced SCALAR finish (≤1 partial row per block): always
    # emits the aggregate's one row — matching SQL's no-GROUP-BY
    # semantics (SUM NULL / COUNT 0) even when nothing matches, where an
    # in-pipeline finish would emit a schema-less empty (Ray 2.49 skips
    # UDFs on all-empty inputs; bit us at sf0.001)
    import pandas as pd

    pdf = partials.to_pandas()
    n = int(pdf["n_items"].sum()) if len(pdf) else 0
    if n == 0:
        return pd.DataFrame({"revenue_s": np.array([np.nan]),
                             "n_items": np.array([0], np.int64),
                             "revenue": np.array([np.nan])})
    rev = int(pdf["rev_s_sum"].sum())
    return pd.DataFrame({"revenue_s": np.array([rev], np.int64),
                         "n_items": np.array([n], np.int64),
                         "revenue": np.array([rev / 10000.0])})


Q19_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_s,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND CAST(ROUND(l_quantity * 100) AS BIGINT) BETWEEN 100 AND 1100)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND CAST(ROUND(l_quantity * 100) AS BIGINT) BETWEEN 1000 AND 2000)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND CAST(ROUND(l_quantity * 100) AS BIGINT) BETWEEN 2000 AND 3000)
"""


# ----------------------------------------------------------------- Q20
def q20_excess_suppliers(sf_dir: str) -> ray.data.Dataset:
    """ASIA suppliers who shipped MORE of some small part in 1997 than
    in all other years combined (2·qty_1997 > qty_total — Q20's nested
    correlated half-sum threshold, integer cross-multiplied). Both the
    1997 and the all-time sums ride the SAME (supp, part) partials in
    one scan; the (supplier × part)-bounded finish runs coalesced."""
    part = _part_cols(sf_dir, ["p_partkey", "p_name"])
    small_keys = part.filter(pc.starts_with(part["p_name"], "small"))[
        "p_partkey"].combine_chunks()

    lo, hi = _ts("1997-01-01"), _ts("1998-01-01")
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey",
                                     "l_quantity", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["l_partkey"], value_set=small_keys))
        q = _cents(b["l_quantity"])
        in97 = pc.and_(pc.greater_equal(b["l_shipdate"], lo),
                       pc.less(b["l_shipdate"], hi))
        t = pa.table({"l_suppkey": b["l_suppkey"],
                      "l_partkey": b["l_partkey"],
                      "q_total": q,
                      "q_97": pc.if_else(in97, q, pa.scalar(0, pa.int64()))})
        return partial_group_sums(t, ("l_suppkey", "l_partkey"),
                                  ("q_total", "q_97"),
                                  count_name="_n").drop_columns(["_n"])

    partials = li.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey", "n_name"])
    region_of = dict(zip(nat["n_nationkey"].to_pylist(),
                         nat["n_regionkey"].to_pylist()))
    names = dict(zip(nat["n_nationkey"].to_pylist(),
                     nat["n_name"].to_pylist()))
    sk = supp["s_suppkey"].to_pylist()
    s_name = dict(zip(sk, supp["s_name"].to_pylist()))
    s_nat = dict(zip(sk, supp["s_nationkey"].to_pylist()))

    # driver-coalesced finish ((supplier × part)-bounded partials): a
    # TYPED possibly-empty result — an in-pipeline finish over an
    # all-empty partial stream loses its schema (Ray 2.49 quirk; bit us
    # at sf0.001 where no small-part lineitem exists)
    import pandas as pd

    pdf = partials.to_pandas()
    keep: list[int] = []
    if len(pdf):
        g = pdf.groupby(["l_suppkey", "l_partkey"], as_index=False)[
            ["q_total_sum", "q_97_sum"]].sum()
        sup = g["l_suppkey"].to_numpy().astype(np.int64)
        tot = g["q_total_sum"].to_numpy().astype(np.int64)
        q97 = g["q_97_sum"].to_numpy().astype(np.int64)
        excess = np.unique(sup[2 * q97 > tot])
        keep = [s for s in excess.tolist() if region_of[s_nat[s]] == 2]
    return pd.DataFrame({
        "s_suppkey": np.array(keep, np.int64),
        "s_name": pd.Series([s_name[s] for s in keep], dtype=object),
        "n_name": pd.Series([names[s_nat[s]] for s in keep],
                            dtype=object)})


Q20_SQL = """
SELECT DISTINCT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = 2
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE 'small%')
    GROUP BY l_suppkey, l_partkey
    HAVING 2 * SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                         AND l_shipdate < TIMESTAMP '1998-01-01'
                        THEN CAST(ROUND(l_quantity * 100) AS BIGINT)
                        ELSE 0 END)
           > SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
  )
"""
