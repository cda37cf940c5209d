"""Deeper TPC-H-shaped relational coverage: nation-pair volume shipping
(Q7), returned-item top customers (Q10), large-volume orders via a
fact-side HAVING subquery (Q18), and dormant above-average customers
(Q22) — the remaining classic distributed-join shapes the relational
suite didn't yet exercise:

* Q7  — double dimension attach on BOTH fact sides of a fact⋈fact join
        (supplier→lineitem, customer→orders) + a low-card 3-key rollup.
* Q10 — fact⋈fact join then a HIGH-cardinality (per-customer) reduce →
        exact-integer top-k: the reduce uses `bucketed_group_agg` (the
        sort-based Ray groupby is pathological on per-entity keys).
* Q18 — aggregate-then-self-join: the HAVING result stays a *Dataset*
        (never pulled to the driver) and meets orders in a bucketed
        hash join, so the shape survives a fact table where 1 % of
        orders is still billions of rows.
* Q22 — global scalar (avg positive balance) via exact int sums, then
        an integer cross-multiplied predicate (ab_c · n > sum_c — no
        float average ever compared) + a distributed ANTI join against
        the recent-order custkeys.

Exactness follows the house convention (relational.py:8): money scaled
to int64 cents inside map_batches, sums exact, ORDER BY/LIMIT keyed on
the exact integers, floats derived by one IEEE division at the end.
Reference shapes: PyOFS's grouped means / sorted outputs
(PyOFS/main/dataset_ops: per-station aggregation, priority ordering);
the join/anti-join machinery is `stages/join.py`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..sources.readers import read_parquet_clean
from ..stages.agg import (bucketed_group_agg, coalesced_int_sum_finish,
                          exact_topk, partial_group_sums)
from ..stages.join import broadcast_join, bucketed_hash_join
from .relational import _cents


def _nation_names(sf_dir: str) -> dict[int, str]:
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    return dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))


# ------------------------------------------------------------------ Q7
def q7_volume_shipping(sf_dir: str) -> ray.data.Dataset:
    """Revenue between (supplier nation, customer nation) pairs by ship
    year — lineitem carries s_nationkey in (broadcast supplier dim),
    orders carries c_nationkey in (broadcast customer dim), and the two
    facts meet once in a bucketed hash join on l_orderkey."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).rename_columns(
        ["l_suppkey", "s_nationkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).rename_columns(
        ["o_custkey", "c_nationkey"])

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"))

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.greater_equal(b["l_shipdate"], lo),
                             pc.less(b["l_shipdate"], hi)))
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _cents(b["l_discount"])))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "l_year": pc.year(b["l_shipdate"]),
                         "rev_s": rev})

    li = broadcast_join(li.map_batches(prep, batch_format="pyarrow",
                                       zero_copy_batch=True),
                        supp, keys=["l_suppkey"])

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    orders = broadcast_join(orders, cust, keys=["o_custkey"]).map_batches(
        lambda b: pa.table({"l_orderkey": b["o_orderkey"],
                            "c_nationkey": b["c_nationkey"]}),
        batch_format="pyarrow")

    # the 3-key rollup is nation×nation×year-bounded (≤ ~1250 keys): fuse
    # the partial combine INTO the join exchange and finish coalesced —
    # one all-to-all total instead of three (6.2 s → measured cut)
    gk = ("s_nationkey", "c_nationkey", "l_year")
    joined = bucketed_hash_join(
        li, orders, key="l_orderkey",
        post=lambda t: partial_group_sums(t, gk, ("rev_s",),
                                          count_name="n_items"))
    agg = coalesced_int_sum_finish(joined, gk, ("rev_s_sum", "n_items"))

    names = _nation_names(sf_dir)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "supp_nation": pa.array([names[k] for k in
                                     b["s_nationkey"].to_pylist()]),
            "cust_nation": pa.array([names[k] for k in
                                     b["c_nationkey"].to_pylist()]),
            "l_year": b["l_year"],
            "revenue": pc.divide(pc.cast(b["rev_s_sum"], pa.float64()),
                                 10000.0),
            "n_items": b["n_items"],
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


# ----------------------------------------------------------------- Q10
def q10_returned_items(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Top-k customers by revenue on returned ('R') items in one order
    quarter. Per-customer reduce is high-cardinality → bucketed exchange;
    the top-k sort runs on the EXACT integer revenue (ties → custkey)."""
    lo = pa.scalar(np.datetime64("1997-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-04-01", "us"))

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])
    orders = orders.map_batches(
        lambda b: b.filter(pc.and_(pc.greater_equal(b["o_orderdate"], lo),
                                   pc.less(b["o_orderdate"], hi)))
                   .select(["o_orderkey", "o_custkey"])
                   .rename_columns(["l_orderkey", "c_custkey"]),
        batch_format="pyarrow")

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _cents(b["l_discount"])))
        return pa.table({"l_orderkey": b["l_orderkey"], "rev_s": rev})

    # per-bucket per-cust partial sums fused into the join exchange shrink
    # the second (per-customer) exchange from line-items to ≤|cust|/bucket
    # partials; the top-k replaces a full Sort all-to-all with per-block
    # lexsort + a coalesced k×blocks finish
    joined = bucketed_hash_join(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        orders, key="l_orderkey",
        post=lambda t: partial_group_sums(t, ("c_custkey",), ("rev_s",),
                                          count_name="_n")
                         .drop_columns(["_n"]))
    per_cust = bucketed_group_agg(joined, keys=("c_custkey",),
                                  aggs=[("rev_s_sum", "sum", "rev_s_sum")])
    top = exact_topk(per_cust, ["rev_s_sum", "c_custkey"],
                     [True, False], k)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_acctbal",
                                  "c_nationkey"])
    names = _nation_names(sf_dir)
    out = broadcast_join(top, cust, keys=["c_custkey"])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["c_custkey"],
            "c_name": b["c_name"],
            "revenue": pc.divide(pc.cast(b["rev_s_sum"], pa.float64()),
                                 10000.0),
            "c_acctbal": b["c_acctbal"],
            "n_name": pa.array([names[x] for x in
                                b["c_nationkey"].to_pylist()]),
        })

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


Q10_SQL = """
WITH per_cust AS (
  SELECT o_custkey AS c_custkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
  ORDER BY rev_s DESC, c_custkey ASC LIMIT 20
)
SELECT c_custkey, c_name,
       CAST(rev_s AS DOUBLE) / 10000.0 AS revenue,
       c_acctbal, n_name
FROM per_cust
JOIN customer USING (c_custkey)
JOIN nation ON c_nationkey = n_nationkey
"""


# ----------------------------------------------------------------- Q18
def q18_large_volume(sf_dir: str, qty_cents: int = 25000,
                     k: int = 100) -> ray.data.Dataset:
    """Orders whose total line quantity exceeds a threshold (HAVING on a
    per-order reduce), joined back to orders + customer. The HAVING
    result is kept distributed — at 100 TB '1 % of orders' is still too
    big for the driver — and meets orders in a bucketed hash join."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_quantity"])
    # per-batch partial per-order sums shrink what the exchange moves;
    # the HAVING reduce itself is fused into the join bucket via left_fn
    # (bucket = l_orderkey % B co-locates every line of an order), so the
    # aggregate-then-self-join costs ONE exchange, not two
    li = li.map_batches(
        lambda b: partial_group_sums(
            pa.table({"l_orderkey": b["l_orderkey"],
                      "qty_c": _cents(b["l_quantity"])}),
            ("l_orderkey",), ("qty_c",), count_name="_n")
        .drop_columns(["_n"]),
        batch_format="pyarrow", zero_copy_batch=True)
    thr = pa.scalar(qty_cents, pa.int64())

    def having(l: pa.Table) -> pa.Table:
        g = l.group_by("l_orderkey").aggregate([("qty_c_sum", "sum")])
        g = pa.table({"l_orderkey": g["l_orderkey"],
                      "qty_c_sum": g["qty_c_sum_sum"].cast(pa.int64())})
        return g.filter(pc.greater(g["qty_c_sum"], thr))

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    orders = orders.map_batches(
        lambda b: b.rename_columns(
            ["l_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        batch_format="pyarrow")
    joined = bucketed_hash_join(
        li, orders, key="l_orderkey", left_fn=having,
        post=lambda t: t.append_column("price_c", _cents(t["o_totalprice"])))
    top = exact_topk(joined, ["price_c", "l_orderkey"], [True, False], k)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"]).rename_columns(
        ["o_custkey", "c_name"])
    out = broadcast_join(top, cust, keys=["o_custkey"])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["o_custkey"],
            "c_name": b["c_name"],
            "o_orderkey": b["l_orderkey"],
            "o_orderdate": b["o_orderdate"],
            "o_totalprice": b["o_totalprice"],
            "sum_qty": pc.divide(pc.cast(b["qty_c_sum"], pa.float64()),
                                 100.0),
        })

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_c
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 25000
), top AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, qty_c
  FROM big JOIN orders ON o_orderkey = l_orderkey
  ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
           o_orderkey ASC LIMIT 100
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(qty_c AS DOUBLE) / 100.0 AS sum_qty
FROM top JOIN customer ON c_custkey = o_custkey
"""


# ----------------------------------------------------------------- Q22
def q22_dormant_customers(sf_dir: str,
                          since: str = "2000-01-01") -> ray.data.Dataset:
    """Per-nation count + balance of customers above the average positive
    account balance with NO order since ``since``. The average is never
    materialized as a float: the predicate is the integer
    cross-multiplication ab_c·n_pos > sum_pos_c; dormancy is a
    distributed ANTI join against recent-order custkeys."""
    from ray.data.aggregate import Sum

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey",
                                       "c_acctbal"])
    cust = cust.map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"],
                            "c_nationkey": b["c_nationkey"],
                            "ab_c": _cents(b["c_acctbal"])}),
        batch_format="pyarrow", zero_copy_batch=True)

    # global positive-balance stats: exact int sums, tiny driver pull
    pos = cust.map_batches(
        lambda b: (lambda f: pa.table({
            "s": pa.array([pc.sum(f["ab_c"]).as_py() or 0], pa.int64()),
            "n": pa.array([len(f)], pa.int64())}))(
                b.filter(pc.greater(b["ab_c"], pa.scalar(0, pa.int64())))),
        batch_format="pyarrow")
    stats = pos.aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    sum_pos, n_pos = int(stats["s"]), int(stats["n"])

    lo = pa.scalar(np.datetime64(since, "us"))
    recent = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderdate"])
    recent = recent.map_batches(
        lambda b: pa.table({"c_custkey":
                            b.filter(pc.greater_equal(b["o_orderdate"],
                                                      lo))["o_custkey"]}),
        batch_format="pyarrow")

    rich = cust.map_batches(
        lambda b: b.filter(pc.greater(
            pc.multiply(b["ab_c"], pa.scalar(n_pos, pa.int64())),
            pa.scalar(sum_pos, pa.int64()))),
        batch_format="pyarrow")
    # per-nation rollup (≤25 keys) fused into the anti-join exchange +
    # coalesced finish — no second all-to-all
    dormant = bucketed_hash_join(
        rich, recent, key="c_custkey", join_type="anti",
        post=lambda t: partial_group_sums(t, ("c_nationkey",), ("ab_c",),
                                          count_name="numcust"))
    agg = coalesced_int_sum_finish(dormant, ("c_nationkey",),
                                   ("ab_c_sum", "numcust"))
    names = _nation_names(sf_dir)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": pa.array([names[x] for x in
                                b["c_nationkey"].to_pylist()]),
            "numcust": b["numcust"],
            "totacctbal": pc.divide(pc.cast(b["ab_c_sum"], pa.float64()),
                                    100.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


Q22_SQL = """
WITH cb AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS ab_c
  FROM customer
), pos AS (
  SELECT SUM(ab_c) AS s, COUNT(*) AS n FROM cb WHERE ab_c > 0
), recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01'
)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(ab_c) AS DOUBLE) / 100.0 AS totacctbal
FROM cb, pos
JOIN nation ON c_nationkey = n_nationkey
WHERE ab_c * pos.n > pos.s
  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY 1
"""


# ----------------------------------------------------------------- Q17
def q17_small_quantity(sf_dir: str, brand: str = "Brand#12"
                       ) -> ray.data.Dataset:
    """Average yearly revenue lost to small-quantity orders of one brand
    (Q17's correlated-average shape): lineitems whose quantity is below
    0.2 × the part's average quantity, summed and divided by 7.

    One exchange total: the brand part keys are a broadcast semi-filter;
    the per-part average AND the correlated predicate both run inside the
    join bucket (bucket = l_partkey % B co-locates every lineitem of a
    part), as the exact integer cross-multiplication
    ``5 · n_part · qty_c < sum_qty_c`` — no float average is ever
    compared. The float appears once, at the single final division."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    keys = part.filter(pc.equal(part["p_brand"], brand)) \
               .select(["p_partkey"]).rename_columns(["l_partkey"])

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])
    li = li.map_batches(
        lambda b: pa.table({"l_partkey": b["l_partkey"],
                            "qty_c": _cents(b["l_quantity"]),
                            "price_c": _cents(b["l_extendedprice"])}),
        batch_format="pyarrow", zero_copy_batch=True)

    def small_qty_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("l_partkey").aggregate([("qty_c", "sum"),
                                               ("qty_c", "count")])
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        gk = g["l_partkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(gk)
        pos = order[np.searchsorted(gk[order], pk)]
        sq = g["qty_c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)[pos]
        n = g["qty_c_count"].to_numpy(zero_copy_only=False).astype(np.int64)[pos]
        qty = t["qty_c"].to_numpy(zero_copy_only=False)
        if len(n) and 5 * int(n.max()) * int(np.abs(qty).max() or 0) >= 2**62:
            raise OverflowError("q17 predicate exceeds int64 bounds")
        mask = 5 * n * qty < sq
        price = t["price_c"].to_numpy(zero_copy_only=False)[mask]
        return pa.table({"price_c_sum": pa.array([int(price.sum())],
                                                 pa.int64())})

    partials = bucketed_hash_join(li, ray.data.from_arrow(keys),
                                  key="l_partkey", join_type="semi",
                                  post=small_qty_partial)

    def finish(t: pa.Table) -> pa.Table:
        s = pc.sum(t["price_c_sum"]).as_py() or 0
        return pa.table({"avg_yearly":
                         pa.array([float(s) / 700.0], pa.float64())})

    return partials.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def q17_sql(brand: str = "Brand#12") -> str:
    return f"""
WITH l AS (
  SELECT l_partkey,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{brand}'
), s AS (
  SELECT l_partkey, SUM(qty_c) AS sq, CAST(COUNT(*) AS BIGINT) AS n
  FROM l GROUP BY 1
)
SELECT CAST(COALESCE(SUM(price_c), 0) AS DOUBLE) / 700.0 AS avg_yearly
FROM l JOIN s USING (l_partkey)
WHERE 5 * n * qty_c < sq"""


# ----------------------------------------------------------------- Q11
def q11_important_parts(sf_dir: str, num: int = 1,
                        den: int | None = None) -> ray.data.Dataset:
    """Parts whose total ordered value exceeds ``num/den`` of the global
    ordered value (Q11's group-share-of-total HAVING shape). ``den``
    defaults to ``9·|part|//10`` — a share bar just under the uniform
    1/|part|, so the selective fraction is scale-invariant (a fixed den
    goes vacuous the moment the catalog grows). Per-part sums via the
    two-stage partial combine (part keys are catalog-bounded); the global
    total is the sum of the SAME per-part sums (one tiny extra pass over
    ≤|part| rows, so the threshold and the values can never disagree);
    the predicate is the integer cross-multiplication
    ``val · den > total · num`` — DuckDB runs it in HUGEINT, so the Python
    side guards the int64 bound loudly."""
    if den is None:
        n_parts = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
        den = 9 * n_parts // 10

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_extendedprice",
                                     "l_quantity"])
    li = li.map_batches(
        lambda b: partial_group_sums(pa.table({
            "l_partkey": b["l_partkey"],
            "val_c": pc.multiply(_cents(b["l_extendedprice"]),
                                 _cents(b["l_quantity"]))}),
            ("l_partkey",), ("val_c",), count_name="_n")
        .drop_columns(["_n"]),
        batch_format="pyarrow", zero_copy_batch=True)

    # parts catalogs are bounded (they don't grow with fact rows), so the
    # final reduce + the global total + the share filter all run in ONE
    # coalesced kernel — a single plan execution instead of three
    # (per-part agg, total scalar, filter) with a materialize between
    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("l_partkey").aggregate([("val_c_sum", "sum")])
        val = g["val_c_sum_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = sum(int(x) for x in val)  # Python ints: no silent wrap
        if total * num >= 2**62 or (len(val) and
                                    int(val.max()) * den >= 2**62):
            raise OverflowError("q11 predicate exceeds int64 bounds — the "
                                "DuckDB twin runs in HUGEINT; rescale val_c")
        mask = val * den > total * num
        return pa.table({
            "l_partkey": g["l_partkey"].to_numpy(
                zero_copy_only=False)[mask],
            "value": val[mask].astype(np.float64) / 10000.0})

    return li.repartition(1).map_batches(finish, batch_format="pyarrow",
                                         batch_size=None,
                                         zero_copy_batch=True)


def q11_sql(num: int = 1) -> str:
    return f"""
WITH pp AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * CAST(ROUND(l_quantity * 100) AS BIGINT)) AS val_c
  FROM lineitem GROUP BY 1
), t AS (SELECT SUM(val_c) AS total FROM pp),
d AS (SELECT 9 * COUNT(*) // 10 AS den FROM part)
SELECT l_partkey, CAST(val_c AS DOUBLE) / 10000.0 AS value
FROM pp, t, d
WHERE val_c * den > total * {num}"""


# ----------------------------------------------------------------- Q21
def q21_straggler_suppliers(sf_dir: str) -> ray.data.Dataset:
    """Q21's multi-EXISTS shape over the available columns: for every
    order with ≥2 distinct suppliers, find the orders whose LATEST ship
    date is held by exactly ONE supplier (the sole straggler — another
    supplier exists, no other supplier is equally late), and count such
    orders per supplier.

    ONE exchange: bucket lineitem by ``l_orderkey % B`` (co-locating every
    line of an order), then a fully vectorized per-bucket kernel
    (np.unique segment ids + maximum.reduceat — no Python loop over
    orders) emits per-supplier partial counts; the finish is coalesced
    (supplier catalogs are bounded). Timestamps compare as int64 us —
    exact, so the DuckDB twin (window MAX + distinct-supplier counts)
    is bit-identical."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey",
                                     "l_shipdate"])
    nb = 64

    def tag(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "ship": b["l_shipdate"].cast(pa.int64()),
                         "_bucket": pa.array(ok % nb)})

    def straggler_partial(g: pa.Table) -> pa.Table:
        ok = g["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = g["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = g["ship"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sk, ok))
        ok, sk, sh = ok[order], sk[order], sh[order]
        _, starts, inv = np.unique(ok, return_index=True,
                                   return_inverse=True)
        mx = np.maximum.reduceat(sh, starts)
        # distinct suppliers per order: first occurrence of each (ok, sk)
        new_pair = np.r_[True, (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])]
        nsupp = np.bincount(inv[new_pair], minlength=len(starts))
        # distinct suppliers AT the order max
        at_max = (sh == mx[inv]) & new_pair
        # a supplier can hit the max on a non-first line: count distinct
        # (ok, sk) pairs that have ANY line at max
        pair_id = np.cumsum(new_pair) - 1
        pair_hit = np.zeros(pair_id[-1] + 1 if len(pair_id) else 0, bool)
        np.logical_or.at(pair_hit, pair_id[sh == mx[inv]], True)
        pair_sk = sk[new_pair]
        n_at_max = np.bincount(
            inv[new_pair][pair_hit], minlength=len(starts))
        sole = (nsupp >= 2) & (n_at_max == 1)
        # the sole straggler pair of each qualifying order
        keep = pair_hit & sole[inv[new_pair]]
        winners = pair_sk[keep]
        if len(winners) == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "numwait": pa.array([], pa.int64())})
        uniq, cnt = np.unique(winners, return_counts=True)
        return pa.table({"s_suppkey": pa.array(uniq),
                         "numwait": pa.array(cnt.astype(np.int64))})

    partials = (li.map_batches(tag, batch_format="pyarrow",
                               zero_copy_batch=True)
                  .groupby("_bucket")
                  .map_groups(straggler_partial, batch_format="pyarrow"))
    return coalesced_int_sum_finish(partials, ("s_suppkey",), ("numwait",))


Q21_SQL = """
WITH o AS (
  SELECT l_orderkey, MAX(l_shipdate) AS mx,
         COUNT(DISTINCT l_suppkey) AS nsupp
  FROM lineitem GROUP BY 1
), w AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN o USING (l_orderkey)
  WHERE o.nsupp >= 2 AND l.l_shipdate = o.mx
  GROUP BY 1, 2
), u AS (
  SELECT l_orderkey FROM w GROUP BY 1 HAVING COUNT(*) = 1
)
SELECT l_suppkey AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
FROM w JOIN u USING (l_orderkey)
GROUP BY 1
"""
