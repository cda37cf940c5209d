"""Exact per-group low-quantiles (p25 / median / p75) by SELECTION.

The reference derives per-station/per-cell summary statistics from full
value distributions (`/root/reference/main/observation/hf_radar.py`
aggregates per-cell fields; the DOP-quality filters are threshold
selections over the same distributions). Low-quantile = the smallest
value whose cumulative count reaches the rank — a selection of an
EXISTING value, never an interpolation, so the result is bit-identical
to the DuckDB twin even for float value columns (no arithmetic touches
the values; only integer rank math decides which one is picked).

Scale shape: per-batch partial (key, value) histograms (Arrow group_by
count — compresses repeated values before any exchange), ONE key-hash
bucket exchange, then a per-bucket vectorized kernel: lexsort by
(key, value), segment cumsum, and a monotone-mask reduceat picks each
quantile's first qualifying row per key. Group cardinality never hits
a Ray sort-aggregate; per-key distinct-value counts bound the exchange
payload, not raw row counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

# (numerator, denominator) rank fractions: low-quantile q = smallest v
# with den*cumcount >= num*n
DEFAULT_QUANTS = ((1, 4, "p25"), (1, 2, "median"), (3, 4, "p75"))


def grouped_low_quantiles(ds: ray.data.Dataset, key: str, value_col: str,
                          quants=DEFAULT_QUANTS,
                          num_buckets: int | None = None
                          ) -> ray.data.Dataset:
    """Per-``key`` exact low-quantiles of ``value_col`` plus the group
    count. Output: ``key, n, <one column per quantile name>`` where the
    quantile columns keep the value column's dtype."""
    if num_buckets is None:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)

    def partial_hist(b: pa.Table) -> pa.Table:
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
        # combine cross-batch partials for the same (k, v)
        gg = g.select(["k", "v", "c"]).group_by(["k", "v"]).aggregate(
            [("c", "sum")])
        k = gg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = gg["v"].to_numpy(zero_copy_only=False)
        c = gg["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, k))
        k, v, c = k[order], v[order], c[order]
        n_rows = len(k)
        new = np.empty(n_rows, bool)
        if n_rows:
            new[0] = True
            new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        # cumulative count within each key segment
        cum = np.cumsum(c)
        seg_base = np.repeat(cum[starts] - c[starts], np.diff(
            np.r_[starts, n_rows]))
        cc = cum - seg_base
        n_per = np.add.reduceat(c, starts) if n_rows else np.array([], np.int64)
        cols = {key: pa.array(k[starts]), "n": pa.array(n_per)}
        n_rep = np.repeat(n_per, np.diff(np.r_[starts, n_rows]))
        for num, den, name in quants:
            # monotone within a segment: first True = start + #leading Falses
            miss = (den * cc < num * n_rep)
            lead_false = np.add.reduceat(miss.astype(np.int64), starts) \
                if n_rows else np.array([], np.int64)
            pick = starts + lead_false
            cols[name] = pa.array(v[pick])
        return pa.table(cols)

    return (ds.map_batches(partial_hist, batch_format="pyarrow")
              .groupby("_bucket").map_groups(finish, batch_format="pyarrow"))


def grouped_low_quantiles_sql(table: str, key: str, value_col: str,
                              quants=DEFAULT_QUANTS) -> str:
    """Bit-exact DuckDB twin: same integer rank rule over a windowed
    cumulative histogram (MEDIAN()/QUANTILE_CONT interpolate — never
    used here)."""
    picks = ",\n  ".join(
        f"MIN(CASE WHEN {den} * cc >= {num} * n THEN v END) AS {name}"
        for num, den, name in quants)
    return f"""
WITH h AS (
  SELECT {key} AS k, {value_col} AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
), tot AS (
  SELECT k, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY k
), cum AS (
  SELECT k, v, SUM(c) OVER (PARTITION BY k ORDER BY v) AS cc FROM h
)
SELECT cum.k AS {key}, tot.n AS n,
  {picks}
FROM cum JOIN tot USING (k)
GROUP BY cum.k, tot.n"""


def grouped_mad(ds: ray.data.Dataset, key: str, value_col: str,
                num_buckets: int | None = None) -> ray.data.Dataset:
    """Per-``key`` exact median absolute deviation BY SELECTION, in ONE
    bucket exchange: ``mad = lowmed(|v - lowmed(v)|)`` where lowmed is the
    low-median (smallest value whose cumulative count reaches half — a
    selection, never an interpolation).

    Every row of a key lands in that key's bucket, so both selection
    passes run inside one vectorized kernel: per-batch partial (key,
    value) histograms → key-hash bucket exchange → per bucket, lexsort +
    segment-cumsum picks the median, a single IEEE ``|v - med|`` derives
    the deviations (identical arithmetic to the DuckDB twin's
    ``ABS(v - median)``, so float results stay bit-exact), and a second
    lexsort + cumsum picks their low-median. Output:
    ``key, n, median, mad`` (value dtype preserved).

    Robust-statistics analogue of the reference's DOP-quality spread
    screens (per-station error-distribution summaries).
    """
    if num_buckets is None:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)

    def partial_hist(b: pa.Table) -> pa.Table:
        h = (b.select([key, value_col]).group_by([key, value_col])
             .aggregate([(value_col, "count")]))
        kk = h[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "k": h[key].cast(pa.int64()),
            "v": h[value_col],
            "c": h[f"{value_col}_count"].combine_chunks().cast(pa.int64()),
            "_bucket": pa.array(kk % num_buckets),
        })

    def _seg_low_median(k, v, c, starts, n_rep):
        """First v per key segment whose cumulative count reaches half.
        k must be segment-sorted; v sorted within segments."""
        cum = np.cumsum(c)
        seg_base = np.repeat(cum[starts] - c[starts],
                             np.diff(np.r_[starts, len(k)]))
        cc = cum - seg_base
        miss = (2 * cc < n_rep)
        lead_false = np.add.reduceat(miss.astype(np.int64), starts)
        return v[starts + lead_false]

    def finish(g: pa.Table) -> pa.Table:
        gg = g.select(["k", "v", "c"]).group_by(["k", "v"]).aggregate(
            [("c", "sum")])
        k = gg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = gg["v"].to_numpy(zero_copy_only=False)
        c = gg["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, k))
        k, v, c = k[order], v[order], c[order]
        n_rows = len(k)
        new = np.empty(n_rows, bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        seg_len = np.diff(np.r_[starts, n_rows])
        n_per = np.add.reduceat(c, starts)
        n_rep = np.repeat(n_per, seg_len)
        med = _seg_low_median(k, v, c, starts, n_rep)
        # single IEEE op per row — the twin computes ABS(v - median)
        # identically, so even float deviations compare bit-equal
        dev = np.abs(v - np.repeat(med, seg_len))
        order2 = np.lexsort((dev, k))  # stable: key segments keep bounds
        mad = _seg_low_median(k[order2], dev[order2], c[order2],
                              starts, n_rep)
        return pa.table({key: pa.array(k[starts]), "n": pa.array(n_per),
                         "median": pa.array(med), "mad": pa.array(mad)})

    return (ds.map_batches(partial_hist, batch_format="pyarrow")
              .groupby("_bucket").map_groups(finish, batch_format="pyarrow"))


def grouped_mad_sql(table: str, key: str, value_col: str) -> str:
    """Bit-exact DuckDB twin of `grouped_mad`: the same low-median
    selection rule over windowed cumulative histograms, deviations by the
    same single ABS(v - median) IEEE op (never MEDIAN()/QUANTILE_CONT,
    which interpolate)."""
    return f"""
WITH h AS (
  SELECT {key} AS k, {value_col} AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
), tot AS (
  SELECT k, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY k
), cum AS (
  SELECT k, v, SUM(c) OVER (PARTITION BY k ORDER BY v) AS cc FROM h
), med AS (
  SELECT cum.k AS k, tot.n AS n,
         MIN(CASE WHEN 2 * cc >= n THEN v END) AS median
  FROM cum JOIN tot USING (k) GROUP BY cum.k, tot.n
), dh AS (
  SELECT h.k, ABS(h.v - m.median) AS dv, CAST(SUM(h.c) AS BIGINT) AS c
  FROM h JOIN med m ON m.k = h.k GROUP BY 1, 2
), dcum AS (
  SELECT k, dv, SUM(c) OVER (PARTITION BY k ORDER BY dv) AS cc FROM dh
)
SELECT m.k AS {key}, m.n AS n, m.median AS median,
       MIN(CASE WHEN 2 * dcum.cc >= m.n THEN dv END) AS mad
FROM dcum JOIN med m ON m.k = dcum.k
GROUP BY m.k, m.n, m.median"""
