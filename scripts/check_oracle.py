"""Local driver-mimic: run each queries() entry and its oracle_sql() twin on
the same sf dir, compare row count, sorted-by-name schema, and exact values
(order-insensitive). Usage: python scripts/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import ray

sys.path.insert(0, ".")


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWS ray={len(ray_df)} sql={len(sql_df)}"
    a = ray_df.reindex(sorted(ray_df.columns), axis=1)
    b = sql_df.reindex(sorted(sql_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA ray={list(a.columns)} sql={list(b.columns)}"
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                import numpy as np
                ok = np.array_equal(av.to_numpy(dtype=float), bv.to_numpy(dtype=float), equal_nan=True)
            else:
                ok = av.astype(str).equals(bv.astype(str))
        except Exception as e:
            return f"CMP-ERR col {c}: {e}"
        if not ok:
            bad = (av.astype(str) != bv.astype(str))
            i = bad[bad].index[0] if bad.any() else 0
            return f"VALUES col {c} row {i}: ray={av.iloc[i]!r} sql={bv.iloc[i]!r}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import __ray_entry__ as e
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    fails = 0
    # Ray 2.49 fatally aborts a session after ~160 back-to-back pipeline
    # executions (reference_count.cc Check failure — hit at query 163 on
    # this list); recycle the session periodically like bench.py does.
    chunk = 60
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if ran and ran % chunk == 0:
            ray.shutdown()
            ray.init(address="local", num_cpus=8, include_dashboard=False,
                     ignore_reinit_error=True, logging_level="ERROR")
        ran += 1
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name}: RAY-ERR {type(ex).__name__}: {ex}")
            fails += 1
            continue
        if name not in oracles:
            from pyofs_ray.registry import ERROR_GATES, RECALL_GATES
            egate = ERROR_GATES.get(name)
            if egate:
                exact_sql, col, max_rel = egate
                exact = float(con.sql(exact_sql).df().iloc[0, 0])
                approx = float(ray_df[col].iloc[0])
                rel = abs(approx - exact) / exact if exact else float(approx != exact)
                ok = rel <= max_rel
                print(f"{name}: error-gate {'OK' if ok else 'FAIL'} "
                      f"(approx={approx:.0f} exact={exact:.0f} "
                      f"rel_err={rel:.4f}, max={max_rel})")
                if not ok:
                    fails += 1
                continue
            gate = RECALL_GATES.get(name)
            if gate:
                base_name, tau, cols = gate
                cols = list(cols)
                base_df = to_pandas(qs[base_name](sf_dir))
                bset = set(map(tuple, base_df[cols].to_numpy()))
                got = set(map(tuple, ray_df[cols].to_numpy()))
                recall = len(bset & got) / len(bset) if bset else 1.0
                ok = recall >= tau
                note = "" if bset else \
                    " [baseline empty: vacuous — pytest carries recall]"
                print(f"{name}: recall-gate {'OK' if ok else 'FAIL'} "
                      f"(recall={recall:.3f} vs {base_name}, tau={tau})"
                      f"{note}")
                if not ok:
                    fails += 1
                continue
            print(f"{name}: rows-only ({len(ray_df)} rows)")
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"{name}: SQL-ERR {ex}")
            fails += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name}: {verdict}")
        if verdict != "OK":
            fails += 1
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
