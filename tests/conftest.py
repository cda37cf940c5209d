from __future__ import annotations

import duckdb
import pytest
import ray

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.fixture(scope="session")
def duck_smoke():
    return make_duckdb(SF_SMOKE)


def assert_matches_oracle(result, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Driver-equivalent compare: rows, sorted-name schema, exact values."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
    elif isinstance(result, pa.Table):
        df = result.to_pandas()
    else:
        df = result
    sdf = con.sql(sql).df()
    assert len(df) == len(sdf), f"rows {len(df)} != {len(sdf)}"
    a = df.reindex(sorted(df.columns), axis=1)
    b = sdf.reindex(sorted(sdf.columns), axis=1)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.array_equal(av.to_numpy(dtype=float), bv.to_numpy(dtype=float),
                                  equal_nan=True), f"float col {c} differs"
        else:
            assert av.astype(str).equals(bv.astype(str)), f"col {c} differs"
