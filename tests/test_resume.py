"""Kill/restart resume test (north_rule): a partially-committed run must
resume from the last committed partition — no duplicates, no recompute."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from pyofs_ray.pipelines.flagship import day_units, run_flagship_checkpointed
from pyofs_ray.state.manifest import Manifest, audit_missing

from .conftest import SF_SMOKE

OUT = "/tmp/pyofs_ray_test_resume"


@pytest.fixture()
def out_dir():
    shutil.rmtree(OUT, ignore_errors=True)
    yield OUT
    shutil.rmtree(OUT, ignore_errors=True)


def test_kill_restart_resume(out_dir, monkeypatch):
    # single-pass guard: each invocation may scan the corpus at most once,
    # regardless of how many day partitions it commits
    import pyofs_ray.pipelines.flagship as fs
    scans = []
    orig = fs.geocoded_pages
    monkeypatch.setattr(fs, "geocoded_pages",
                        lambda *a, **kw: scans.append(1) or orig(*a, **kw))

    # first run dies after 7 committed partitions
    with pytest.raises(RuntimeError, match="injected failure"):
        run_flagship_checkpointed(SF_SMOKE, out_dir, fail_after=7)
    man = Manifest(out_dir)
    assert len(man.committed()) == 7
    assert len(scans) == 1
    missing = audit_missing(out_dir, day_units())
    assert len(missing) == 30 - 7

    # restart: must run exactly the missing 23, skip the 7 committed,
    # with one corpus scan (not one per day)
    res = run_flagship_checkpointed(SF_SMOKE, out_dir)
    assert res == {"committed": 30, "ran": 23, "skipped": 7, "scans": 1}
    assert len(scans) == 2
    assert audit_missing(out_dir, day_units()) == []

    # every committed partition has lineage + row/byte metrics
    for rec in man.committed().values():
        assert rec.rows >= 0 and rec.bytes >= 0
        assert "geocode→cellagg" in rec.lineage and rec.partition_id in rec.lineage
    # the smoke corpus is small enough that all pages share day 1
    assert man.committed()["day=2024-01-01"].rows > 0

    # third run is a full no-op: zero scans, nothing recomputed
    res2 = run_flagship_checkpointed(SF_SMOKE, out_dir)
    assert res2 == {"committed": 30, "ran": 0, "skipped": 30, "scans": 0}
    assert len(scans) == 2

    # the union of partition outputs equals the unpartitioned aggregate
    con = duckdb.connect()
    total = con.sql(f"""
        SELECT SUM(doc_count) FROM read_parquet('{out_dir}/day=*/*.parquet')
    """).fetchone()[0]
    docs = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_SMOKE}/documents.parquet')").fetchone()[0]
    assert total == docs, "every page lands in exactly one day partition"
