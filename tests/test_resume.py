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


def test_tracking_resumes_from_last_committed_snapshot(tmp_path):
    """round-3 item 8: a killed tracking run must resume MID-TRAJECTORY
    from the last committed snapshot, and the resumed trajectory must be
    bit-identical to an uninterrupted run."""
    import numpy as np

    from pyofs_ray.stages import tracking

    out_dir = str(tmp_path / "track_ckpt")
    seeds = tracking.circle_seeds(12, radius=400.0)
    field = tracking.default_gridded_field()
    kw = dict(field=field, dt=30.0, steps=20, snapshot_every=5, order=4)

    # uninterrupted references: plain track + checkpointed-in-one-go
    want = (tracking.track(seeds, **kw).to_pandas()
            .sort_values(["step", "particle_id"]).reset_index(drop=True))

    # crash after 3 commits (steps 0, 5, 10 durable; 15, 20 lost)
    with pytest.raises(RuntimeError, match="injected failure"):
        tracking.track_checkpointed(seeds, out_dir, fail_after=3, **kw)
    man = Manifest(out_dir)
    assert set(man.committed()) == {"step_000000", "step_000005",
                                    "step_000010"}
    mtime_before = os.path.getmtime(os.path.join(out_dir, "step_000010"))

    # restart: completes, committed snapshots are NOT recomputed
    got_ds = tracking.track_checkpointed(seeds, out_dir, **kw)
    assert set(man.committed()) == {f"step_{s:06d}" for s in
                                    (0, 5, 10, 15, 20)}
    assert os.path.getmtime(os.path.join(out_dir, "step_000010")) == \
        mtime_before
    got = (got_ds.to_pandas().sort_values(["step", "particle_id"])
           .reset_index(drop=True))
    for c in ("x", "y", "t"):
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c
    # lineage recorded on every snapshot commit
    for rec in man.committed().values():
        assert "rk4" in rec.lineage

    # third call is a pure read-back (everything committed)
    again = tracking.track_checkpointed(seeds, out_dir, **kw).to_pandas()
    assert len(again) == len(want)


def test_curation_resumes_from_committed_stage(tmp_path, monkeypatch):
    """round-4 verdict #5: the 4-stage curation chain must resume from the
    last committed stage — the raw corpus is scanned ONCE across a crash,
    and the resumed output is bit-identical to an uninterrupted run."""
    import numpy as np

    import pyofs_ray.pipelines.corpus as cp

    out_dir = str(tmp_path / "curate_ckpt")
    scans = []
    orig_docs = cp._docs
    monkeypatch.setattr(
        cp, "_docs", lambda *a, **kw: scans.append(1) or orig_docs(*a, **kw))

    want = (cp.curate_docs(orig_docs(SF_SMOKE)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))

    # crash after the first commit: only `filtered` durable, ONE raw scan
    with pytest.raises(RuntimeError, match="injected failure"):
        cp.curate_docs_checkpointed(SF_SMOKE, out_dir, fail_after=1)
    man = Manifest(out_dir)
    assert set(man.committed()) == {"filtered"}
    assert len(scans) == 1

    # restart: completes from the checkpoint with ZERO raw-corpus scans
    got = (cp.curate_docs_checkpointed(SF_SMOKE, out_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(scans) == 1, "restart re-scanned the raw corpus"
    assert set(man.committed()) == {"filtered", "exact_dup_map",
                                    "near_drop", "curated"}
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c

    # every stage commit carries lineage + metrics
    for rec in man.committed().values():
        assert rec.rows >= 0 and rec.bytes >= 0 and rec.lineage

    # third call is a pure read-back — still no further raw scans
    again = cp.curate_docs_checkpointed(SF_SMOKE, out_dir).to_pandas()
    assert len(scans) == 1
    assert len(again) == len(want)
