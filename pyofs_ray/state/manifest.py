"""Checkpoint manifest + resumable partitioned runs.

Analogue of the reference's resume machinery (SURVEY.md J7/O4/K6):
`files.json` output manifest (`write_json.py:15-48`), skip-existing
anti-joins (`write_daily_average.py:289-311`, `:446-517`) and the
download size check (`download.py:148`) — hardened into the north_rule
requirement: *every partition emits lineage records plus row/byte metrics to
a checkpoint manifest enabling resume from the last committed partition.*

Design:
- a **work unit** = one key-range partition of the input (here: the day
  bucket of ``warc_ts``; at 100 TB: one input shard / key range per unit);
- each unit runs its own streaming sub-pipeline and writes Parquet to
  ``out_dir/<unit>/`` via temp-dir + atomic rename;
- after a successful rename, one manifest row
  ``(partition_id, rows, bytes, lineage, committed_at)`` is appended as its
  own JSON file (one file per commit → no read-modify-write races);
- resume = anti-join of planned units against committed manifest ids —
  committed partitions are never recomputed (verified by the kill/restart
  test in ``tests/test_resume.py``).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass

import ray.data


@dataclass
class CommitRecord:
    partition_id: str
    rows: int
    bytes: int
    lineage: str
    committed_at: float


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def committed(self) -> dict[str, CommitRecord]:
        out = {}
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    rec = CommitRecord(**json.load(fh))
                out[rec.partition_id] = rec
        return out

    def commit(self, rec: CommitRecord) -> None:
        tmp = os.path.join(self.dir, f".{rec.partition_id}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(rec.__dict__, fh)
        os.replace(tmp, os.path.join(self.dir, f"{rec.partition_id}.json"))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _write_and_commit(man: Manifest, out_dir: str, unit: str,
                      ds: ray.data.Dataset, lineage: str) -> None:
    """Atomic partition write (temp dir + rename) followed by one manifest
    commit row with row/byte metrics — the unit of resume."""
    final_dir = os.path.join(out_dir, unit)
    tmp_dir = os.path.join(out_dir, f".{unit}.tmp")
    import shutil
    for stale in (tmp_dir, final_dir):  # partial write / uncommitted rename
        if os.path.exists(stale):
            shutil.rmtree(stale)
    ds.write_parquet(tmp_dir)
    os.makedirs(tmp_dir, exist_ok=True)  # empty partition → empty dir commit
    # row count from written file metadata (no second pipeline pass)
    import pyarrow.parquet as pq
    rows = sum(pq.read_metadata(os.path.join(tmp_dir, f)).num_rows
               for f in os.listdir(tmp_dir) if f.endswith(".parquet"))
    os.replace(tmp_dir, final_dir)
    man.commit(CommitRecord(
        partition_id=unit, rows=rows, bytes=_dir_bytes(final_dir),
        lineage=lineage, committed_at=time.time()))


# public name: iterative operators (e.g. `stages.tracking.track_checkpointed`)
# commit their own unit sequence through the same atomic write + manifest row
write_and_commit = _write_and_commit


def run_partitioned(
    out_dir: str,
    units: Sequence[str],
    build: Callable[[str], ray.data.Dataset],
    lineage: Callable[[str], str] = lambda u: u,
    fail_after: int | None = None,
) -> dict:
    """Run one streaming sub-pipeline per *pending* work unit, committing a
    manifest row after each atomic partition write. ``fail_after`` injects a
    crash after N commits (for the kill/restart test).

    Right when units are genuinely separate inputs (one shard per unit).
    When every unit filters the SAME input, use ``run_single_pass`` — this
    runner would re-scan the corpus once per unit.

    Returns {"committed": n_total, "ran": n_this_run, "skipped": n_resumed}.
    """
    man = Manifest(out_dir)
    done = man.committed()
    ran = 0
    for unit in units:
        if unit in done:
            continue
        if fail_after is not None and ran >= fail_after:
            raise RuntimeError(f"injected failure after {ran} commits")
        _write_and_commit(man, out_dir, unit, build(unit), lineage(unit))
        ran += 1
    done = man.committed()
    return {"committed": len(done), "ran": ran,
            "skipped": len([u for u in units if u in done]) - ran}


def run_single_pass(
    out_dir: str,
    units: Sequence[str],
    build_pending: Callable[[Sequence[str]], ray.data.Dataset],
    unit_col: str = "unit",
    lineage: Callable[[str], str] = lambda u: u,
    fail_after: int | None = None,
) -> dict:
    """Checkpointed partitioned run that scans the input ONCE for all
    pending units (the `write_daily_average.py` skip-existing analogue
    without its per-day read amplification).

    ``build_pending(pending)`` returns one streaming plan whose output
    carries ``unit_col`` and is **key-bounded** (an aggregate — one row per
    (unit, key)); it must filter the input to the pending units at the
    plan/read level, so committed units cost no I/O on resume. The bounded
    result is pinned once, then each unit's slice is written + committed
    atomically in order. A crash between commits loses at most one
    uncommitted slice; the restart re-scans only the still-pending units —
    a 30-day resume reads the corpus once, not 30 times.

    Returns {"committed", "ran", "skipped", "scans"} — ``scans`` is the
    number of full input scans this invocation performed (0 or 1).
    """
    import pyarrow.compute as pc

    man = Manifest(out_dir)
    done = man.committed()
    pending = [u for u in units if u not in done]
    ran = 0
    if pending:
        # one corpus scan; the materialized result is one row per
        # (unit, key) — bounded by key cardinality, not input rows
        agg = build_pending(pending).materialize()
        for unit in pending:
            if fail_after is not None and ran >= fail_after:
                raise RuntimeError(f"injected failure after {ran} commits")
            part = agg.map_batches(
                lambda b, u=unit: b.filter(pc.equal(b[unit_col], u))
                                   .drop_columns([unit_col]),
                batch_format="pyarrow")
            _write_and_commit(man, out_dir, unit, part, lineage(unit))
            ran += 1
    done = man.committed()
    return {"committed": len(done), "ran": ran,
            "skipped": len([u for u in units if u in done]) - ran,
            "scans": 1 if pending else 0}


def audit_missing(out_dir: str, expected_units: Sequence[str]) -> list[str]:
    """Completeness audit (SURVEY.md A9, `check_files.py:18-65` analogue):
    expected units with no committed manifest row."""
    done = Manifest(out_dir).committed()
    return [u for u in expected_units if u not in done]
