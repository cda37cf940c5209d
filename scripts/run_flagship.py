"""Production-style driver: `ray job submit -- python scripts/run_flagship.py
--sf-dir ... --out /data/out` — runs the checkpointed flagship pipeline with
per-partition manifest commits; re-running resumes from the last committed
partition (kill it mid-run and start again to see the skip).

Owns its Ray session (the library never calls ray.init — driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/pyofs_ray_flagship_out")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--fail-after", type=int, default=None,
                    help="inject a crash after N partition commits (demo)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from pyofs_ray.pipelines.flagship import run_flagship_checkpointed

    res = run_flagship_checkpointed(args.sf_dir, args.out,
                                    fail_after=args.fail_after)
    print(json.dumps({"out": args.out, **res}))
    ray.shutdown()


if __name__ == "__main__":
    main()
