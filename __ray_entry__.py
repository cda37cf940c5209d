"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing in
``pyofs_ray`` calls ``ray.init``/``ray.shutdown``. See ``pyofs_ray.registry``
for the operator inventory (one entry per SURVEY.md §2 item) and the DuckDB
oracle twins.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline (pages → geocode → per-cell agg → tile pyramid)
    on sf0.001; returns the tile-row Dataset."""
    from pyofs_ray.pipelines.flagship import flagship

    return flagship(SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[str], Any]]:
    from pyofs_ray.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pyofs_ray.registry import ORACLES

    return dict(ORACLES)
