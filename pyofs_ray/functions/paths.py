"""Path parsing utilities (SURVEY.md §2.8 — the `PyOFS/__init__.py:91-105`
`split_layer_filename` analogue plus the engine's own partition-dir codec).
"""

from __future__ import annotations

import os


def split_layer_filename(path: str) -> tuple[str, str | None]:
    """``"dir/file.gpkg:layer"`` → ``("dir/file.gpkg", "layer")``; paths
    without a layer suffix return ``(path, None)``. Windows drive letters
    (``C:\\...``) are not treated as layer separators."""
    head, sep, tail = path.rpartition(":")
    if not sep or not tail or (len(head) == 1 and head.isalpha()):
        return path, None  # no ':' / trailing ':' / Windows drive letter
    if os.sep in tail or "/" in tail:
        return path, None  # ':' inside a directory name, not a layer
    return head, tail


def partition_dir(key: str, value: str) -> str:
    """Hive-style partition directory name (``day=2024-01-01``)."""
    return f"{key}={value}"


def parse_partition_dir(name: str) -> tuple[str, str]:
    """Inverse of :func:`partition_dir`; raises on non-partition names."""
    key, sep, value = name.partition("=")
    if not sep or not key:
        raise ValueError(f"not a partition directory name: {name!r}")
    return key, value
