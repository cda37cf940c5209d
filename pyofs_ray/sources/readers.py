"""Metadata-clean parquet reads.

The driver's parquet fixtures embed pandas metadata (``b'pandas'`` → a
Python dict) in the Arrow schema; ``pyarrow.Schema.__hash__`` raises on it,
so every downstream block coalesce in Ray Data logs ``Failed to hash the
schemas (for deduplication): unhashable type: 'dict'`` and skips its
schema-dedup fast path. Strip the metadata once at the source — the strip
is a zero-copy map that fuses with the read task.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _strip(b: pa.Table) -> pa.Table:
    return b.replace_schema_metadata(None)


def read_parquet_clean(path, **kwargs) -> ray.data.Dataset:
    """`ray.data.read_parquet` with schema metadata stripped at the read."""
    return ray.data.read_parquet(path, **kwargs).map_batches(
        _strip, batch_format="pyarrow", zero_copy_batch=True)
