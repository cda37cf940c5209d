"""WET-style text-record sources: JSONL and length-prefixed record files
normalized to the pages schema (url, warc_ts, text, lang).

The reference ingests many container formats (NetCDF granules, TAR
archives, FTP listings — SURVEY.md S1–S5); the web-corpus counterparts
are Common Crawl's WET/WARC containers. This module covers the two
shapes a 100 TB crawl drop actually arrives in:

- ``read_wet_jsonl`` — JSON-lines conversion output (one record per
  line). Rides ``ray.data.read_json`` (Arrow JSON reader — streaming,
  splittable by file), then one vectorized normalize pass: required-field
  check, timestamp parse, lang fill.
- ``read_wet_records`` — a minimal binary record container
  (``WETR`` magic, uint32-LE length-prefixed UTF-8 JSON payloads — the
  length-prefix discipline of WARC without the HTTP framing). Files are
  listed and read ONE FILE PER TASK via ``ray.data.read_binary_files``
  (files are the split unit — record boundaries never straddle tasks),
  decoded in a vectorized batch pass.

Both return the exact pages schema so every downstream operator
(geocode, dedup, tiles, …) runs unchanged; malformed records raise
loudly with file/record context rather than silently dropping (the
dead-letter variant is `stages/deadletter.py`).
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

REQUIRED = ("url", "warc_ts", "text")
WETR_MAGIC = b"WETR"


def _normalize(b: pa.Table) -> pa.Table:
    for col in REQUIRED:
        if col not in b.column_names:
            raise ValueError(f"wet source: record batch missing required "
                             f"field {col!r} (have {b.column_names})")
        if b[col].null_count:
            raise ValueError(f"wet source: null {col!r} in record batch — "
                             "route through the dead-letter reader to "
                             "quarantine instead")
    ts = b["warc_ts"]
    if pa.types.is_string(ts.type):
        ts = pc.strptime(ts, format="%Y-%m-%dT%H:%M:%S", unit="us")
    else:
        ts = pc.cast(ts, pa.timestamp("us"))
    lang = (pc.fill_null(b["lang"], "und") if "lang" in b.column_names
            else pa.nulls(len(b), pa.string()).fill_null("und"))
    return pa.table({"url": pc.cast(b["url"], pa.string()),
                     "warc_ts": ts,
                     "text": pc.cast(b["text"], pa.string()),
                     "lang": lang})


def read_wet_jsonl(paths) -> ray.data.Dataset:
    """JSON-lines WET conversion → pages-schema Dataset (streaming;
    files are the parallelism unit)."""
    return ray.data.read_json(paths).map_batches(
        _normalize, batch_format="pyarrow", zero_copy_batch=True)


def write_wet_records(path: str, records: list[dict]) -> None:
    """Writer for the WETR container (tests + re-export sink): magic,
    then uint32-LE length-prefixed JSON payloads."""
    with open(path, "wb") as f:
        f.write(WETR_MAGIC)
        for r in records:
            payload = json.dumps(r, separators=(",", ":")).encode()
            f.write(struct.pack("<I", len(payload)))
            f.write(payload)


def _decode_wetr(b: pa.Table) -> pa.Table:
    rows = []
    for path, blob in zip(b["path"].to_pylist(), b["bytes"].to_pylist()):
        if blob[:4] != WETR_MAGIC:
            raise ValueError(f"wet source: {path} lacks the WETR magic")
        off, n = 4, len(blob)
        i = 0
        while off < n:
            if off + 4 > n:
                raise ValueError(f"wet source: {path} record {i} — "
                                 "truncated length prefix")
            (ln,) = struct.unpack_from("<I", blob, off)
            off += 4
            if off + ln > n:
                raise ValueError(f"wet source: {path} record {i} — "
                                 f"payload truncated ({ln} B declared)")
            rows.append(json.loads(blob[off:off + ln]))
            off += ln
            i += 1
    if not rows:
        return pa.table({"url": pa.array([], pa.string()),
                         "warc_ts": pa.array([], pa.timestamp("us")),
                         "text": pa.array([], pa.string()),
                         "lang": pa.array([], pa.string())})
    return _normalize(pa.Table.from_pylist(rows))


def read_wet_records(paths) -> ray.data.Dataset:
    """WETR container files → pages-schema Dataset. One file per read
    task (``read_binary_files``): the container's record framing never
    crosses a task boundary, so decode is stateless per file — the same
    partitioning argument as the reference's per-granule readers."""
    return ray.data.read_binary_files(paths, include_paths=True) \
        .map_batches(_decode_wetr, batch_format="pyarrow")
