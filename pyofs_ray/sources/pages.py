"""Pages source: the Common-Crawl-style input table (BASELINE.json input_hint).

Schema: ``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string``. In production this is ``ray.data.read_parquet`` over a
WARC-derived parquet layout; in this sandbox the table is derived
*deterministically* from the driver's ``documents.parquet`` (TESTDATA.md) so
the DuckDB oracle (``core.sqlgen.PAGES_CTE``) can reconstruct the identical
rows. No external data, no randomness.

Scale notes (100 TB): the derivation is a stateless ``map_batches`` in
``batch_format="pyarrow"`` — url/ts synthesis is Arrow-kernel string/int math,
zero-copy from the object store. ``html`` (the wide binary column, SURVEY.md
§7.4 "very wide rows") is only attached when ``with_html=True`` and is
projected away by every downstream stage that doesn't need it; it is never
shuffled.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _derive_pages(batch: pa.Table, with_html: bool) -> pa.Table:
    doc_id = batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray) else batch["doc_id"]
    k = doc_id.to_numpy(zero_copy_only=False).astype(np.int64)
    host = np.where(k % 10 < 7, 0, k % 97).astype(np.int64)
    url = pc.binary_join_element_wise(
        pa.array(["https://h"] * len(batch)),
        pa.array(host.astype(str)),
        pa.array([".example.com/p/"] * len(batch)),
        pa.array(k.astype(str)),
        "",
    )
    base = np.datetime64("2024-01-01T00:00:00", "us")
    warc_ts = base + ((k * 37) % 2_592_000).astype("timedelta64[s]").astype("timedelta64[us]")
    cols = {
        "url": url,
        "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
        "text": batch["text"],
        "lang": batch["lang"],
    }
    if with_html:
        html = pc.binary_join_element_wise(
            pa.array(["<html><body>"] * len(batch)), batch["text"].cast(pa.string()),
            pa.array(["</body></html>"] * len(batch)), "")
        cols["html"] = html.cast(pa.binary())
    return pa.table(cols)


def pages_dataset(sf_dir: str, with_html: bool = False) -> ray.data.Dataset:
    """Read `documents` and derive the pages table (streaming, no shuffle)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    return ds.map_batches(lambda b: _derive_pages(b, with_html), batch_format="pyarrow")
