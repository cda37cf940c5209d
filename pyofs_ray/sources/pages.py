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
import ray
import ray.data
from .readers import read_parquet_clean


def _derive_pages(batch: pa.Table, with_html: bool,
                  with_text: bool = True, keep_key: bool = False) -> pa.Table:
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
    }
    if with_text:
        cols["text"] = batch["text"]
        cols["lang"] = batch["lang"]
    if keep_key:
        cols["page_key"] = doc_id
    if with_html:
        # realistic-enough markup for the WET-extraction stage: a head
        # script block whose CONTENT must be stripped (not just its tags)
        # plus nested body tags — stripping all of it must reproduce the
        # text column byte-for-byte (`stages/extract.py`)
        n_chars = pc.utf8_length(batch["text"].cast(pa.string()))
        html = pc.binary_join_element_wise(
            pa.array(["<html><head><script>var n="] * len(batch)),
            n_chars.cast(pa.string()),
            pa.array([";</script></head><body><p>"] * len(batch)),
            batch["text"].cast(pa.string()),
            pa.array(["</p></body></html>"] * len(batch)), "")
        cols["html"] = html.cast(pa.binary())
    return pa.table(cols)


REPLICA_STRIDE = 10_000_000  # page_key offset between replicas


def pages_dataset(sf_dir: str, with_html: bool = False, replicate: int = 1,
                  override_num_blocks: int | None = None,
                  with_text: bool = True,
                  keep_key: bool = False) -> ray.data.Dataset:
    """Read `documents` and derive the pages table (streaming, no shuffle).

    ``replicate=R`` synthesizes an R×-larger corpus deterministically: each
    replica re-keys ``doc_id + i*REPLICA_STRIDE``, which shifts hosts,
    timestamps and geocodes — a legitimate larger sample of the same
    distribution. Used by bench.py so throughput measures compute, not
    fixed overhead on a 5k-row fixture; oracle-checked queries always run
    replicate=1.
    """
    if replicate > 1:
        import math

        import pyarrow.parquet as pq

        base = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "lang"]).combine_chunks()
        base_ref = ray.put(base)  # broadcast the (small) fixture table once
        idx = base.column_names.index("doc_id")
        per_task = max(1, math.ceil(32_768 / max(len(base), 1)))

        def derive_replica_ids(b: pa.Table) -> pa.Table:
            t = ray.get(base_ref)
            parts = [
                _derive_pages(t.set_column(idx, "doc_id",
                                           pc.add(t["doc_id"],
                                                  pa.scalar(int(i) * REPLICA_STRIDE, pa.int64()))),
                              with_html, with_text, keep_key)
                for i in b["id"].to_pylist()
            ]
            return pa.concat_tables(parts)

        # one small task per few replica ids — natural wide parallelism with
        # bounded task outputs (no generator buffering pathologies)
        ids = ray.data.range(replicate,
                             override_num_blocks=max(1, replicate // per_task))
        return ids.map_batches(derive_replica_ids, batch_format="pyarrow",
                               batch_size=per_task)
    cols = ["doc_id", "text", "lang"] if with_text else ["doc_id"]
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=cols,
                               override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: _derive_pages(b, with_html, with_text, keep_key),
        batch_format="pyarrow")


def materialize_pages_parquet(sf_dir: str, out_dir: str, replicate: int = 1,
                              num_files: int = 64) -> str:
    """Write the derived pages corpus to a partitioned parquet layout once
    (the shape a real deployment reads: WARC-derived parquet shards).
    Idempotent: returns immediately if the layout exists."""
    import os

    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    ds = pages_dataset(sf_dir, replicate=replicate)
    # ingest-time enrichment: store n_chars so length-only pipelines can
    # prune the text column at the read (PyOFS stores derived variables the
    # same way); text itself stays byte-identical in the layout.
    ds = ds.map_batches(
        lambda b: b.append_column("n_chars", pc.utf8_length(b["text"]).cast(pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)
    # small corpora: coalesce to a tidy file count (cheap); large corpora:
    # write 1:1 from map tasks — a repartition here would be a pointless
    # corpus-sized all-to-all just to choose file names
    if replicate <= 1000:
        ds = ds.repartition(num_files)
    ds.write_parquet(out_dir)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def pages_from_parquet(pages_dir: str, columns: list[str] | None = None,
                       override_num_blocks: int | None = None) -> ray.data.Dataset:
    """Read a materialized pages corpus (column-pruned at the source)."""
    return read_parquet_clean(
        pages_dir, columns=columns,
        file_extensions=["parquet"],
        override_num_blocks=override_num_blocks)
