"""WET-style source readers: JSONL and WETR length-prefixed containers."""

from __future__ import annotations

import json

import pytest
import ray.data

from pyofs_ray.sources.wet import (read_wet_jsonl, read_wet_records,
                                   write_wet_records)

RECS = [
    {"url": "https://h1.example.com/p/1", "warc_ts": "2024-01-02T03:04:05",
     "text": "hello world", "lang": "en"},
    {"url": "https://h2.example.com/p/2", "warc_ts": "2024-02-03T04:05:06",
     "text": "bonjour", "lang": None},
    {"url": "https://h3.example.com/p/3", "warc_ts": "2024-03-04T05:06:07",
     "text": "hola"},
]


def _check(df):
    df = df.sort_values("url").reset_index(drop=True)
    assert list(df.columns) == ["url", "warc_ts", "text", "lang"]
    assert df.text.tolist() == ["hello world", "bonjour", "hola"]
    # missing/null lang normalizes to 'und'
    assert df.lang.tolist() == ["en", "und", "und"]
    assert str(df.warc_ts.iloc[0]) == "2024-01-02 03:04:05"


def test_read_wet_jsonl(tmp_path):
    p = tmp_path / "part-000.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in RECS) + "\n")
    _check(read_wet_jsonl([str(p)]).to_pandas())


def test_read_wet_records_roundtrip(tmp_path):
    a, b = tmp_path / "a.wetr", tmp_path / "b.wetr"
    write_wet_records(str(a), RECS[:2])
    write_wet_records(str(b), RECS[2:])
    _check(read_wet_records([str(a), str(b)]).to_pandas())


def test_wet_records_truncated_raises(tmp_path):
    p = tmp_path / "bad.wetr"
    write_wet_records(str(p), RECS[:1])
    data = p.read_bytes()
    p.write_bytes(data[:-3])  # cut mid-payload
    with pytest.raises(Exception, match="truncated"):
        read_wet_records([str(p)]).to_pandas()


def test_wet_missing_required_field_raises(tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(json.dumps({"url": "u", "warc_ts": "2024-01-01T00:00:00"})
                 + "\n")
    with pytest.raises(Exception, match="text"):
        read_wet_jsonl([str(p)]).to_pandas()


def test_wet_feeds_downstream_operators(tmp_path):
    """The normalized schema drops straight into an existing pipeline
    stage (host extraction + dedup by text hash)."""
    from pyofs_ray.pipelines.flagship import url_host
    p = tmp_path / "part.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in RECS) + "\n")
    ds = read_wet_jsonl([str(p)])
    hosts = sorted(url_host(ds.to_pandas().url.pipe(
        lambda s: __import__("pyarrow").array(s))).to_pylist())
    assert hosts == ["h1.example.com", "h2.example.com", "h3.example.com"]
