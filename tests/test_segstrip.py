"""Global frequent-segment strip (CCNet line-dedup analogue) — injected
boilerplate, alignment and edge cases."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from pyofs_ray.stages.segstrip import (frequent_segment_strip,
                                       frequent_segments)


def _mk(docs):
    return ray.data.from_arrow(pa.table(
        {"doc_id": list(range(len(docs))), "text": docs}))


def test_injected_boilerplate_stripped_everywhere(ray_session):
    seg = " ".join(f"b{i}" for i in range(16))
    docs = [f"{seg} unique{j} tail{j}" for j in range(5)] + ["solo text here"]
    out = (frequent_segment_strip(_mk(docs), k=16, min_df=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 6
    for j in range(5):
        assert out.loc[j, "clean_text"] == f"unique{j} tail{j}"
        assert out.loc[j, "n_removed"] == 1
    assert out.loc[5, "clean_text"] == "solo text here"
    assert out.loc[5, "n_removed"] == 0


def test_below_min_df_keeps_everything(ray_session):
    seg = " ".join(f"c{i}" for i in range(16))
    docs = [f"{seg} a", f"{seg} b", "other doc"]
    out = (frequent_segment_strip(_mk(docs), k=16, min_df=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (out["n_removed"] == 0).all()
    assert out.loc[0, "clean_text"] == f"{seg} a"


def test_alignment_matters_like_line_dedup(ray_session):
    """A shifted copy of the same 16 tokens is a DIFFERENT segment —
    alignment-sensitive, exactly like line-level dedup (a moved line is
    a different line)."""
    seg = " ".join(f"d{i}" for i in range(16))
    docs = [f"{seg} x{j}" for j in range(4)] + [f"pad {seg}"]
    fr = (frequent_segments(_mk(docs), k=16, min_df=4)
          .to_pandas())
    assert list(fr["seg"]) == [seg]
    out = (frequent_segment_strip(_mk(docs), k=16, min_df=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[4, "n_removed"] == 0  # shifted copy untouched


def test_fully_boilerplate_doc_keeps_empty_string(ray_session):
    seg = " ".join(f"e{i}" for i in range(16))
    docs = [seg] * 4 + [""]
    out = (frequent_segment_strip(_mk(docs), k=16, min_df=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (out.loc[:3, "clean_text"] == "").all()
    assert (out.loc[:3, "n_removed"] == 1).all()
    assert out.loc[4, "clean_text"] == "" and out.loc[4, "n_removed"] == 0


def test_broadcast_guard_raises_loudly(ray_session):
    """Forcing the broadcast plan past its cap must refuse loudly
    (auto would route to the co-bucket plan instead — tested below)."""
    seg = " ".join(f"f{i}" for i in range(16))
    docs = [seg] * 4
    with pytest.raises(ValueError, match="broadcast cap"):
        frequent_segment_strip(_mk(docs), k=16, min_df=4,
                               broadcast_max_rows=0,
                               path="broadcast").to_pandas()


def test_cobucket_equals_broadcast(ray_session):
    """r5: the unbounded-frequent-set co-bucket apply plan must emit the
    broadcast plan's rows exactly."""
    import ray.data

    from pyofs_ray.sources.readers import read_parquet_clean
    from pyofs_ray.stages.segstrip import frequent_segment_strip

    from .conftest import SF_SMOKE

    ds = read_parquet_clean(f"{SF_SMOKE}/documents.parquet",
                            columns=["doc_id", "text"])
    bc = (frequent_segment_strip(ds, path="broadcast").to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    cb = (frequent_segment_strip(ds, path="cobucket").to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert (bc["n_removed"] > 0).any()  # the plan is actually exercised
    assert bc.equals(cb)


def test_auto_routes_cobucket_past_cap(ray_session):
    """auto must pick the co-bucket plan when the frequent set exceeds
    the broadcast cap — and still strip correctly."""
    seg = " ".join(f"g{i}" for i in range(16))
    docs = [f"{seg} u{j}" for j in range(4)]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(4)), "text": docs}))
    out = (frequent_segment_strip(ds, k=16, min_df=4,
                                  broadcast_max_rows=0, path="auto")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["clean_text"]) == [f"u{j}" for j in range(4)]
    assert (out["n_removed"] == 1).all()
