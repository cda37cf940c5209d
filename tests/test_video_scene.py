"""Video scene-cut detection (multimodal.video_scene_changes)."""

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages.multimodal import (
    VHEADER, VMAGIC, synth_video_batch, video_scene_changes)


def _clip(mid, frames):
    nf, h, w = frames.shape
    head = (VMAGIC + int(w).to_bytes(4, "little")
            + int(h).to_bytes(4, "little") + int(nf).to_bytes(2, "little")
            + (0).to_bytes(3, "little"))
    return {"media_id": mid, "payload": head + frames.astype(
        np.uint8).tobytes()}


def test_scene_changes_counts_hard_cuts():
    h, w = 4, 4
    flat = np.zeros((3, h, w))           # no cuts
    cutty = np.stack([np.zeros((h, w)), np.full((h, w), 100),
                      np.full((h, w), 101), np.zeros((h, w))])  # 2 cuts
    ds = ray.data.from_arrow(pa.Table.from_pylist(
        [_clip(1, flat), _clip(2, cutty)]))
    out = video_scene_changes(ds).to_pandas().set_index("media_id")
    assert out.loc[1].n_changes == 0 and out.loc[1].n_frames == 3
    # deltas: 1600 (cut), 16 (1 level — below 2·h·w=32), 1616 (cut)
    assert out.loc[2].n_changes == 2


def test_scene_changes_fixture_matches_reference():
    ids = np.arange(200, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids})).map_batches(
        synth_video_batch, batch_format="pyarrow", batch_size=64)
    out = video_scene_changes(ds).to_pandas().set_index("media_id")
    for i in [3, 17, 42, 101]:
        w = 8 + i % 5 * 4
        h = 6 + i % 3 * 4
        nf = 4 + i % 11
        r = np.arange(h)[:, None, None] * 31
        c = np.arange(w)[None, :, None] * 7
        f = np.arange(nf)[None, None, :] * 13
        px = (r + c + f + i % (1 << 24)) % 256
        d = np.abs(np.diff(px.sum(axis=(0, 1))))
        assert out.loc[i].n_changes == int((d > 2 * h * w).sum())
