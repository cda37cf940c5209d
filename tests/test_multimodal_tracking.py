"""Tests for multimodal decode stages and particle tracking."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyofs_ray.stages import multimodal, tracking


def _media_ds(n=50):
    ids = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    return ray.data.from_arrow(multimodal.synth_media_batch(ids))


def test_media_schema_and_decode():
    ds = _media_ds()
    out = multimodal.decode_media(ds).to_pandas()
    assert len(out) == 50
    assert {"media_id", "px_mean", "px_std", "thumb"} <= set(out.columns)
    assert all(len(t) == 64 for t in out.thumb)
    # deterministic: decode twice → identical features
    out2 = multimodal.decode_media(_media_ds()).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert np.array_equal(a.px_mean.to_numpy(), b.px_mean.to_numpy())


def test_decode_matches_scalar_oracle():
    ids = pa.table({"doc_id": pa.array([3], type=pa.int64())})
    t = multimodal.synth_media_batch(ids)
    img = multimodal._decode_fake(t["payload"][0].as_py())
    w, h = t["width"][0].as_py(), t["height"][0].as_py()
    assert img.shape == (h, w)
    # pixel formula oracle
    assert img[2, 5] == (2 * 31 + 5 * 7 + 3) % 256


def test_actor_pool_mode_matches_tasks():
    """compute='actors' (the real-codec path: expensive init pinned to a
    pool) must produce the same features as the default memoized tasks."""
    a = (multimodal.decode_media(_media_ds(), compute="tasks")
         .to_pandas().sort_values("media_id").reset_index(drop=True))
    b = (multimodal.decode_media(_media_ds(), compute="actors",
                                 concurrency=(1, 2))
         .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert np.array_equal(a.px_mean.to_numpy(), b.px_mean.to_numpy())
    assert np.array_equal(a.px_std.to_numpy(), b.px_std.to_numpy())


def test_real_decoder_stub_raises():
    with pytest.raises(NotImplementedError, match="Pillow"):
        multimodal.MediaDecoder(decoder="pil")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        multimodal.MediaDecoder(decoder="ffmpeg")


def test_audio_decode_and_scalar_oracle():
    ids = pa.table({"doc_id": pa.array(list(range(40)), type=pa.int64())})
    clips = ray.data.from_arrow(multimodal.synth_audio_batch(ids))
    out = (multimodal.decode_audio(clips).to_pandas()
           .sort_values("media_id").reset_index(drop=True))
    assert len(out) == 40
    assert {"media_id", "n_samples", "sample_rate", "duration_s", "rms",
            "zero_crossings"} <= set(out.columns)
    # scalar oracle for doc 3: recompute from the generator formula
    n, rate, seed = 256 + 3 % 11 * 64, 8000 + 3 % 3 * 4000, 3
    s = (np.arange(n, dtype=np.int64) * 37 + seed) % 4096 - 2048
    row = out[out.media_id == 3].iloc[0]
    assert row.n_samples == n and row.sample_rate == rate
    assert row.rms == np.sqrt(float((s * s).sum()) / n)
    assert row.zero_crossings == np.count_nonzero(
        (s[1:] >= 0) != (s[:-1] >= 0))
    # actor-pool mode produces identical features
    out2 = (multimodal.decode_audio(
                ray.data.from_arrow(multimodal.synth_audio_batch(ids)),
                compute="actors", concurrency=(1, 2)).to_pandas()
            .sort_values("media_id").reset_index(drop=True))
    assert np.array_equal(out.rms.to_numpy(), out2.rms.to_numpy())


def test_audio_real_decoder_stub_raises():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        multimodal.AudioDecoder(decoder="ffmpeg")
    with pytest.raises(ValueError, match="FAKA1"):
        multimodal.AudioDecoder()(pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"nope"], pa.binary())}))


def _numpy_track_oracle(seeds, field, dt, steps, order):
    x = seeds["x"].to_numpy(zero_copy_only=False).copy()
    y = seeds["y"].to_numpy(zero_copy_only=False).copy()
    for _ in range(steps):
        if order == 1:
            u, v = field.velocity(x, y)
            x, y = x + u * dt, y + v * dt
        else:
            u1, v1 = field.velocity(x, y)
            u2, v2 = field.velocity(x + u1 * dt / 2, y + v1 * dt / 2)
            u3, v3 = field.velocity(x + u2 * dt / 2, y + v2 * dt / 2)
            u4, v4 = field.velocity(x + u3 * dt, y + v3 * dt)
            x = x + (u1 + 2 * u2 + 2 * u3 + u4) * dt / 6
            y = y + (v1 + 2 * v2 + 2 * v3 + v4) * dt / 6
    return x, y


def test_tracking_matches_numpy_oracle_bitwise():
    seeds = tracking.circle_seeds(16, radius=400.0)
    field = tracking.RankineVortexField(radius=1000.0, period=3600.0)
    out = tracking.track(seeds, field=field, dt=30.0, steps=20,
                         snapshot_every=20, order=4).to_pandas()
    last = out[out.step == 20].sort_values("particle_id")
    ox, oy = _numpy_track_oracle(seeds, field, 30.0, 20, 4)
    assert np.array_equal(last.x.to_numpy(), ox)
    assert np.array_equal(last.y.to_numpy(), oy)


def test_tracking_rotation_preserves_radius():
    # solid-body core: a ring inside the vortex radius rotates rigidly
    seeds = tracking.circle_seeds(32, radius=500.0)
    field = tracking.RankineVortexField(radius=1000.0, period=3600.0)
    out = tracking.track(seeds, field=field, dt=10.0, steps=30,
                         snapshot_every=30, order=4).to_pandas()
    last = out[out.step == 30]
    r = np.sqrt(last.x**2 + last.y**2)
    assert np.allclose(r, 500.0, rtol=1e-3)
    m0 = tracking.contour_measures(
        pa.Table.from_pandas(out[out.step == 0][["particle_id", "x", "y"]]))
    m1 = tracking.contour_measures(
        pa.Table.from_pandas(last[["particle_id", "x", "y"]]))
    assert abs(m1["area"] - m0["area"]) / m0["area"] < 0.01


def test_video_frame_sampling():
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from pyofs_ray.stages.multimodal import (FrameSampler, sample_frames,
                                             synth_video_batch)

    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(30))}))
    media = ds.map_batches(synth_video_batch, batch_format="pyarrow")
    out = sample_frames(media, every=3).to_pandas()
    # every-3rd frame per clip: doc 0 has 4 frames → indices 0, 3
    f0 = sorted(out[out.media_id == 0].frame_idx)
    assert f0 == [0, 3]
    # frame means are exact integer-moment values in [0, 255]
    assert ((out.px_mean >= 0) & (out.px_mean <= 255)).all()
    # per-clip frame counts follow ceil(n_frames / every)
    nf = 4 + (np.arange(30) % 11)
    expect = -(-nf // 3)
    got = out.groupby("media_id").size().reindex(range(30)).to_numpy()
    assert (got == expect).all()
    # real codecs are clearly-marked stubs
    with pytest.raises(NotImplementedError):
        FrameSampler(decoder="ffmpeg")


# ---------------------------------------------------------- gridded field

def test_gridded_field_exact_at_nodes():
    # interpolation at exact grid nodes returns the cube value bitwise
    f = tracking.default_gridded_field()
    g = tracking.DEFAULT_GRID
    # interior nodes (fraction 0 on every axis) are bitwise-exact; the
    # topmost node goes through the f=1.0 lerp leg (a + (b-a)*1), which is
    # only exact to rounding — checked with isclose below.
    xs = g["x0"] + g["dx"] * np.array([0, 3], np.float64)
    ys = g["y0"] + g["dy"] * np.array([2, 0], np.float64)
    ts = g["t0"] + g["dtg"] * np.array([1, 3], np.float64)
    u, v = f.velocity(xs, ys, ts)
    for n, (xi, yi, ti) in enumerate(zip([0, 3], [2, 0], [1, 3])):
        assert u[n] == f.u[ti, yi, xi]
        assert v[n] == f.v[ti, yi, xi]
    corner = (np.array([g["x0"] + g["dx"] * (g["nx"] - 1.0)]),
              np.array([g["y0"] + g["dy"] * (g["ny"] - 1.0)]),
              np.array([g["t0"] + g["dtg"] * (g["nt"] - 1.0)]))
    uc, vc = f.velocity(*corner)
    assert np.isclose(uc[0], f.u[-1, -1, -1], rtol=1e-12)
    assert np.isclose(vc[0], f.v[-1, -1, -1], rtol=1e-12)


def test_gridded_field_clamps_outside_domain():
    # nearest-edge fallback: far outside the cube == at the boundary
    f = tracking.default_gridded_field()
    far = np.array([1e9, -1e9])
    edge = np.array([1000.0, -1000.0])  # domain corners
    uf, vf = f.velocity(far, far, np.array([1e9, -1e9]))
    ue, ve = f.velocity(edge, edge, np.array([600.0, 0.0]))
    assert np.array_equal(uf, ue) and np.array_equal(vf, ve)


def test_gridded_field_midpoint_is_mean_of_neighbors():
    # fx=fy=ft=0.5 → trilinear value == mean of the 8 surrounding nodes
    f = tracking.default_gridded_field()
    g = tracking.DEFAULT_GRID
    x = np.array([g["x0"] + 1.5 * g["dx"]])
    y = np.array([g["y0"] + 2.5 * g["dy"]])
    t = np.array([g["t0"] + 0.5 * g["dtg"]])
    u, _ = f.velocity(x, y, t)
    block = f.u[0:2, 2:4, 1:3]
    assert np.isclose(u[0], block.mean(), rtol=1e-12)


def test_gridded_track_matches_numpy_oracle_bitwise():
    # independent scalar re-implementation of RK4-through-cube, bitwise
    seeds = tracking.circle_seeds(8, radius=400.0)
    field = tracking.default_gridded_field()
    dt, steps = 30.0, 20
    out = tracking.track(seeds, field=field, dt=dt, steps=steps,
                         snapshot_every=steps, order=4).to_pandas()
    last = out[out.step == steps].sort_values("particle_id")
    x = seeds["x"].to_numpy().astype(np.float64)
    y = seeds["y"].to_numpy().astype(np.float64)
    t = np.zeros_like(x)
    for _ in range(steps):
        th, tf = t + dt / 2, t + dt
        u1, v1 = field.velocity(x, y, t)
        u2, v2 = field.velocity(x + u1 * dt / 2, y + v1 * dt / 2, th)
        u3, v3 = field.velocity(x + u2 * dt / 2, y + v2 * dt / 2, th)
        u4, v4 = field.velocity(x + u3 * dt, y + v3 * dt, tf)
        x = x + (u1 + 2 * u2 + 2 * u3 + u4) * dt / 6
        y = y + (v1 + 2 * v2 + 2 * v3 + v4) * dt / 6
        t = tf
    assert np.array_equal(last.x.to_numpy(), x)
    assert np.array_equal(last.y.to_numpy(), y)
    assert np.array_equal(last.t.to_numpy(), t)


def test_gridded_track_actor_pool_matches_tasks():
    # ST4 shape: the cube held in an actor pool gives identical output
    seeds = tracking.circle_seeds(8, radius=400.0)
    a = tracking.track(seeds, field=tracking.default_gridded_field(),
                       dt=30.0, steps=4, snapshot_every=4, order=4,
                       use_actors=True, concurrency=(1, 2)).to_pandas()
    b = tracking.track(seeds, field=tracking.default_gridded_field(),
                       dt=30.0, steps=4, snapshot_every=4, order=4).to_pandas()
    a = a.sort_values(["step", "particle_id"]).reset_index(drop=True)
    b = b.sort_values(["step", "particle_id"]).reset_index(drop=True)
    assert np.array_equal(a.x.to_numpy(), b.x.to_numpy())
    assert np.array_equal(a.y.to_numpy(), b.y.to_numpy())


def test_audio_vad_segments_runs_and_bounds():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyofs_ray.stages.multimodal import (audio_vad_segments,
                                             synth_audio_batch)

    ids = ray.data.from_arrow(pa.table({"doc_id": pa.array(
        np.arange(40, dtype=np.int64))}))
    clips = ids.map_batches(synth_audio_batch, batch_format="pyarrow")
    got = audio_vad_segments(clips).to_pandas()
    assert len(got) == 40
    # segments can never exceed active frames, nor ceil(frames/2)
    assert (got.n_segments <= got.n_active).all()
    assert (got.n_segments <= (got.n_frames + 1) // 2).all()
    assert (got.n_frames == (256 + (got.media_id % 11) * 64) // 64).all()


def test_audio_vad_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["audio_vad_segments"](SF_SMOKE),
                          duck_smoke, ORACLES["audio_vad_segments"])
