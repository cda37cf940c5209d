"""Multimodal columns: opaque binary payloads + typed metadata, decoded and
feature-extracted in actor-pool stages.

The Ray-side plumbing (schema, batch sizing, actor signature, output layout)
is real and tested; the *codec* itself is pluggable because image/audio
libraries are not in this container:

- ``decoder="pil"`` / ``"ffmpeg"`` raise ``NotImplementedError`` with the
  exact dependency needed (clearly-marked stubs);
- ``decoder="fake"`` (default in tests) parses the deterministic FAKE1
  container produced by ``synth_media_batch`` — a 16-byte header
  ``b"FAKE1" + width:u32 + height:u32 + seed:u24`` followed by row-major
  u8 pixels — so decode → resize → feature-extract run real vectorized
  numpy on real bytes.

Scale notes: media bytes are huge relative to metadata (SURVEY.md §7.4
"very wide rows"), so stages keep ``batch_size`` small (256 default), never
shuffle the binary column, and emit compact fixed-size features; the decode
pool's ``concurrency × num_cpus`` is the knob that sizes codec throughput
to the node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

MAGIC = b"FAKE1"
HEADER = len(MAGIC) + 4 + 4 + 3

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # "image/fake" in fixtures
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("payload", pa.binary()),
])


def synth_media_batch(b: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic media fixture: one FAKE1 image per input row, sized by
    the row id (heavy-tailed: every 17th row is 8× larger)."""
    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    payloads = []
    ws, hs = [], []
    for i in ids:
        w = 16 + int(i % 13) * 4
        h = 12 + int(i % 7) * 4
        if i % 17 == 0:
            w, h = w * 8, h * 2
        seed = int(i) % (1 << 24)
        # pixel[r, c] = (r * 31 + c * 7 + seed) mod 256 — pure arithmetic
        r = np.arange(h, dtype=np.uint32)[:, None] * 31
        c = np.arange(w, dtype=np.uint32)[None, :] * 7
        px = ((r + c + seed) % 256).astype(np.uint8)
        head = MAGIC + int(w).to_bytes(4, "little") + int(h).to_bytes(4, "little") \
            + seed.to_bytes(3, "little")
        payloads.append(head + px.tobytes())
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(ids),
        "media_type": pa.array(["image/fake"] * len(ids)),
        "width": pa.array(np.array(ws, np.int32)),
        "height": pa.array(np.array(hs, np.int32)),
        "payload": pa.array(payloads, pa.binary()),
    })


def _decode_fake(payload: bytes) -> np.ndarray:
    if payload[:5] != MAGIC:
        raise ValueError("not a FAKE1 container")
    w = int.from_bytes(payload[5:9], "little")
    h = int.from_bytes(payload[9:13], "little")
    px = np.frombuffer(payload, dtype=np.uint8, offset=HEADER, count=w * h)
    return px.reshape(h, w)


class MediaDecoder:
    """Actor-pool stage: payload → decoded features (mean/std/histogram) and
    an optional ``resize`` to a fixed thumbnail for downstream models."""

    def __init__(self, decoder: str = "fake", resize: tuple[int, int] | None = (8, 8)):
        if decoder == "pil":
            raise NotImplementedError(
                "image decode requires Pillow, not available in this container; "
                "use decoder='fake' (FAKE1 fixture codec) or install PIL")
        if decoder == "ffmpeg":
            raise NotImplementedError(
                "audio/video decode requires ffmpeg bindings, not available here")
        if decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")
        self.resize = resize

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b["payload"].to_pylist()
        means = np.empty(len(payloads), np.float64)
        stds = np.empty(len(payloads), np.float64)
        ws = np.empty(len(payloads), np.int32)
        hs = np.empty(len(payloads), np.int32)
        thumbs = []
        for i, p in enumerate(payloads):
            img = _decode_fake(p)
            hs[i], ws[i] = img.shape
            # exact integer moments (u8 sums < 2^53 are order-invariant in
            # float64), reduced with single IEEE ops — bit-reproducible and
            # SQL-oracle-checkable, unlike float-accumulated img.std()
            n = img.size
            s1 = int(img.sum(dtype=np.int64))
            s2 = int((img.astype(np.int64) ** 2).sum())
            mean = float(s1) / float(n)
            var = float(s2) / float(n) - mean * mean
            means[i] = mean
            stds[i] = np.sqrt(var) if var > 0 else 0.0
            if self.resize:
                th, tw = self.resize
                ry = np.linspace(0, img.shape[0] - 1, th).astype(np.int64)
                rx = np.linspace(0, img.shape[1] - 1, tw).astype(np.int64)
                thumbs.append(img[np.ix_(ry, rx)].astype(np.float32).ravel())
        out = pa.table({
            "media_id": b["media_id"],
            "width": pa.array(ws),
            "height": pa.array(hs),
            "px_mean": pa.array(means),
            "px_std": pa.array(stds),
        })
        if self.resize:
            out = out.append_column(
                "thumb", pa.array(list(thumbs), pa.list_(pa.float32())))
        return out


# ------------------------------------------------------------ video frames
VMAGIC = b"FAKV1"
VHEADER = len(VMAGIC) + 4 + 4 + 2 + 3


def synth_video_batch(b: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic video fixture: a FAKV1 clip per row — header
    ``b"FAKV1" + width:u32 + height:u32 + n_frames:u16 + seed:u24`` followed
    by ``n_frames`` row-major u8 frames; frame f pixel (r, c) =
    (r*31 + c*7 + f*13 + seed) mod 256."""
    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    payloads, ws, hs, fs = [], [], [], []
    for i in ids:
        w = 8 + int(i % 5) * 4
        h = 6 + int(i % 3) * 4
        nf = 4 + int(i % 11)
        seed = int(i) % (1 << 24)
        r = np.arange(h, dtype=np.uint32)[:, None, None] * 31
        c = np.arange(w, dtype=np.uint32)[None, :, None] * 7
        f = np.arange(nf, dtype=np.uint32)[None, None, :] * 13
        px = ((r + c + f + seed) % 256).astype(np.uint8)  # (h, w, nf)
        head = (VMAGIC + int(w).to_bytes(4, "little") + int(h).to_bytes(4, "little")
                + int(nf).to_bytes(2, "little") + seed.to_bytes(3, "little"))
        payloads.append(head + px.transpose(2, 0, 1).tobytes())
        ws.append(w); hs.append(h); fs.append(nf)
    return pa.table({
        "media_id": pa.array(ids),
        "media_type": pa.array(["video/fake"] * len(ids)),
        "width": pa.array(np.array(ws, np.int32)),
        "height": pa.array(np.array(hs, np.int32)),
        "n_frames": pa.array(np.array(fs, np.int32)),
        "payload": pa.array(payloads, pa.binary()),
    })


class FrameSampler:
    """Actor-pool stage: decode a FAKV1 clip, keep every ``every``-th frame,
    emit one row per sampled frame with exact integer-moment features —
    the video analogue of the reference's per-granule pass (decode once,
    derive small features, never shuffle the raw bytes)."""

    def __init__(self, decoder: str = "fake", every: int = 2):
        if decoder in ("pil", "ffmpeg"):
            raise NotImplementedError(
                "real video decode requires ffmpeg bindings, unavailable in "
                "this container; use decoder='fake' (FAKV1 fixture codec)")
        if decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")
        self.every = every

    def __call__(self, b: pa.Table) -> pa.Table:
        out_id, out_fi, out_mean = [], [], []
        for mid, p in zip(b["media_id"].to_pylist(), b["payload"].to_pylist()):
            if p[:5] != VMAGIC:
                raise ValueError("not a FAKV1 container")
            w = int.from_bytes(p[5:9], "little")
            h = int.from_bytes(p[9:13], "little")
            nf = int.from_bytes(p[13:15], "little")
            frames = np.frombuffer(p, np.uint8, count=nf * h * w,
                                   offset=VHEADER).reshape(nf, h, w)
            idx = np.arange(0, nf, self.every)
            sums = frames[idx].astype(np.int64).sum(axis=(1, 2))
            out_id.append(np.full(len(idx), mid, np.int64))
            out_fi.append(idx.astype(np.int64))
            out_mean.append(sums.astype(np.float64) / float(h * w))
        return pa.table({
            "media_id": pa.array(np.concatenate(out_id) if out_id else
                                 np.array([], np.int64)),
            "frame_idx": pa.array(np.concatenate(out_fi) if out_fi else
                                  np.array([], np.int64)),
            "px_mean": pa.array(np.concatenate(out_mean) if out_mean else
                                np.array([], np.float64)),
        })


def sample_frames(ds: ray.data.Dataset, decoder: str = "fake", every: int = 2,
                  batch_size: int = 256, concurrency=(1, 8),
                  compute: str = "tasks") -> ray.data.Dataset:
    """Frame-sample a video Dataset (small batches: very wide rows).

    ``compute="tasks"`` (default): stateless tasks with a per-worker memoized
    sampler — right when codec init is cheap (the FAKV1 fixture codec; a
    compiled-in demuxer). ``compute="actors"``: the ST-pattern actor pool —
    required when codec/model init is expensive (real ffmpeg contexts, GPU
    decoders) and worth pinning to few processes; a pool costs ~1 s spin-up
    per pipeline, so it must buy more than that in amortized init.
    """
    if compute == "actors":
        return ds.map_batches(
            FrameSampler,
            fn_constructor_kwargs={"decoder": decoder, "every": every},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1)

    def sample_batch(batch: pa.Table) -> pa.Table:
        from ..core.memo import memo_broadcast
        sampler = memo_broadcast(f"framesampler:{decoder}:{every}",
                                 lambda: FrameSampler(decoder, every))
        return sampler(batch)

    return ds.map_batches(sample_batch, batch_format="pyarrow",
                          batch_size=batch_size)


def decode_media(ds: ray.data.Dataset, decoder: str = "fake",
                 resize: tuple[int, int] | None = (8, 8),
                 batch_size: int = 256, concurrency=(1, 8),
                 compute: str = "tasks") -> ray.data.Dataset:
    """Decode/feature-extract a media Dataset (small batches: wide rows).

    ``compute`` semantics match :func:`sample_frames`: stateless memoized
    tasks by default (cheap codec init), ``"actors"`` for expensive
    codec/model state that justifies the per-pipeline pool spin-up.
    """
    if compute == "actors":
        return ds.map_batches(
            MediaDecoder,
            fn_constructor_kwargs={"decoder": decoder, "resize": resize},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )

    def decode_batch(batch: pa.Table) -> pa.Table:
        from ..core.memo import memo_broadcast
        dec = memo_broadcast(f"mediadecoder:{decoder}:{resize}",
                             lambda: MediaDecoder(decoder, resize))
        return dec(batch)

    return ds.map_batches(decode_batch, batch_format="pyarrow",
                          batch_size=batch_size)


# ------------------------------------------------------------ audio clips
AMAGIC = b"FAKA1"


def synth_audio_batch(b: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic audio fixture: one FAKA1 clip per row — header
    ``b"FAKA1" + n_samples:u32 + sample_rate:u32 + seed:u24`` followed by
    little-endian int16 samples ``s[j] = (j*37 + seed) % 4096 - 2048``
    (pure arithmetic, so the feature oracle can recompute every sample
    without ever seeing the binary)."""
    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    payloads, ns, rates = [], [], []
    for i in ids:
        n = 256 + int(i % 11) * 64
        rate = 8000 + int(i % 3) * 4000
        seed = int(i) % (1 << 24)
        s = ((np.arange(n, dtype=np.int64) * 37 + seed) % 4096
             - 2048).astype("<i2")
        head = (AMAGIC + n.to_bytes(4, "little") + rate.to_bytes(4, "little")
                + seed.to_bytes(3, "little"))
        payloads.append(head + s.tobytes())
        ns.append(n)
        rates.append(rate)
    return pa.table({
        "media_id": pa.array(ids),
        "media_type": pa.array(["audio/fake"] * len(ids)),
        "n_samples": pa.array(np.array(ns, np.int32)),
        "sample_rate": pa.array(np.array(rates, np.int32)),
        "payload": pa.array(payloads, pa.binary()),
    })


class AudioDecoder:
    """Stage: FAKA1 payload → exact integer acoustic features (RMS from
    int64 sample-square sums, zero-crossing count, duration). Real codecs
    are clearly-marked stubs — the Ray-side plumbing (schema, batching,
    binary payloads) is what this stage proves."""

    def __init__(self, decoder: str = "fake"):
        if decoder in ("ffmpeg", "soundfile"):
            raise NotImplementedError(
                "real audio decode requires ffmpeg/libsndfile bindings, not "
                "available in this container; use decoder='fake' (FAKA1 "
                "fixture codec)")
        if decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b["payload"].to_pylist()
        k = len(payloads)
        ns = np.empty(k, np.int32)
        rates = np.empty(k, np.int32)
        rms = np.empty(k, np.float64)
        dur = np.empty(k, np.float64)
        zcs = np.empty(k, np.int64)
        for i, p in enumerate(payloads):
            if p[:5] != AMAGIC:
                raise ValueError("not a FAKA1 container")
            n = int.from_bytes(p[5:9], "little")
            rate = int.from_bytes(p[9:13], "little")
            s = np.frombuffer(p, dtype="<i2", offset=16)[:n].astype(np.int64)
            if len(s) != n:
                raise ValueError("FAKA1 payload truncated")
            # exact int64 sums (900 * 2048² ≪ 2^53), single IEEE reduce
            s2 = int((s * s).sum())
            ns[i], rates[i] = n, rate
            rms[i] = np.sqrt(float(s2) / float(n))
            dur[i] = float(n) / float(rate)
            zcs[i] = int(np.count_nonzero((s[1:] >= 0) != (s[:-1] >= 0)))
        return pa.table({
            "media_id": b["media_id"],
            "n_samples": pa.array(ns),
            "sample_rate": pa.array(rates),
            "duration_s": pa.array(dur),
            "rms": pa.array(rms),
            "zero_crossings": pa.array(zcs),
        })


def decode_audio(ds: ray.data.Dataset, decoder: str = "fake",
                 batch_size: int = 256, concurrency=(1, 8),
                 compute: str = "tasks") -> ray.data.Dataset:
    """Acoustic-feature stage; ``compute`` semantics match
    :func:`decode_media` (memoized stateless tasks by default)."""
    if compute == "actors":
        return ds.map_batches(
            AudioDecoder,
            fn_constructor_kwargs={"decoder": decoder},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )

    def decode_batch(batch: pa.Table) -> pa.Table:
        from ..core.memo import memo_broadcast
        dec = memo_broadcast(f"audiodecoder:{decoder}",
                             lambda: AudioDecoder(decoder))
        return dec(batch)

    return ds.map_batches(decode_batch, batch_format="pyarrow",
                          batch_size=batch_size)


# ------------------------------------------------------------ image aHash
def image_ahash_groups(clips: ray.data.Dataset,
                       num_buckets: int | None = None) -> ray.data.Dataset:
    """Perceptual-hash (aHash) near-duplicate image groups: decode each
    FAKE1 payload, sample an 8×8 thumbnail with pure-integer grid indices
    (``ry = (h−1)·ty // 7``), threshold each thumb pixel against the thumb
    MEAN by integer cross-multiplication (``px·64 ≥ Σpx`` — no float
    enters the bit decision), and pack the 64 bits as two uint32 halves
    (avoids int64 sign-bit gymnastics in the SQL twin). Groups are keyed
    (ahash_hi, ahash_lo, width, height); only groups with ≥2 members are
    near-dup clusters.

    This is the image-side sibling of the text MinHash keep-one dedup:
    the decode runs where the payload lives (one stateless pass, payloads
    never shuffle — only 4-int keys move), then ONE bucketed reduce.

    Output: ``ahash_hi, ahash_lo, width, height, n_images, min_media_id``
    for groups of ≥2."""
    from .agg import bucketed_group_agg

    _SH = np.arange(32, dtype=np.uint64)

    def hash_batch(b: pa.Table) -> pa.Table:
        payloads = b["payload"].to_pylist()
        n = len(payloads)
        his = np.empty(n, np.int64)
        los = np.empty(n, np.int64)
        ws = np.empty(n, np.int64)
        hs = np.empty(n, np.int64)
        k = np.arange(64)
        ty, tx = k // 8, k % 8
        for i, p in enumerate(payloads):
            img = _decode_fake(p)
            h, w = img.shape
            thumb = img[(h - 1) * ty // 7, (w - 1) * tx // 7].astype(
                np.int64)
            s = int(thumb.sum())
            bits = (thumb * 64 >= s).astype(np.uint64)
            los[i] = int((bits[:32] << _SH).sum())
            his[i] = int((bits[32:] << _SH).sum())
            ws[i], hs[i] = w, h
        t = pa.table({
            "ahash_hi": pa.array(his), "ahash_lo": pa.array(los),
            "width": pa.array(ws), "height": pa.array(hs),
            "mid": b["media_id"].cast(pa.int64()),
            "one": pa.array(np.ones(n, np.int64)),
        })
        g = t.group_by(["ahash_hi", "ahash_lo", "width", "height"]).aggregate(
            [("one", "sum"), ("mid", "min")])
        return pa.table({
            "ahash_hi": g["ahash_hi"], "ahash_lo": g["ahash_lo"],
            "width": g["width"], "height": g["height"],
            "n": g["one_sum"].combine_chunks().cast(pa.int64()),
            "mid": g["mid_min"].combine_chunks().cast(pa.int64()),
        })

    hashed = clips.map_batches(hash_batch, batch_format="pyarrow",
                               batch_size=256)
    agg = bucketed_group_agg(
        hashed, keys=["ahash_hi", "ahash_lo", "width", "height"],
        aggs=[("n", "sum", "n_images"), ("mid", "min", "min_media_id")],
        num_buckets=num_buckets)

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pa.compute.greater_equal(b["n_images"], 2))
        return pa.table({
            "ahash_hi": b["ahash_hi"].cast(pa.int64()),
            "ahash_lo": b["ahash_lo"].cast(pa.int64()),
            "width": b["width"].cast(pa.int64()),
            "height": b["height"].cast(pa.int64()),
            "n_images": b["n_images"].cast(pa.int64()),
            "min_media_id": b["min_media_id"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SCENE_DELTA_T = 2  # |Δ frame sum| > T·h·w ⇒ a cut (mean shift > T levels)


def video_scene_changes(clips: ray.data.Dataset,
                        threshold: int = SCENE_DELTA_T) -> ray.data.Dataset:
    """Scene-cut detection per clip: count adjacent FULL-frame pairs whose
    integer luminance-sum delta exceeds ``threshold`` mean gray levels —
    ``|Σf − Σf₋₁| > T·h·w``, all int64 (the comparison never leaves
    integers, so the generator-arithmetic twin is bit-exact). The
    multimodal × temporal composition: decode where the payload lives,
    adjacent-frame logic inside the same batch (a clip is one row — its
    frames never span batches), only 3-int rows leave.

    Output: ``media_id, n_frames, n_changes``."""

    def detect(b: pa.Table) -> pa.Table:
        ids, nfs, chs = [], [], []
        for mid, p in zip(b["media_id"].to_pylist(),
                          b["payload"].to_pylist()):
            if p[:5] != VMAGIC:
                raise ValueError("not a FAKV1 container")
            w = int.from_bytes(p[5:9], "little")
            h = int.from_bytes(p[9:13], "little")
            nf = int.from_bytes(p[13:15], "little")
            frames = np.frombuffer(p, np.uint8, count=nf * h * w,
                                   offset=VHEADER).reshape(nf, h, w)
            sums = frames.astype(np.int64).sum(axis=(1, 2))
            d = np.abs(np.diff(sums))
            ids.append(mid)
            nfs.append(nf)
            chs.append(int((d > threshold * h * w).sum()))
        return pa.table({
            "media_id": pa.array(np.array(ids, np.int64)),
            "n_frames": pa.array(np.array(nfs, np.int64)),
            "n_changes": pa.array(np.array(chs, np.int64)),
        })

    return clips.map_batches(detect, batch_format="pyarrow",
                             batch_size=256)


VAD_FRAME = 64                      # samples per frame (clip lengths are
                                    # multiples of 64, so no ragged tail)
VAD_THRESH = 64 * 1_400_000         # frame-energy gate: sum(s²) over the
                                    # frame vs 64 × E[s²] of the uniform
                                    # sawtooth (≈4096²/12) — splits frames
                                    # into a real active/inactive mix


def audio_vad_segments(clips: ray.data.Dataset) -> ray.data.Dataset:
    """VAD-style segmentation over FAKA1 clips: frames of ``VAD_FRAME``
    samples are "speech" when their exact int64 energy ``sum(s²)`` exceeds
    ``VAD_THRESH``; segments are maximal runs of active frames. Per clip:
    (n_frames, n_active, n_segments). The loop is per CLIP (payloads are
    variable-length binaries), each clip fully vectorized; the oracle
    recomputes every sample from the FAKA1 generator arithmetic."""
    def fn(b: pa.Table) -> pa.Table:
        payloads = b["payload"].to_pylist()
        k = len(payloads)
        nf = np.empty(k, np.int64)
        na = np.empty(k, np.int64)
        nseg = np.empty(k, np.int64)
        for i, p in enumerate(payloads):
            if p[:5] != AMAGIC:
                raise ValueError("not a FAKA1 container")
            n = int.from_bytes(p[5:9], "little")
            s = np.frombuffer(p, dtype="<i2", offset=16)[:n].astype(np.int64)
            e = (s * s).reshape(-1, VAD_FRAME).sum(axis=1)
            act = e > VAD_THRESH
            nf[i] = len(e)
            na[i] = int(act.sum())
            nseg[i] = int((act & ~np.r_[False, act[:-1]]).sum())
        return pa.table({"media_id": b["media_id"],
                         "n_frames": pa.array(nf),
                         "n_active": pa.array(na),
                         "n_segments": pa.array(nseg)})

    return clips.map_batches(fn, batch_format="pyarrow",
                             zero_copy_batch=True)


AUDIO_VAD_SQL = f"""
WITH dims AS (
  SELECT doc_id AS media_id,
         256 + (doc_id % 11) * 64 AS n,
         doc_id % 16777216 AS seed
  FROM documents
), fe AS (
  SELECT media_id, n, CAST(f.f AS BIGINT) AS f,
         SUM(CAST(((j.j * 37 + seed) % 4096 - 2048)
                  * ((j.j * 37 + seed) % 4096 - 2048) AS BIGINT)) AS e
  FROM dims
  CROSS JOIN generate_series(0, 14) AS f(f)
  CROSS JOIN generate_series(0, {VAD_FRAME - 1}) AS jj(jx)
  CROSS JOIN LATERAL (SELECT f.f * {VAD_FRAME} + jj.jx AS j) j
  WHERE f.f < n // {VAD_FRAME}
  GROUP BY 1, 2, 3
), a AS (
  SELECT media_id, f, e > {VAD_THRESH} AS act,
         LAG(e > {VAD_THRESH}) OVER (PARTITION BY media_id ORDER BY f)
           AS prev_act
  FROM fe
)
SELECT media_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(CASE WHEN act THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN act AND NOT COALESCE(prev_act, FALSE)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_segments
FROM a GROUP BY 1"""
