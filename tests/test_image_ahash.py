"""Image perceptual-hash dedup (stages/multimodal.image_ahash_groups)."""

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages.multimodal import (
    MAGIC, image_ahash_groups, synth_media_batch)


def _payload(w, h, px):
    head = (MAGIC + int(w).to_bytes(4, "little")
            + int(h).to_bytes(4, "little") + (0).to_bytes(3, "little"))
    return head + px.astype(np.uint8).tobytes()


def test_identical_images_group_constant_shift_groups():
    """Byte-identical images share a hash; a constant brightness shift
    that wraps no pixel also shares it (aHash is shift-invariant); a
    different pattern does not."""
    base = (np.arange(16 * 12, dtype=np.int64).reshape(12, 16) % 97)
    rows = [
        {"media_id": 1, "payload": _payload(16, 12, base)},
        {"media_id": 2, "payload": _payload(16, 12, base)},        # exact dup
        {"media_id": 3, "payload": _payload(16, 12, base + 50)},   # shifted
        {"media_id": 4, "payload": _payload(16, 12, base[::-1])},  # different
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = image_ahash_groups(ds).to_pandas()
    assert len(out) == 1
    g = out.iloc[0]
    assert g.n_images == 3 and g.min_media_id == 1
    assert (g.width, g.height) == (16, 12)


def test_fixture_groups_match_numpy_reference():
    ids = np.arange(500, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids})).map_batches(
        synth_media_batch, batch_format="pyarrow", batch_size=128)
    out = image_ahash_groups(ds).to_pandas()
    # independent reference
    from collections import Counter
    k = np.arange(64)
    ty, tx = k // 8, k % 8

    def ahash(i):
        w = 16 + int(i % 13) * 4
        h = 12 + int(i % 7) * 4
        if i % 17 == 0:
            w, h = w * 8, h * 2
        seed = int(i) % (1 << 24)
        ry, rx = (h - 1) * ty // 7, (w - 1) * tx // 7
        px = (ry * 31 + rx * 7 + seed) % 256
        bits = (px * 64 >= px.sum()).astype(np.uint64)
        sh = np.arange(32, dtype=np.uint64)
        return (int((bits[32:] << sh).sum()), int((bits[:32] << sh).sum()),
                w, h)

    ref = Counter(ahash(int(i)) for i in ids)
    want = {kk: v for kk, v in ref.items() if v >= 2}
    got = {(r.ahash_hi, r.ahash_lo, r.width, r.height): r.n_images
           for r in out.itertuples()}
    assert got == want
