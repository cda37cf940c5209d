"""Ring histograms, host dup stats, split balance."""

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.pipelines import corpus, flagship


def test_ring_band_edges_inclusive():
    edges2 = np.array([e * e for e in flagship.RING_EDGES_MILLI], np.int64)
    d2 = np.array([0, 4_000_000, 4_000_001, 25_000_000, 25_000_001],
                  np.int64)
    band = np.searchsorted(edges2, d2, side="left")
    # d² == edge² lands in that band (inclusive upper edge)
    assert band.tolist() == [0, 0, 1, 1, 2]


def test_ring_histogram_totals_match_radius_join():
    sf = "/root/testdata/sf0.001"
    hist = flagship.station_ring_histogram(sf).to_pandas()
    assert (hist.doc_count > 0).all()
    assert hist.band.between(0, len(flagship.RING_EDGES_MILLI) - 1).all()
    # outermost-ring total equals the flat radius join's pair count
    from pyofs_ray.stages.knn import radius_join
    ds = flagship.geocoded_pages(sf).select_columns(
        ["lon_milli", "lat_milli"])
    n_pairs = radius_join(ds, flagship.RING_EDGES_MILLI[-1]).count()
    assert hist.doc_count.sum() == n_pairs
    # per-station monotone accumulation sanity: ring_max matches band
    edge = np.array(flagship.RING_EDGES_MILLI, np.int64)
    assert (hist.ring_max_milli.to_numpy()
            == edge[hist.band.to_numpy()]).all()


def test_host_dup_stats_counts_injected_dups(tmp_path, monkeypatch):
    sf = "/root/testdata/sf0.001"
    out = flagship.host_dup_stats(sf).to_pandas().set_index("host")
    assert (out.n_docs >= out.n_distinct).all()
    assert (out.n_dup == out.n_docs - out.n_distinct).all()
    # cross-check one host against a direct pandas computation
    pages = flagship.pages_dataset(sf, with_html=False).to_pandas()
    pages["host"] = pages.url.str.split("/").str[2]
    g = pages.groupby("host").agg(n_docs=("text", "size"),
                                  n_distinct=("text", "nunique"))
    assert (out.n_docs.sort_index() == g.n_docs.sort_index()).all()
    assert (out.n_distinct.sort_index() == g.n_distinct.sort_index()).all()


def test_split_balance_totals():
    sf = "/root/testdata/sf0.001"
    bal = corpus.split_balance(sf).to_pandas()
    docs = ray.data.read_parquet(f"{sf}/documents.parquet")
    assert bal.doc_count.sum() == docs.count()
    assert set(bal.split) <= set(corpus.SPLITS)
    # every lang appears in train (80% split of a 5-lang corpus)
    langs = set(ray.data.read_parquet(
        f"{sf}/documents.parquet").to_pandas()["lang"])
    assert set(bal[bal.split == "train"].lang) == langs


def test_sector_octants_partition_the_plane():
    """Every (dx, dy) ≠ (0,0) lands in exactly one half-open 45° octant
    and the integer classification agrees with floor(atan2/45°)."""
    import itertools
    vals = [-7, -5, -1, 0, 1, 5, 7]
    for dx, dy in itertools.product(vals, vals):
        if (dx, dy) == (0, 0):
            continue
        masks = [
            (dx > 0) and (dy >= 0) and (dy < dx),
            (dx > 0) and (dy > 0) and (dy >= dx),
            (dx <= 0) and (dy > 0) and (-dx < dy),
            (dx < 0) and (dy > 0) and (-dx >= dy),
            (dx < 0) and (dy <= 0) and (-dy < -dx),
            (dx < 0) and (dy < 0) and (-dy >= -dx),
            (dx >= 0) and (dy < 0) and (dx < -dy),
            (dx > 0) and (dy < 0) and (dx >= -dy),
        ]
        assert sum(masks) == 1, (dx, dy, masks)
        sector = masks.index(True)
        ang = np.degrees(np.arctan2(dy, dx)) % 360
        want = int(((ang + 1e-7) % 360) // 45)
        assert sector == want, (dx, dy, sector, want)


def test_sector_histogram_totals_match_radius_join():
    sf = "/root/testdata/sf0.001"
    from pyofs_ray.pipelines.flagship import (geocoded_pages,
                                              station_sector_histogram)
    from pyofs_ray.stages.knn import radius_join
    hist = station_sector_histogram(sf).to_pandas()
    ds = geocoded_pages(sf).select_columns(["lon_milli", "lat_milli"])
    n_pairs = radius_join(ds, 20_000).count()
    assert hist.doc_count.sum() == n_pairs
    assert hist.sector.between(0, 7).all()


def test_lang_confusion_totals_and_diag():
    sf = "/root/testdata/sf0.001"
    cm = corpus.lang_confusion(sf).to_pandas()
    docs = ray.data.read_parquet(f"{sf}/documents.parquet").to_pandas()
    assert cm.n.sum() == len(docs)
    # row marginals equal label counts
    got = cm.groupby("lang").n.sum().sort_index()
    want = docs.lang.value_counts().sort_index()
    assert (got.to_numpy() == want.to_numpy()).all()
    # predictions agree with the per-doc lang_id query
    pred = corpus.doc_lang_id(sf).to_pandas()
    j = docs[["doc_id", "lang"]].merge(pred, on="doc_id")
    ref = (j.groupby(["lang", "lang_pred"]).size().rename("n")
           .reset_index().sort_values(["lang", "lang_pred"])
           .reset_index(drop=True))
    g = cm.sort_values(["lang", "lang_pred"]).reset_index(drop=True)
    assert g.equals(ref.astype({"n": "int64"}))
