"""Peak-day / zonal-mode argmax compositions (pipelines/flagship)."""

import numpy as np

from pyofs_ray.pipelines import flagship


def test_cell_peak_day_is_argmax_of_crosstab():
    sf = "/root/testdata/sf0.001"
    got = flagship.cell_peak_day(sf).to_pandas()
    # independent reference from the raw pages
    pages = flagship.pages_dataset(sf, with_html=False)
    from pyofs_ray.pipelines.flagship import geocode
    df = geocode(pages).to_pandas()
    df["day"] = df.warc_ts.astype("int64") // flagship.US_PER_DAY
    ct = (df.groupby(["cell_id", "day"]).size().rename("n").reset_index()
            .sort_values(["cell_id", "n", "day"],
                         ascending=[True, False, True]))
    want = ct.groupby("cell_id").head(1).reset_index(drop=True)
    got = got.sort_values("cell_id").reset_index(drop=True)
    assert (got.cell_id.to_numpy() == want.cell_id.to_numpy()).all()
    assert (got.day.to_numpy() == want.day.to_numpy()).all()
    assert (got.n_pages.to_numpy() == want.n.to_numpy()).all()


def test_polygon_modal_lang_one_row_per_polygon():
    sf = "/root/testdata/sf0.001"
    got = flagship.polygon_modal_lang(sf).to_pandas()
    assert got.polygon_id.is_unique and len(got) > 0
    assert (got.n_pages > 0).all()
