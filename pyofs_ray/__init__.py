"""pyofs_ray — a Ray-Data-native spatial-join + tiling engine.

PyOFS (noaa-ocs-modeling/PyOFS) capabilities re-imagined over
Common-Crawl-style web-page tables: fixed-point geocoding + quadtree cell
index, point-in-polygon joins, kNN station lookups, two-stage/salted
aggregates, tile pyramids, bilinear interpolation, compositing, dedup
(exact/MinHash/SimHash), similarity search (brute/LSH/IVF), text analysis,
multimodal decode stages, particle tracking, and checkpoint-manifest resume.

Entry points: `pyofs_ray.registry` (driver queries + DuckDB oracle twins),
`pyofs_ray.pipelines.flagship` (headline pipeline). Nothing in this package
calls `ray.init()` — sessions are owned by drivers (bench.py, scripts/,
tests/conftest.py).
"""

__version__ = "0.1.0"
