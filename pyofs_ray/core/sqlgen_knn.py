"""Generated DuckDB SQL for the kNN station lookup (`stages.knn`) — literal
station VALUES + cross join + ROW_NUMBER with the identical (d2, station_id)
ordering; all-int64 distances so the oracle matches bit-for-bit."""

from __future__ import annotations

from ..sources.fixtures import stations as fixture_stations


def stations_cte() -> str:
    rows = sorted(fixture_stations(), key=lambda r: r["station_id"])
    vals = ",\n    ".join(
        f"('{r['station_id']}', {r['lon_milli']}, {r['lat_milli']})" for r in rows)
    return f"stations(station_id, s_lon, s_lat) AS (VALUES\n    {vals})"


def knn_select(k: int = 3) -> str:
    return f"""
SELECT page_key, url, station_id, d2, rank FROM (
  SELECT p.page_key, p.url, s.station_id,
         (p.lon_milli - s.s_lon) * (p.lon_milli - s.s_lon)
           + (p.lat_milli - s.s_lat) * (p.lat_milli - s.s_lat) AS d2,
         ROW_NUMBER() OVER (PARTITION BY p.page_key
                            ORDER BY (p.lon_milli - s.s_lon) * (p.lon_milli - s.s_lon)
                                   + (p.lat_milli - s.s_lat) * (p.lat_milli - s.s_lat),
                                     s.station_id) AS rank
  FROM pages p CROSS JOIN stations s
) WHERE rank <= {k}"""
