"""Generated DuckDB SQL for the point-in-polygon join (`stages.pip`).

The fixture polygons are integer milli-degree rings; this module renders the
*identical* even–odd parity test as SQL over literal vertex coordinates, so
the engine join rows and the oracle rows match exactly (SURVEY.md §7.4).
"""

from __future__ import annotations

from ..sources.fixtures import Polygon, study_polygons


def inside_expr(p: Polygon, lon: str = "lon_milli", lat: str = "lat_milli") -> str:
    terms = []
    n = len(p.xs)
    for i in range(n):
        x1, y1 = int(p.xs[i]), int(p.ys[i])
        x2, y2 = int(p.xs[(i + 1) % n]), int(p.ys[(i + 1) % n])
        t = f"(({x2} - {x1}) * ({lat} - {y1}) - ({lon} - {x1}) * ({y2} - {y1}))"
        cmp = f"{t} > 0" if y2 > y1 else f"{t} < 0"
        terms.append(
            f"CASE WHEN (({y1} > {lat}) != ({y2} > {lat})) AND ({cmp}) THEN 1 ELSE 0 END")
    bbox = (f"{lon} >= {int(p.xs.min())} AND {lon} <= {int(p.xs.max())}"
            f" AND {lat} >= {int(p.ys.min())} AND {lat} <= {int(p.ys.max())}")
    return f"(({bbox}) AND ((" + " + ".join(terms) + ") % 2 = 1))"


def pip_inner_select(polygons: list[Polygon] | None = None,
                     cols: tuple[str, ...] = ("page_key", "url", "lon_milli", "lat_milli")) -> str:
    polys = polygons if polygons is not None else study_polygons()
    collist = ", ".join(cols)
    parts = [
        f"SELECT {collist}, '{p.polygon_id}' AS polygon_id\n"
        f"FROM pages WHERE {inside_expr(p)}"
        for p in polys
    ]
    return "\nUNION ALL\n".join(parts)


def any_inside_expr(polygons: list[Polygon] | None = None) -> str:
    polys = polygons if polygons is not None else study_polygons()
    return "(" + " OR ".join(inside_expr(p) for p in polys) + ")"
