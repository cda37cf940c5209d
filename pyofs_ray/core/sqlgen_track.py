"""DuckDB oracle for the particle-tracking loop (SURVEY.md P1–P4).

Recomputes the full RK4 advection of `stages.tracking.track` inside one
recursive CTE, **bit-exactly**: the Rankine kernel is trig-free (single
IEEE mul/div/sqrt per term — `tracking.RankineVortexField.velocity`), seed
coordinates and scalar constants are inlined as shortest-round-trip float
literals (DuckDB parses them back to the identical doubles), and every SQL
expression mirrors the numpy evaluation order exactly (left-associative
sums, ``(-(vmag*dy))/rs`` ≡ ``(-vmag)*dy/rs`` by IEEE sign symmetry).

This is the `particle_contour.py:997-1028` track_contour loop as a SQL
twin — the reference validates tracking against analytic rotation
(`particle_contour.py` tests); here the oracle is the stronger bitwise
recomputation.
"""

from __future__ import annotations


def _lit(x: float) -> str:
    """Shortest round-trip float literal, cast to DOUBLE explicitly —
    DuckDB types a bare decimal literal as DECIMAL(w,s), which rounds."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _field_eval(i: int, px: str, py: str, inner: str,
                cx: float, cy: float, omega: float, radius: float) -> str:
    """Nested SELECT chain computing (u{i}, v{i}) of the Rankine field at
    (px, py), matching RankineVortexField.velocity op-for-op."""
    k_out = omega * radius**2  # python-scalar product, exactly as the kernel
    return f"""SELECT *, (-(vmag{i} * dy{i})) / rs{i} AS u{i},
       (vmag{i} * dx{i}) / rs{i} AS v{i} FROM (
  SELECT *, CASE WHEN r{i} <= {_lit(radius)} THEN {_lit(omega)} * r{i}
                 ELSE {_lit(k_out)} / rs{i} END AS vmag{i} FROM (
    SELECT *, CASE WHEN r{i} = 0 THEN 1.0 ELSE r{i} END AS rs{i} FROM (
      SELECT *, sqrt(dx{i}*dx{i} + dy{i}*dy{i}) AS r{i} FROM (
        SELECT *, ({px}) - {_lit(cx)} AS dx{i}, ({py}) - {_lit(cy)} AS dy{i}
        FROM {inner}
      )
    )
  )
)"""


def particle_track_sql(n_seeds: int = 64, seed_radius: float = 500.0,
                       center: tuple[float, float] = (0.0, 0.0),
                       field_radius: float = 1000.0, period: float = 3600.0,
                       dt: float = 30.0, steps: int = 20,
                       snapshot_every: int = 5) -> str:
    import math

    from ..stages.tracking import circle_seeds

    seeds = circle_seeds(n_seeds, center=center, radius=seed_radius)
    pid = seeds["particle_id"].to_pylist()
    xs = seeds["x"].to_pylist()
    ys = seeds["y"].to_pylist()
    values = ",\n    ".join(
        f"({p}, {_lit(x)}, {_lit(y)})" for p, x, y in zip(pid, xs, ys))
    omega = 2 * math.pi / period
    cx, cy = center

    def fe(i: int, px: str, py: str, inner: str) -> str:
        return _field_eval(i, px, py, inner, cx, cy, omega, field_radius)

    d = _lit(dt)
    # RK4: u2 at x + u1*dt/2 …, matching AdvectStep.__call__ (order=4)
    l1 = fe(1, "x", "y", "track WHERE step < " + str(steps))
    l2 = fe(2, f"x + u1 * {d} / 2", f"y + v1 * {d} / 2", f"({l1})")
    l3 = fe(3, f"x + u2 * {d} / 2", f"y + v2 * {d} / 2", f"({l2})")
    l4 = fe(4, f"x + u3 * {d}", f"y + v3 * {d}", f"({l3})")

    return f"""
WITH RECURSIVE seeds(particle_id, x, y) AS (
  VALUES
    {values}
),
track AS (
  SELECT 0 AS step, particle_id, x, y FROM seeds
  UNION ALL
  SELECT step + 1, particle_id,
         x + (u1 + 2 * u2 + 2 * u3 + u4) * {d} / 6 AS x,
         y + (v1 + 2 * v2 + 2 * v3 + v4) * {d} / 6 AS y
  FROM ({l4})
)
SELECT CAST(step AS BIGINT) AS step, particle_id, x, y
FROM track WHERE step % {snapshot_every} = 0
"""


def _gval(comp: str, params, iexp: str, jexp: str, kexp: str) -> str:
    """Inlined grid-value expression: the `tracking.synth_velocity_cube`
    generator arithmetic (small-int → double exact; % operands nonneg)."""
    ca, cb, cc, m, off, div = params
    return (f"CAST((({iexp}) * {ca} + ({jexp}) * {cb} + ({kexp}) * {cc})"
            f" % {m} - {off} AS DOUBLE) / {_lit(div)}")


def _gridded_field_eval(i: int, px: str, py: str, pt: str, inner: str,
                        g) -> str:
    """Nested SELECT chain adding (u{i}, v{i}) = the bilinear-space ×
    linear-time interpolated cube velocity at (px, py, pt), mirroring
    `GriddedVelocityField.velocity` op-for-op (clamp → floor → frac →
    x-lerp → y-lerp → t-lerp)."""
    from ..stages.tracking import GRID_U, GRID_V

    def axis(col, p, p0, step, n):
        return (f"LEAST(GREATEST((({p}) - {_lit(p0)}) / {_lit(step)}, "
                f"{_lit(0.0)}), {_lit(n - 1.0)}) AS {col}{i}")

    la = (f"SELECT *, {axis('gx', px, g['x0'], g['dx'], g['nx'])}, "
          f"{axis('gy', py, g['y0'], g['dy'], g['ny'])}, "
          f"{axis('gt', pt, g['t0'], g['dtg'], g['nt'])} FROM {inner}")
    lb = (f"SELECT *, LEAST(floor(gx{i}), {_lit(g['nx'] - 2.0)}) AS fi{i}, "
          f"LEAST(floor(gy{i}), {_lit(g['ny'] - 2.0)}) AS fj{i}, "
          f"LEAST(floor(gt{i}), {_lit(g['nt'] - 2.0)}) AS fk{i} FROM ({la})")
    lc = (f"SELECT *, gx{i} - fi{i} AS fx{i}, gy{i} - fj{i} AS fy{i}, "
          f"gt{i} - fk{i} AS ft{i}, CAST(fi{i} AS BIGINT) AS i{i}, "
          f"CAST(fj{i} AS BIGINT) AS j{i}, CAST(fk{i} AS BIGINT) AS k{i} "
          f"FROM ({lb})")
    grid_cols = []
    for comp, params in (("u", GRID_U), ("v", GRID_V)):
        for di in (0, 1):
            for dj in (0, 1):
                for dk in (0, 1):
                    grid_cols.append(
                        _gval(comp, params, f"i{i} + {di}", f"j{i} + {dj}",
                              f"k{i} + {dk}")
                        + f" AS g{comp}{di}{dj}{dk}_{i}")
    ld = f"SELECT *, {', '.join(grid_cols)} FROM ({lc})"
    xl = [f"g{c}0{dj}{dk}_{i} + (g{c}1{dj}{dk}_{i} - g{c}0{dj}{dk}_{i})"
          f" * fx{i} AS ax{c}{dj}{dk}_{i}"
          for c in "uv" for dj in (0, 1) for dk in (0, 1)]
    le = f"SELECT *, {', '.join(xl)} FROM ({ld})"
    yl = [f"ax{c}0{dk}_{i} + (ax{c}1{dk}_{i} - ax{c}0{dk}_{i})"
          f" * fy{i} AS ay{c}{dk}_{i}"
          for c in "uv" for dk in (0, 1)]
    lf = f"SELECT *, {', '.join(yl)} FROM ({le})"
    return (f"SELECT *, ayu0_{i} + (ayu1_{i} - ayu0_{i}) * ft{i} AS u{i}, "
            f"ayv0_{i} + (ayv1_{i} - ayv0_{i}) * ft{i} AS v{i} FROM ({lf})")


def particle_track_gridded_sql(n_seeds: int = 48, seed_radius: float = 400.0,
                               center: tuple[float, float] = (0.0, 0.0),
                               grid: dict | None = None,
                               dt: float = 30.0, steps: int = 20,
                               snapshot_every: int = 5,
                               t_start: float = 0.0) -> str:
    """Recursive-CTE twin of RK4 advection through the interpolated
    velocity cube (`tracking.GriddedVelocityField` + `AdvectStep`,
    reference `particle_contour.py:249-298` / `:401-465`). The cube never
    appears as data: its deterministic generator arithmetic is inlined at
    every lookup, so the oracle proves synth → interp → RK4 end-to-end."""
    from ..stages.tracking import DEFAULT_GRID, circle_seeds

    g = dict(DEFAULT_GRID if grid is None else grid)
    seeds = circle_seeds(n_seeds, center=center, radius=seed_radius)
    values = ",\n    ".join(
        f"({p}, {_lit(x)}, {_lit(y)})"
        for p, x, y in zip(seeds["particle_id"].to_pylist(),
                           seeds["x"].to_pylist(), seeds["y"].to_pylist()))
    d = _lit(dt)
    dh = _lit(dt / 2)  # python scalar dt/2, exactly as AdvectStep computes th

    def fe(i: int, px: str, py: str, pt: str, inner: str) -> str:
        return _gridded_field_eval(i, px, py, pt, inner, g)

    l1 = fe(1, "x", "y", "t", "track WHERE step < " + str(steps))
    l2 = fe(2, f"x + u1 * {d} / 2", f"y + v1 * {d} / 2", f"t + {dh}", f"({l1})")
    l3 = fe(3, f"x + u2 * {d} / 2", f"y + v2 * {d} / 2", f"t + {dh}", f"({l2})")
    l4 = fe(4, f"x + u3 * {d}", f"y + v3 * {d}", f"t + {d}", f"({l3})")

    return f"""
WITH RECURSIVE seeds(particle_id, x, y) AS (
  VALUES
    {values}
),
track AS (
  SELECT 0 AS step, particle_id, x, y, {_lit(t_start)} AS t FROM seeds
  UNION ALL
  SELECT step + 1, particle_id,
         x + (u1 + 2 * u2 + 2 * u3 + u4) * {d} / 6 AS x,
         y + (v1 + 2 * v2 + 2 * v3 + v4) * {d} / 6 AS y,
         t + {d} AS t
  FROM ({l4})
)
SELECT CAST(step AS BIGINT) AS step, particle_id, x, y, t
FROM track WHERE step % {snapshot_every} = 0
"""
