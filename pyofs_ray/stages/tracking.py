"""Particle / contour advection — the iterative dataflow-with-state operator
(SURVEY.md §2.7, `main/tracking/particle_contour.py`).

Reference semantics re-created Ray-Data-first:

- the **velocity field** (the reference's synthetic Rankine vortex,
  `particle_contour.py:118-192`, and interpolated NetCDF cubes) lives in an
  actor pool — built once per actor in ``__init__`` (ST4);
- **particles are the Dataset**: rows (particle_id, x, y); each RK step is
  one ``map_batches`` pass through the field actors (P1,
  `particle_contour.py:596-648` Particle.step / `:761-811` vectorized
  contour step);
- the **driver loop** plays `track_contour` (`:997-1028`): N fine steps,
  snapshot every coarse interval, snapshots unioned into one output
  Dataset (P3);
- seeds come from deterministic circle/rectangle generators (P4,
  `:853-966`).

NaN-velocity → zero-vector matches `particle_contour.py:617-621`.
RK orders 1/2/4 supported (reference `order=4` default, `:1077`).

State lives in the rows, not the actors — actors hold only the immutable
field, so actor failure/rebuild is deterministic and steps are pure
functions: the whole loop is resumable from any snapshot.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data


class RankineVortexField:
    """Synthetic rotational field: solid-body core, 1/r tail (the
    `particle_contour.py:118-192` RankineVortex analogue, planar meters)."""

    def __init__(self, center=(0.0, 0.0), radius: float = 1000.0,
                 period: float = 3600.0):
        self.cx, self.cy = center
        self.radius = radius
        self.omega = 2 * math.pi / period

    def velocity(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # trig-free tangential field: sin θ = dy/r, cos θ = dx/r — every op
        # is a single IEEE mul/div/sqrt, so the DuckDB oracle
        # (`core.sqlgen_track`) reproduces the trajectory bit-exactly
        dx, dy = x - self.cx, y - self.cy
        r = np.sqrt(dx * dx + dy * dy)
        rs = np.where(r == 0, 1.0, r)
        vmag = np.where(r <= self.radius, self.omega * r,
                        self.omega * self.radius**2 / rs)
        u = -vmag * dy / rs
        v = vmag * dx / rs
        return np.nan_to_num(u), np.nan_to_num(v)


# Deterministic grid-value generator shared by GriddedVelocityField's test
# cube and its DuckDB twin (`core.sqlgen_track.particle_track_gridded_sql`):
# u(i,j,k) = ((7i + 11j + 13k) % 19 - 9) / 30,
# v(i,j,k) = ((5i + 3j + 17k) % 23 - 11) / 40.
# Small-int arithmetic → double is exact; the division is one IEEE op.
GRID_U = (7, 11, 13, 19, 9, 30.0)
GRID_V = (5, 3, 17, 23, 11, 40.0)

# Registry/test cube: 9×9 cells spanning [-1000, 1000]² in space, 5 time
# slices covering t ∈ [0, 600]; a 20×30 s track runs to t=600, so the final
# steps also exercise the clamped (nearest-edge) time fallback.
DEFAULT_GRID = dict(nx=9, ny=9, nt=5, x0=-1000.0, y0=-1000.0, t0=0.0,
                    dx=250.0, dy=250.0, dtg=150.0)


def default_gridded_field() -> "GriddedVelocityField":
    g = DEFAULT_GRID
    u, v = synth_velocity_cube(g["nx"], g["ny"], g["nt"])
    return GriddedVelocityField(u, v, g["x0"], g["y0"], g["t0"],
                                g["dx"], g["dy"], g["dtg"])


def synth_velocity_cube(nx: int, ny: int, nt: int) -> tuple[np.ndarray, np.ndarray]:
    """(nt, ny, nx) u/v cubes from the shared generator arithmetic."""
    i = np.arange(nx, dtype=np.int64)[None, None, :]
    j = np.arange(ny, dtype=np.int64)[None, :, None]
    k = np.arange(nt, dtype=np.int64)[:, None, None]
    ca, cb, cc, m, off, div = GRID_U
    u = ((i * ca + j * cb + k * cc) % m - off).astype(np.float64) / div
    ca, cb, cc, m, off, div = GRID_V
    v = ((i * ca + j * cb + k * cc) % m - off).astype(np.float64) / div
    return np.broadcast_to(u, (nt, ny, nx)).copy(), np.broadcast_to(v, (nt, ny, nx)).copy()


class GriddedVelocityField:
    """Bilinear-space × linear-time interpolated u/v cube — the full ST4/J4
    form of the reference's `VectorDataset._interpolate`
    (`/root/reference/main/tracking/particle_contour.py:249-298`, ROMS
    variant `:401-465`): xarray `.interp` is linear in x, y and time; points
    outside the cube fall back to the nearest edge value (here: clamped
    fractional indices, the vectorized equivalent of bfill/ffill at the
    domain boundary).

    The cube (``u``/``v`` shaped (nt, ny, nx)) is held immutably — built once
    per actor in ``__init__`` via ``AdvectStep(field=...)``, or broadcast by
    value for small cubes. Every interpolation op is a single IEEE
    mul/add/sub in a fixed order (x-lerp → y-lerp → t-lerp) so the DuckDB
    oracle reproduces trajectories bit-exactly.
    """

    time_dependent = True

    def __init__(self, u: np.ndarray, v: np.ndarray,
                 x0: float, y0: float, t0: float,
                 dx: float, dy: float, dt_grid: float):
        u = np.asarray(u, np.float64)
        v = np.asarray(v, np.float64)
        if u.shape != v.shape or u.ndim != 3:
            raise ValueError("u/v must be identically-shaped (nt, ny, nx) cubes")
        nt, ny, nx = u.shape
        if nx < 2 or ny < 2 or nt < 2:
            raise ValueError("cube needs >= 2 samples per axis for lerp")
        self.u, self.v = u, v
        self.x0, self.y0, self.t0 = float(x0), float(y0), float(t0)
        self.dx, self.dy, self.dtg = float(dx), float(dy), float(dt_grid)
        self.nx, self.ny, self.nt = nx, ny, nt

    @staticmethod
    def _axis(p, p0, step, n):
        """Clamped fractional index → (int lower index, fraction)."""
        ix = np.minimum(np.maximum((p - p0) / step, 0.0), n - 1.0)
        i0 = np.minimum(np.floor(ix), n - 2.0)
        return i0.astype(np.int64), ix - i0

    @staticmethod
    def _interp(cube, i, j, k, fx, fy, ft):
        # x-lerp → y-lerp → t-lerp, each `a + (b - a) * f`: the exact op
        # order the SQL twin inlines.
        def g(di, dj, dk):
            return cube[k + dk, j + dj, i + di]
        ax00 = g(0, 0, 0) + (g(1, 0, 0) - g(0, 0, 0)) * fx
        ax10 = g(0, 1, 0) + (g(1, 1, 0) - g(0, 1, 0)) * fx
        ax01 = g(0, 0, 1) + (g(1, 0, 1) - g(0, 0, 1)) * fx
        ax11 = g(0, 1, 1) + (g(1, 1, 1) - g(0, 1, 1)) * fx
        ay0 = ax00 + (ax10 - ax00) * fy
        ay1 = ax01 + (ax11 - ax01) * fy
        return ay0 + (ay1 - ay0) * ft

    def velocity(self, x: np.ndarray, y: np.ndarray,
                 t: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        i, fx = self._axis(x, self.x0, self.dx, self.nx)
        j, fy = self._axis(y, self.y0, self.dy, self.ny)
        k, ft = self._axis(t, self.t0, self.dtg, self.nt)
        return (self._interp(self.u, i, j, k, fx, fy, ft),
                self._interp(self.v, i, j, k, fx, fy, ft))


class AdvectStep:
    """Actor: one RK step of every particle batch through the held field.

    Time-independent fields expose ``velocity(x, y)``; fields with
    ``time_dependent = True`` expose ``velocity(x, y, t)`` and particles
    carry their clock in a ``t`` column (state lives in the rows) — RK
    stages sample the field at t, t+dt/2, t+dt/2, t+dt exactly as the
    reference's `particle_contour.py:596-648` Particle.step."""

    def __init__(self, field=None, dt: float = 60.0, order: int = 4):
        self.field = field if field is not None else RankineVortexField()
        self.dt = dt
        if order not in (1, 2, 4):
            raise ValueError("RK order must be 1, 2 or 4")
        self.order = order
        self.time_dep = bool(getattr(self.field, "time_dependent", False))

    def _vel(self, x, y, t=None):
        if self.time_dep:
            u, v = self.field.velocity(x, y, t)
        else:
            u, v = self.field.velocity(x, y)
        return np.nan_to_num(u), np.nan_to_num(v)  # NaN → zero vector

    def __call__(self, b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = b["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = th = tf = None
        if self.time_dep:
            t = b["t"].to_numpy(zero_copy_only=False).astype(np.float64)
            th = t + self.dt / 2
            tf = t + self.dt
        dt = self.dt
        if self.order == 1:
            u, v = self._vel(x, y, t)
            nx, ny = x + u * dt, y + v * dt
        elif self.order == 2:
            u1, v1 = self._vel(x, y, t)
            u2, v2 = self._vel(x + u1 * dt / 2, y + v1 * dt / 2, th)
            nx, ny = x + u2 * dt, y + v2 * dt
        else:
            u1, v1 = self._vel(x, y, t)
            u2, v2 = self._vel(x + u1 * dt / 2, y + v1 * dt / 2, th)
            u3, v3 = self._vel(x + u2 * dt / 2, y + v2 * dt / 2, th)
            u4, v4 = self._vel(x + u3 * dt, y + v3 * dt, tf)
            nx = x + (u1 + 2 * u2 + 2 * u3 + u4) * dt / 6
            ny = y + (v1 + 2 * v2 + 2 * v3 + v4) * dt / 6
        out = (b.drop_columns(["x", "y"])
                .append_column("x", pa.array(nx))
                .append_column("y", pa.array(ny)))
        if self.time_dep:
            out = out.drop_columns(["t"]).append_column("t", pa.array(tf))
        return out


def circle_seeds(n: int, center=(0.0, 0.0), radius: float = 500.0) -> pa.Table:
    """Equally-spaced ring of seed particles (P4 `circle_of_points`)."""
    ang = 2 * np.pi * np.arange(n) / n
    return pa.table({
        "particle_id": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(center[0] + radius * np.cos(ang)),
        "y": pa.array(center[1] + radius * np.sin(ang)),
    })


def track(seeds: pa.Table, field=None, dt: float = 60.0, steps: int = 60,
          snapshot_every: int = 10, order: int = 4,
          use_actors: bool = False, concurrency=(1, 4),
          t_start: float = 0.0) -> ray.data.Dataset:
    """Driver loop: advect the particle Dataset ``steps`` times, snapshot
    every ``snapshot_every`` steps; returns the unioned snapshot Dataset
    (step, particle_id, x, y[, t]).

    ``use_actors=True`` holds the field in an actor pool (the ST4 pattern —
    required when the field is a large interpolated cube); the default runs
    the stepper as stateless tasks, correct for cheap closed-form fields
    (the per-step map_batches would otherwise respawn an actor pool every
    iteration of the driver loop).

    Time-dependent fields get a ``t`` column stamped at ``t_start`` (unless
    the seeds already carry one); each step advances it by ``dt``.
    """
    if getattr(field, "time_dependent", False) and "t" not in seeds.column_names:
        seeds = seeds.append_column(
            "t", pa.array(np.full(len(seeds), float(t_start), np.float64)))
    ds = ray.data.from_arrow(seeds)
    snaps = []

    def stamp(step: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("step", pa.array(np.full(len(b), step, np.int64)))
        return fn

    stepper = AdvectStep(field=field, dt=dt, order=order)
    snaps.append(ds.map_batches(stamp(0), batch_format="pyarrow").materialize())
    for s in range(1, steps + 1):
        if use_actors:
            stepped = ds.map_batches(
                AdvectStep,
                fn_constructor_kwargs={"field": field, "dt": dt, "order": order},
                batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
        else:
            stepped = ds.map_batches(stepper, batch_format="pyarrow")
        ds = stepped.materialize()  # pin each step: the loop re-enters the same data
        if s % snapshot_every == 0:
            snaps.append(ds.map_batches(stamp(s), batch_format="pyarrow").materialize())
    out = snaps[0]
    if len(snaps) > 1:
        out = out.union(*snaps[1:])
    return out


def track_checkpointed(seeds: pa.Table, out_dir: str, field=None,
                       dt: float = 60.0, steps: int = 60,
                       snapshot_every: int = 10, order: int = 4,
                       t_start: float = 0.0, fail_after: int | None = None,
                       use_actors: bool = False,
                       concurrency=(1, 4)) -> ray.data.Dataset:
    """`track` with DURABLE snapshots (P3 polish, round-3 item 8): every
    coarse snapshot is an atomic manifest-committed parquet partition
    (`state.manifest`), so a killed tracking run resumes from the LAST
    committed snapshot instead of step 0 — snapshots are full particle
    state, and steps are pure functions of state, so the continuation is
    bit-identical to an uninterrupted run.

    ``fail_after`` injects a crash after N commits *in this invocation*
    (the kill/restart test hook, as `run_partitioned`). Returns the full
    snapshot Dataset read back from the committed partitions (step,
    particle_id, x, y[, t])."""
    import os

    from ..state.manifest import Manifest, write_and_commit

    if steps % snapshot_every:
        raise ValueError("steps must be a multiple of snapshot_every "
                         "(resume state is only durable at snapshots)")
    man = Manifest(out_dir)
    done = man.committed()
    snap_steps = list(range(0, steps + 1, snapshot_every))

    def unit(s: int) -> str:
        return f"step_{s:06d}"

    # resume point: the longest COMMITTED PREFIX (commits are ordered, so
    # a crash loses at most the in-flight snapshot; a gap from manual
    # deletion forces recompute from the last contiguous snapshot)
    resume = -1
    for s in snap_steps:
        if unit(s) not in done:
            break
        resume = s

    lineage = f"rk{order} dt={dt} snapshot_every={snapshot_every}"
    time_dep = bool(getattr(field, "time_dependent", False))
    commits = 0

    def stamp(step: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                "step", pa.array(np.full(len(b), step, np.int64)))
        return fn

    def commit(s: int, state: ray.data.Dataset) -> None:
        nonlocal commits
        if fail_after is not None and commits >= fail_after:
            raise RuntimeError(f"injected failure after {commits} commits")
        write_and_commit(man, out_dir, unit(s),
                         state.map_batches(stamp(s), batch_format="pyarrow"),
                         lineage)
        commits += 1

    if resume < 0:
        if time_dep and "t" not in seeds.column_names:
            seeds = seeds.append_column(
                "t", pa.array(np.full(len(seeds), float(t_start), np.float64)))
        ds = ray.data.from_arrow(seeds)
        commit(0, ds)
        resume = 0
    elif resume < steps:
        ds = (ray.data.read_parquet(os.path.join(out_dir, unit(resume)))
              .map_batches(lambda b: b.drop_columns(["step"]),
                           batch_format="pyarrow").materialize())

    stepper = AdvectStep(field=field, dt=dt, order=order)
    for s in range(resume + 1, steps + 1):
        if use_actors:
            stepped = ds.map_batches(
                AdvectStep,
                fn_constructor_kwargs={"field": field, "dt": dt, "order": order},
                batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
        else:
            stepped = ds.map_batches(stepper, batch_format="pyarrow")
        ds = stepped.materialize()
        if s % snapshot_every == 0:
            commit(s, ds)

    # Ray 2.49 read_parquet treats LIST entries as files — expand each
    # committed partition dir to its parquet files
    paths = []
    for s in snap_steps:
        d = os.path.join(out_dir, unit(s))
        paths.extend(sorted(os.path.join(d, f) for f in os.listdir(d)
                            if f.endswith(".parquet")))
    return ray.data.read_parquet(paths)


def resample_contour(snapshot: pa.Table, n_out: int) -> pa.Table:
    """Arc-length re-parameterization of an ordered particle ring to
    ``n_out`` equally-spaced vertices — `particle_contour.py:1031-1062`
    (`interpolate_contour`: cumulative perimeter + linear interp). Runs
    per contour inside ``groupby(contour_id).map_groups`` at scale (the
    whole ring must sit in one group, SURVEY.md P2)."""
    import pandas as pd
    df = snapshot.to_pandas().sort_values("particle_id")
    x = np.append(df.x.to_numpy(), df.x.iloc[0])
    y = np.append(df.y.to_numpy(), df.y.iloc[0])
    seg = np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = s[-1]
    target = np.linspace(0, total, n_out, endpoint=False)
    nx = np.interp(target, s, x)
    ny = np.interp(target, s, y)
    return pa.table({"particle_id": pa.array(np.arange(n_out, dtype=np.int64)),
                     "x": pa.array(nx), "y": pa.array(ny)})


def contour_measures(snapshot: pa.Table) -> dict:
    """area (shoelace) + perimeter of an ordered particle ring — the
    `utilities.py:357-380` / `particle_contour.py:834-841` analogue."""
    import pandas as pd
    df = snapshot.to_pandas().sort_values("particle_id")
    x = df.x.to_numpy()
    y = df.y.to_numpy()
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    area = 0.5 * abs(float(np.sum(x * y2 - x2 * y)))
    perim = float(np.sum(np.sqrt((x2 - x) ** 2 + (y2 - y) ** 2)))
    return {"area": area, "perimeter": perim}
