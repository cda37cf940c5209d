"""Leading principal component via exact fixed-point power iteration.

The PCA step of an embedding-curation pipeline (whitening, dominant-
direction removal à la all-but-the-top), done so the distributed part is
exact and the result bit-matches a SQL twin:

1. **Distributed**: the exact int64 second-moment matrix ``C = QᵀQ`` over
   ``q = round(e·scale)`` — reuses `ann.embedding_second_moment`'s
   per-block integer matmul partials (D(D+1)/2 rows per block, coalesced
   finish). The driver pull is D² — matrix-sized by definition, like the
   BPE merge table.
2. **Driver**: ``iters`` power-iteration steps ``v ← trunc(C·v / 2^s)``
   in arbitrary-precision Python ints, where the per-step shift
   ``s = max(0, bitlen(max|C·v|) − VCAP_BITS)`` renormalizes v into
   ``±2^VCAP_BITS`` — the *same* integer arithmetic DuckDB runs in the
   twin (BIN length = bit length, ``//`` truncates toward zero on both
   sides), so every component is bit-identical with no float in sight.

Magnitude budget: |C| ≤ N·(scale·max|e|)²; with ``scale = 10³`` and unit-
normal embeddings, C·v stays inside int64 up to ~10⁷ vectors at
VCAP_BITS = 16. Beyond that the engine raises loudly (DuckDB's BIGINT
would error identically) — lower ``scale`` to proceed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

PCA_SCALE = 10**3
VCAP_BITS = 16
PCA_ITERS = 3


def embedding_pca_power(ds: ray.data.Dataset, iters: int = PCA_ITERS,
                        scale: int = PCA_SCALE) -> ray.data.Dataset:
    """``(dim, v_component)`` — the un-normalized leading-eigenvector
    estimate after ``iters`` exact fixed-point power steps from the
    all-ones start vector."""
    from .ann import embedding_second_moment

    tri = embedding_second_moment(ds, scale=scale).to_pandas()
    if len(tri) == 0:
        return ray.data.from_arrow(pa.table({
            "dim": pa.array([], pa.int64()),
            "v_component": pa.array([], pa.int64())}))
    d = int(tri.i.max()) + 1
    C = [[0] * d for _ in range(d)]
    for i, j, c in zip(tri.i, tri.j, tri.qq_sum):
        C[int(i)][int(j)] = int(c)
        C[int(j)][int(i)] = int(c)
    v = [1] * d
    for _ in range(iters):
        w = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        for x in w:
            if not -(2**63) <= x < 2**63:
                raise OverflowError(
                    "pca power step leaves int64 — lower `scale` "
                    "(the DuckDB twin would error identically)")
        m = max(max(abs(x) for x in w), 1)
        s = max(0, m.bit_length() - VCAP_BITS)
        v = [(x >> 0 if s == 0 else
              (x // (1 << s) if x >= 0 else -((-x) // (1 << s))))
             for x in w]
    return ray.data.from_arrow(pa.table({
        "dim": pa.array(np.arange(d, dtype=np.int64)),
        "v_component": pa.array(np.array(v, dtype=np.int64))}))


def _pca_cte(dim: int = 64, iters: int = PCA_ITERS,
             scale: int = PCA_SCALE,
             table: str = "embeddings") -> tuple[str, str]:
    """(CTE body, final-iterate name) — shared by the PCA query and the
    all-but-the-top debias query."""
    steps = []
    prev = "v0"
    for t in range(1, iters + 1):
        steps.append(f"""
w{t} AS (
  SELECT cf.i AS dim, CAST(SUM(cf.c * {prev}.v) AS BIGINT) AS w
  FROM cf JOIN {prev} ON {prev}.dim = cf.j GROUP BY cf.i
),
s{t} AS (
  SELECT GREATEST(LENGTH(BIN(GREATEST(MAX(ABS(w)), 1))) - {VCAP_BITS}, 0)
           AS s
  FROM w{t}
),
v{t} AS (
  SELECT dim,
         CASE WHEN w >= 0
              THEN w // (CAST(1 AS BIGINT) << (SELECT s FROM s{t}))
              ELSE -((-w) // (CAST(1 AS BIGINT) << (SELECT s FROM s{t})))
         END AS v
  FROM w{t}
)""")
        prev = f"v{t}"
    body = f"""q AS (
  SELECT vec_id, CAST(t.i AS BIGINT) AS i,
         CAST(ROUND(CAST(embedding[t.i + 1] AS DOUBLE) * {scale})
              AS BIGINT) AS qv
  FROM {table} CROSS JOIN generate_series(0, {dim - 1}) t(i)
),
cu AS (
  SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS c
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i
  GROUP BY 1, 2
),
cf AS (
  SELECT i, j, c FROM cu
  UNION ALL
  SELECT j AS i, i AS j, c FROM cu WHERE i <> j
),
v0 AS (
  SELECT CAST(t.i AS BIGINT) AS dim, CAST(1 AS BIGINT) AS v
  FROM generate_series(0, {dim - 1}) t(i)
),{",".join(steps)}"""
    return body, prev


def embedding_pca_power_sql(dim: int = 64, iters: int = PCA_ITERS,
                            scale: int = PCA_SCALE,
                            table: str = "embeddings") -> str:
    body, last = _pca_cte(dim, iters, scale, table)
    return f"""
WITH {body}
SELECT dim, v AS v_component FROM {last}
"""


def embedding_debias(ds_factory, iters: int = PCA_ITERS,
                     scale: int = PCA_SCALE) -> ray.data.Dataset:
    """All-but-the-top (Mu & Viswanath 2018) step 2: remove the dominant
    direction from every embedding, exactly — long-form int64 output
    ``(vec_id, dim, corrected)`` where

        corrected_i = q_i·‖v‖² − (q·v)·v_i,

    i.e. the orthogonal-projection residual cross-multiplied by ‖v‖² so
    no division happens (bit-exact twin; divide by ‖v‖² downstream if a
    float residual is wanted). ``v`` is the PCA fixed-point iterate
    (D-sized, broadcast); one streaming scan over the corpus.

    Magnitude budget: |q|·‖v‖² and |q·v|·|v| both ≤ ~2⁵¹ at the default
    scale/VCAP — a loud Python-int bound check per batch raises before
    any silent int64 wrap (numpy would wrap; the twin would error)."""
    vdf = embedding_pca_power(ds_factory(), iters=iters,
                              scale=scale).to_pandas().sort_values("dim")
    v = vdf.v_component.to_numpy().astype(np.int64)
    n2 = int(sum(int(x) * int(x) for x in v))
    d = len(v)
    vmax = int(np.abs(v).max()) if d else 0

    def fix(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        arr = b["embedding"].combine_chunks() \
            if isinstance(b["embedding"], pa.ChunkedArray) else b["embedding"]
        flat = arr.flatten()
        q = pc.cast(pc.round(pc.multiply(pc.cast(flat, pa.float64()),
                                         float(scale)),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        n = len(arr)
        if n == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "corrected": pa.array([], pa.int64())})
        if len(q) != n * d:
            raise ValueError("ragged embedding lists")
        Q = q.reshape(n, d)
        qmax = int(np.abs(Q).max())
        # worst-case products in Python ints — no silent wrap possible
        if max(qmax * n2, qmax * d * vmax * vmax) >= 2**62:
            raise OverflowError("debias product leaves int64 — lower "
                                "`scale` (the twin errors identically)")
        dot = Q @ v
        out = Q * n2 - dot[:, None] * v[None, :]
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "corrected": pa.array(out.ravel())})

    return ds_factory().map_batches(fix, batch_format="pyarrow",
                                    zero_copy_batch=True)


def embedding_debias_sql(dim: int = 64, iters: int = PCA_ITERS,
                         scale: int = PCA_SCALE,
                         table: str = "embeddings") -> str:
    body, last = _pca_cte(dim, iters, scale, table)
    return f"""
WITH {body},
n2 AS (SELECT CAST(SUM(v * v) AS BIGINT) AS n2 FROM {last}),
dots AS (
  SELECT q.vec_id, CAST(SUM(q.qv * vv.v) AS BIGINT) AS dot
  FROM q JOIN {last} vv ON vv.dim = q.i
  GROUP BY q.vec_id
)
SELECT q.vec_id, q.i AS dim,
       CAST(q.qv * (SELECT n2 FROM n2) - dots.dot * vv.v AS BIGINT)
         AS corrected
FROM q JOIN dots ON dots.vec_id = q.vec_id
       JOIN {last} vv ON vv.dim = q.i
"""
