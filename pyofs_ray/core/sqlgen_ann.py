"""DuckDB twins for the two approximate ANN serving paths whose candidate
logic is deterministic enough to mirror bit-for-bit: banded sign-LSH top-k
(`stages/ann.ann_topk_lsh`) and int8-ADC top-k (`stages/ann.ann_topk_quantized`).

Both twins output integer (query_id, vec_id, rank) only, like ANN_TOPK_SQL:
the float similarity never leaves either engine, so exactness rests on the
ORDERING agreeing. That holds under the same documented no-near-ties
assumption the brute `ann_topk` twin has relied on since round 1 (numpy
pairwise-summed dots vs DuckDB's list_cosine_similarity differ in final
ulps; a flip needs two candidates within ~1e-15 relative similarity).
The LSH twin additionally mirrors the hyperplane construction op-for-op:
splitmix64(i + 0xABCDEF) in HUGEINT 32-bit limbs (`sqlgen_sample._mulmod64`),
then the exact IEEE chain CAST(u AS DOUBLE)/2⁶⁴·2−1 — identical bits to
`stages/ann._hyperplanes`. Sign bits compare the raw-embedding dot with 0
(normalization is a positive per-row scale, so signs agree with the
engine's normalized dots outside the same near-zero measure-zero set).
"""

from __future__ import annotations

from .sqlgen_sample import MOD64, _GOLDEN, _C1, _C2, _mulmod64

_LSH_SALT = 0xABCDEF  # matches stages/ann._hyperplanes


def ann_topk_lsh_sql(num_queries: int = 8, k: int = 5, dim: int = 64,
                     num_bands: int = 24, target: int = 2048,
                     table: str = "embeddings") -> str:
    """Twin of `corpus.ann_topk_lsh`: band depth r from the corpus-scaled
    formula (`stages/ann.topk_planes_for`), B·r·dim splitmix64 hyperplane
    values, per-(vec, plane) sign bits packed into per-band keys, candidate
    = any shared (band, key), ranked by exact cosine DESC, vec_id ASC."""
    two64 = f"CAST('{float(MOD64):.1f}' AS DOUBLE)"
    return f"""
WITH nrow AS (SELECT COUNT(*) AS n FROM {table}),
par AS (
  SELECT CAST(LEAST(GREATEST(CEIL(LOG2(GREATEST(
             CAST({num_bands} AS DOUBLE) * n / CAST({target} AS DOUBLE),
             CAST(2 AS DOUBLE)))), 6), 32) AS BIGINT) AS r
  FROM nrow),
pi AS (
  SELECT UNNEST(range(0, (SELECT {num_bands} * r * {dim} FROM par))) AS i),
p0 AS (SELECT i, (CAST(i AS HUGEINT) + {_LSH_SALT} + {_GOLDEN}) % {MOD64}
               AS z0 FROM pi),
p1 AS (SELECT *, {_mulmod64('xor(z0, z0 >> 30)', _C1)} AS z1 FROM p0),
p2 AS (SELECT *, {_mulmod64('xor(z1, z1 >> 27)', _C2)} AS z2 FROM p1),
planes AS (
  SELECT i // {dim} AS plane, i % {dim} AS d,
         CAST(xor(z2, z2 >> 31) AS DOUBLE) / {two64} * 2 - 1 AS val
  FROM p2),
dots AS (
  SELECT e.vec_id, p.plane,
         SUM(CAST(e.embedding[CAST(p.d AS INTEGER) + 1] AS DOUBLE) * p.val)
           AS dot
  FROM {table} e, planes p
  GROUP BY e.vec_id, p.plane),
keys AS (
  SELECT vec_id, plane // (SELECT r FROM par) AS band,
         CAST(SUM(CASE WHEN dot > 0
                  THEN CAST(1 AS BIGINT) << CAST(plane % (SELECT r FROM par)
                                                 AS INTEGER)
                  ELSE 0 END) AS BIGINT) AS bkey
  FROM dots GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS vec_id
  FROM keys e JOIN keys q ON e.band = q.band AND e.bkey = q.bkey
  WHERE q.vec_id < {num_queries} AND e.vec_id != q.vec_id)
SELECT query_id, vec_id, rank FROM (
  SELECT c.query_id, c.vec_id,
         ROW_NUMBER() OVER (
             PARTITION BY c.query_id
             ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                      c.vec_id ASC) AS rank
  FROM cand c
  JOIN {table} e ON e.vec_id = c.vec_id
  JOIN {table} q ON q.vec_id = c.query_id
) WHERE rank <= {k}
"""


def ann_topk_quantized_sql(num_queries: int = 8, k: int = 5,
                           levels: int = 255,
                           table: str = "embeddings") -> str:
    """Twin of `corpus.ann_topk_quantized` (ADC): reconstruct each base
    vector through the same quantize→dequantize IEEE chain as
    `embedding_quantize_sql` (single double ops in engine order:
    lo + (floor((v−lo)·L/den + 0.5) · den) / L; constant dims → lo), then
    rank full-precision queries against the reconstructions by cosine."""
    lv = f"CAST({levels} AS DOUBLE)"
    return f"""
WITH vals AS (
  SELECT vec_id, UNNEST(embedding) AS vf,
         UNNEST(range(1, len(embedding) + 1)) AS dim
  FROM {table}
),
v AS (SELECT vec_id, CAST(dim AS BIGINT) AS dim,
             CAST(vf AS DOUBLE) AS v FROM vals),
rng AS (SELECT dim, MIN(v) AS lo, MAX(v) AS hi FROM v GROUP BY dim),
recon AS (
  SELECT v.vec_id,
         LIST(CASE WHEN r.hi > r.lo
              THEN r.lo + FLOOR((v.v - r.lo) * {lv} / (r.hi - r.lo)
                                + CAST(0.5 AS DOUBLE)) * (r.hi - r.lo) / {lv}
              ELSE r.lo END ORDER BY v.dim) AS emb
  FROM v JOIN rng r USING (dim)
  GROUP BY v.vec_id)
SELECT query_id, vec_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(c.emb, q.embedding) DESC,
                      c.vec_id ASC) AS rank
  FROM recon c
  CROSS JOIN (SELECT vec_id, embedding FROM {table}
              WHERE vec_id < {num_queries}) q
  WHERE c.vec_id != q.vec_id
) WHERE rank <= {k}
"""
