"""DuckDB oracle SQL for the near-dup dedup family.

Both oracles recompute the *final verified output* from first principles —
no sketch shortcuts — so a match proves the whole LSH → verify pipeline:

- ``minhash_pairs``: all pairs with exact distinct-byte-5-gram Jaccard ≥ τ.
  The Ray pipeline emits exactly this set whenever LSH recall is 1.0 on the
  input — verified to hold for the deterministic sf0.01 fixture (all true
  pairs have J ≥ 0.928; the whole stack is RNG-free, so the equality is
  stable run-to-run). Gram identity is by string; the Ray side compares
  64-bit FNV-1a hashes (collision probability ~1e-14 per doc — the oracle
  would catch one as a VALUES mismatch).
- ``simhash_pairs``: recomputes the 64-bit weighted SimHash **bit-exactly
  in SQL** (FNV-1a of every 5-byte window as HUGEINT arithmetic mod 2⁶⁴,
  64 per-bit majority votes), then all pairs with Hamming ≤ 3. Recall of
  the Ray side's 3-of-6 block bucketing is guaranteed 1.0 by pigeonhole,
  so this equality is exact by construction, not by fixture luck.

Fixture texts are ASCII (`length(text)` = byte length; `substr` windows =
byte windows), matching `core.hashing.gram_hash_matrix`'s byte-level grams.
Docs shorter than 5 bytes take the same sentinel both sides (gram hash
0xDEADBEEF / gram string chr(1)).
"""

from __future__ import annotations

FNV_OFFSET = 14695981039346656037
FNV_PRIME = 1099511628211
MOD64 = 1 << 64
SENTINEL = 0xDEADBEEF


def _fnv5_expr(text_col: str = "text", pos: str = "i") -> str:
    """FNV-1a 64 of the 5 bytes at 1-based position ``pos`` (HUGEINT mod 2⁶⁴)."""
    h = f"CAST({FNV_OFFSET} AS HUGEINT)"
    for j in range(5):
        b = f"CAST(ascii(substr({text_col}, {pos}+{j}, 1)) AS HUGEINT)"
        h = f"((xor({h}, {b}) * {FNV_PRIME}) % {MOD64})"
    return h


def _grams_cte() -> str:
    """All 5-byte-window FNV hashes per doc (multiset), sentinel for short docs."""
    return f"""grams AS (
  SELECT doc_id, {_fnv5_expr()} AS h
  FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text)-4)) AS i)
  WHERE length(text) >= 5
  UNION ALL
  SELECT doc_id, CAST({SENTINEL} AS HUGEINT) AS h
  FROM documents WHERE length(text) < 5
)"""


def pairs_ctes(table: str = "documents", threshold: float = 0.8) -> str:
    """CTE chain ``g, sz, inter, pairs`` computing the exact
    distinct-5-gram Jaccard ≥ threshold pairs (id_a < id_b) over any
    ``table``/CTE with (doc_id, text) — embeddable in a larger WITH."""
    return f"""g AS (
  SELECT DISTINCT doc_id, substr(text, i, 5) AS gram
  FROM {table}, LATERAL (SELECT unnest(generate_series(1, length(text)-4)) AS i)
  WHERE length(text) >= 5
  UNION
  SELECT doc_id, chr(1) AS gram FROM {table} WHERE length(text) < 5
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b,
         CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
  FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= {threshold}
)"""


def minhash_pairs_sql(threshold: float = 0.8, table: str = "documents") -> str:
    """Exact distinct-5-gram Jaccard ≥ threshold pairs (id_a < id_b)."""
    return f"""
WITH {pairs_ctes(table, threshold)}
SELECT id_a, id_b, jaccard FROM pairs
"""


def component_ctes(table: str = "documents", threshold: float = 0.8) -> str:
    """CTE chain ``g..pairs, edges, reach, rep`` — per dup-cluster member
    its component label (min reachable id). Must sit inside a WITH
    RECURSIVE; keep-one and keep-best survivors both build on it."""
    return f"""{pairs_ctes(table, threshold)},
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(id, r) AS (
  SELECT a AS id, b AS r FROM edges
  UNION
  SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
),
rep AS (SELECT id, LEAST(id, MIN(r)) AS rep FROM reach GROUP BY id)"""


def survivor_ctes(table: str = "documents", threshold: float = 0.8) -> str:
    """``component_ctes`` + ``survivors`` — keep-one near-dup survivors
    (all columns of ``table``; each component keeps its min doc_id)."""
    return f"""{component_ctes(table, threshold)},
survivors AS (
  SELECT d.* FROM {table} d LEFT JOIN rep ON d.doc_id = rep.id
  WHERE rep.id IS NULL OR rep.rep = d.doc_id
)"""


def dedup_corpus_keep_best_sql(threshold: float = 0.8,
                               table: str = "documents",
                               quality_col: str = "n_chars") -> str:
    """Surviving doc ids under the keep-BEST rule: each Jaccard-≥τ
    component keeps its highest-``quality_col`` member (ties → min id)
    instead of its min id — the curation rule real pipelines use (keep
    the longest/cleanest copy of each near-dup cluster)."""
    return f"""
WITH RECURSIVE {component_ctes(table, threshold)},
ranked AS (
  SELECT rep.id, ROW_NUMBER() OVER (
      PARTITION BY rep.rep
      ORDER BY d.{quality_col} DESC, rep.id ASC) AS rn
  FROM rep JOIN {table} d ON d.doc_id = rep.id
)
SELECT d.doc_id FROM {table} d LEFT JOIN rep ON d.doc_id = rep.id
WHERE rep.id IS NULL
UNION ALL
SELECT id AS doc_id FROM ranked WHERE rn = 1
"""


def simhash_cte() -> str:
    """CTE chain computing (doc_id, simhash BIGINT) bit-identical to
    `stages.dedup.simhash64` (weighted SimHash, majority per bit)."""
    return f"""{_grams_cte()},
bits AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN (h >> b.bit) % 2 = 1 THEN 1 ELSE 0 END) AS cnt,
         COUNT(*) AS n
  FROM grams, (SELECT unnest(generate_series(0, 63)) AS bit) b
  GROUP BY 1, 2
),
sh_u AS (
  SELECT doc_id,
         SUM(CASE WHEN 2*cnt > n THEN (CAST(1 AS HUGEINT) << bit)
                  ELSE CAST(0 AS HUGEINT) END) AS s
  FROM bits GROUP BY 1
),
sh AS (
  SELECT doc_id,
         CAST(CASE WHEN s >= {1 << 63} THEN s - {MOD64} ELSE s END AS BIGINT) AS simhash
  FROM sh_u
)"""


def dedup_corpus_sql(threshold: float = 0.8, table: str = "documents") -> str:
    """Surviving doc ids after keep-one near-dup dedup: connected
    components of the exact-Jaccard-≥τ pair graph via a recursive
    reachability closure (components are near-dup clusters — tiny — so the
    closure converges in a few steps); keep each component's min id."""
    return f"""
WITH RECURSIVE {survivor_ctes(table, threshold)}
SELECT doc_id FROM survivors
"""


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """All pairs (id_a < id_b) with Hamming(simhash) ≤ max_hamming."""
    return f"""
WITH {simhash_cte()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""
