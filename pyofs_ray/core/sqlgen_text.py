"""DuckDB SQL twins of the text-analysis stages (`stages.text`) — identical
RE2 patterns through ``regexp_extract_all``, identical argmax tie-breaks."""

from __future__ import annotations

from ..stages.text import DIGIT_RE, LANG_MARKERS, PUNCT_RE, TOKEN_RE


def _count(col: str, pattern: str) -> str:
    # DuckDB single-quoted literals are raw: only '' needs escaping
    esc = pattern.replace("'", "''")
    return f"CAST(len(regexp_extract_all({col}, '{esc}')) AS BIGINT)"


def text_stats_select(text_col: str = "text") -> str:
    return f"""
  {_count(text_col, TOKEN_RE)} AS n_tokens,
  {_count(text_col, PUNCT_RE)} AS n_punct,
  {_count(text_col, DIGIT_RE)} AS n_digits,
  CAST(LENGTH({text_col}) AS BIGINT) AS n_chars,
  CAST({_count(text_col, TOKEN_RE)} AS DOUBLE) / (LENGTH({text_col}) + 1) AS token_ratio,
  CAST({_count(text_col, PUNCT_RE)} AS DOUBLE) / (LENGTH({text_col}) + 1) AS punct_ratio"""


def lang_score_exprs(text_col: str = "text") -> dict[str, str]:
    out = {}
    for lang in sorted(LANG_MARKERS):
        out[lang] = "(" + " + ".join(_count(text_col, p) for p in LANG_MARKERS[lang]) + ")"
    return out


def lang_id_query(id_col: str = "doc_id", table: str = "documents",
                  text_col: str = "text") -> str:
    """Full query: (id, lang_pred, lang_score) — CASE cascade equal to numpy
    argmax with first-max (lexicographic) tie-break; 'und' when all zero."""
    scores = lang_score_exprs(text_col)
    langs = sorted(scores)
    inner = ", ".join(f"{scores[lang]} AS s_{lang}" for lang in langs)
    best = f"GREATEST({', '.join('s_' + lang for lang in langs)})"
    cases = " ".join(f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs)
    return f"""
SELECT {id_col},
       CASE WHEN {best} = 0 THEN 'und' {cases} END AS lang_pred,
       {best} AS lang_score
FROM (SELECT {id_col}, {inner} FROM {table})"""


def winnow_sql(table: str = "documents", text_col: str = "text",
               id_col: str = "doc_id") -> str:
    """Twin of `stages/text.winnow_fingerprints`: the k-gram polynomial
    hash is an exact HUGEINT sum (max term ≈ 2⁶⁷ ≪ int128) reduced
    % 2⁶⁴ once, matching numpy's uint64 wrap; the per-window rightmost-min
    selection is MIN over the same packed ``fp·2²⁰ + (2²⁰ − pos)`` value."""
    from ..stages.text import (WINNOW_BASE, WINNOW_FP_BITS, WINNOW_K,
                               WINNOW_POS_BITS, WINNOW_W)
    # the pos CTE aliases {text_col} AS text, so the hv terms must use
    # the alias — referencing {text_col} here breaks any non-default name
    terms = " + ".join(
        f"CAST(unicode(substr(text, i + {j}, 1)) AS HUGEINT)"
        f" * {WINNOW_BASE ** (WINNOW_K - 1 - j) % (1 << 64)}"
        for j in range(WINNOW_K))
    pos_mod = 1 << WINNOW_POS_BITS
    return f"""
WITH pos AS (
  SELECT {id_col} AS doc_id, {text_col} AS text,
         unnest(generate_series(1, LENGTH({text_col}) - {WINNOW_K} + 1)) AS i
  FROM {table}
  WHERE LENGTH({text_col}) >= {WINNOW_K + WINNOW_W - 1}
),
hv AS (
  SELECT doc_id, i,
         (({terms}) % {1 << 64}) % {1 << WINNOW_FP_BITS} * {pos_mod}
         + ({pos_mod} - i) AS v
  FROM pos
),
win AS (
  SELECT doc_id, i,
         MIN(v) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                                AND CURRENT ROW) AS mv
  FROM hv
)
SELECT DISTINCT doc_id,
       CAST({pos_mod} - (mv % {pos_mod}) AS BIGINT) AS pos,
       CAST(mv // {pos_mod} AS BIGINT) AS fp
FROM win WHERE i >= {WINNOW_W}
"""


def winnow_pairs_sql(table: str = "documents") -> str:
    """Twin of `pipelines/corpus.winnow_dup_pairs`: distinct (doc, fp)
    from the winnowing CTE, DF-capped fingerprints, pair count ≥ the
    shared-fingerprint threshold."""
    from ..pipelines.corpus import WINNOW_FP_DF_CAP, WINNOW_PAIR_MIN_SHARED
    base = winnow_sql(table)
    return f"""
WITH fps AS ({base}),
fpd AS (SELECT DISTINCT doc_id, fp FROM fps),
ok AS (SELECT fp FROM fpd GROUP BY fp
       HAVING COUNT(*) BETWEEN 2 AND {WINNOW_FP_DF_CAP}),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
  FROM fpd a JOIN fpd b USING (fp) JOIN ok USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, shared FROM pairs
WHERE shared >= {WINNOW_PAIR_MIN_SHARED}
"""


def quality_scores_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """Twin of `stages/text.quality_scores`."""
    from ..stages.text import STOPWORD_RE
    return f"""
SELECT {id_col},
       {_count(text_col, TOKEN_RE)} AS n_tokens,
       {_count(text_col, STOPWORD_RE)} AS n_stopwords,
       CAST({_count(text_col, STOPWORD_RE)} AS DOUBLE)
       / ({_count(text_col, TOKEN_RE)} + 1) AS stopword_ratio
FROM {table}
"""


def token_repetition_sql(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """Twin of `stages/text.token_repetition`."""
    return f"""
WITH tk AS (
  SELECT {id_col}, unnest(regexp_split_to_array({text_col}, '\\s+')) AS tok
  FROM {table}
),
f AS (SELECT {id_col}, tok FROM tk WHERE tok <> ''),
agg AS (
  SELECT {id_col}, COUNT(*) AS total, COUNT(DISTINCT tok) AS dist
  FROM f GROUP BY {id_col}
)
SELECT d.{id_col},
       CAST(COALESCE(a.total, 0) AS BIGINT) AS n_ws_tokens,
       CAST(COALESCE(a.dist, 0) AS BIGINT) AS n_distinct_tokens,
       CAST(COALESCE(a.total, 0) - COALESCE(a.dist, 0) AS DOUBLE)
       / (COALESCE(a.total, 0) + 1) AS repetition_ratio
FROM {table} d LEFT JOIN agg a ON d.{id_col} = a.{id_col}
"""
