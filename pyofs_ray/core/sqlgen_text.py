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
