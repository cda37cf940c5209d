"""DuckDB SQL twin of the end-to-end corpus-curation pipeline
(`pipelines.corpus.curate_docs`) — the composed LLM-training-data flow:

    quality + language filter → exact dedup (keep min id per identical
    text) → near-dup dedup (keep min id per Jaccard-≥τ component) →
    deterministic splitmix64 sample → (doc_id, n_tokens, lang_score)

Every stage reuses the already-oracle-proven building blocks
(`sqlgen_text`, `sqlgen_dedup`, `sqlgen_sample`), composed over CTEs in
the same order the Ray pipeline applies them, so a single VALUES-exact
match proves the whole composition, not just the parts.
"""

from __future__ import annotations

from .sqlgen_dedup import survivor_ctes
from .sqlgen_sample import _quote, hash_sample_sql
from .sqlgen_text import lang_id_query, text_stats_select


def curate_corpus_sql(lang: str = "en", min_tokens: int = 20,
                      max_punct: str = "0.05", threshold: float = 0.8,
                      rate: float = 0.5, salt: int = 13) -> str:
    """The full curation query over the ``documents`` view.

    ``max_punct`` is a decimal *string* cast to DOUBLE — a bare literal
    would be DECIMAL (exact arithmetic) and compare differently from the
    Ray side's float64 ratio.
    """
    sample = hash_sample_sql("survivors", "doc_id", rate, salt,
                             select="doc_id, n_tokens, lang_score").strip()
    return f"""
WITH RECURSIVE
langs AS ({lang_id_query()}),
stats AS (SELECT doc_id, {text_stats_select()} FROM documents),
filtered AS (
  SELECT d.doc_id, d.text, s.n_tokens, l.lang_score
  FROM documents d
  JOIN langs l USING (doc_id)
  JOIN stats s USING (doc_id)
  WHERE l.lang_pred = {_quote(lang)} AND s.n_tokens >= {min_tokens}
    AND s.punct_ratio < CAST('{max_punct}' AS DOUBLE)
),
exact AS (
  SELECT doc_id, text, n_tokens, lang_score FROM (
    SELECT f.*, MIN(doc_id) OVER (PARTITION BY md5(text)) AS min_id
    FROM filtered f
  ) WHERE doc_id = min_id
),
{survivor_ctes("exact", threshold)}
SELECT doc_id, n_tokens, lang_score FROM ({sample})
"""
