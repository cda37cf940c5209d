"""normalize_clean kernel: messy-input edges the lowercase/whitespace-
normalized fixture corpus cannot exercise, plus oracle parity."""

from __future__ import annotations

import pyarrow as pa

from pyofs_ray.pipelines import corpus
from pyofs_ray.stages.text import normalize_clean

from .conftest import SF_SMOKE, assert_matches_oracle


def _clean(*texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(list(texts))})
    out = normalize_clean(t)
    return out["clean_text"].to_pylist(), out["n_kept_tokens"].to_pylist()


def test_normalize_rules():
    clean, n = _clean("The  QUICK\tbrown\n\nfox  ",
                      "the and of", "word")
    assert clean[0] == "quick brown fox" and n[0] == 3
    assert clean[1] == "" and n[1] == 0      # all stopwords
    assert clean[2] == "word" and n[2] == 1


def test_stopword_is_token_level_not_substring():
    # 'theory' contains 'the' but is NOT a stopword token
    clean, n = _clean("theory of the mind")
    assert clean[0] == "theory mind" and n[0] == 2


def test_doc_clean_oracle(duck_smoke):
    assert_matches_oracle(corpus.doc_clean(SF_SMOKE), duck_smoke,
                          corpus.DOC_CLEAN_SQL)
