"""Token-n-gram decontamination (stages/decontam.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages.decontam import shingle_contamination, shingle_rows
from pyofs_ray.stages.sample import split_labels


def test_shingle_rows_window_bounds():
    """Window count/content match the SQL twin's range() + truncating
    1-based-inclusive slice semantics, including short-doc (whole-sequence
    window), zero-token and whitespace-noise cases."""
    docs = [
        "a b c d e f g h i j",          # 10 toks → 3 windows of 8
        "one two three",                # 3 toks  → 1 short window
        "",                             # 0 toks  → 1 empty window
        "  x   y  ",                    # empties filtered → "x y"
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(docs))), "text": docs}))
    out = shingle_rows(ds).to_pandas()
    got = out.groupby("doc_id")["s"].apply(set).to_dict()
    assert got[0] == {"a b c d e f g h", "b c d e f g h i",
                      "c d e f g h i j"}
    assert got[1] == {"one two three"}
    assert got[2] == {""}
    assert got[3] == {"x y"}


def test_shingle_contamination_detects_passage_leak():
    """An eval doc embedding a verbatim 8-token passage from a train doc is
    flagged REGARDLESS of its position offset in either doc (the detector
    is alignment-free); unrelated eval docs are not flagged."""
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    salt = 23
    ids = np.arange(400, dtype=np.int64)
    labs = split_labels(ids, splits, salt)
    train_id = int(ids[labs == "train"][0])
    eval_ids = ids[labs != "train"]
    leak_id, clean_id = int(eval_ids[0]), int(eval_ids[1])
    passage = "the quick brown fox jumps over the lazy"  # 8 tokens
    texts = {
        train_id: "w1 w2 w3 " + passage + " t1 t2",
        leak_id: "zz " + passage + " qq",  # different offsets on purpose
        clean_id: "completely unrelated content with no shared windows "
                  "and nothing else in common at all here",
    }
    rows = [{"doc_id": int(i), "text": texts.get(int(i), f"f{i} " * 12)}
            for i in ids]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(8)
    out = shingle_contamination(ds, splits, salt).to_pandas()
    flagged = set(out["doc_id"])
    assert leak_id in flagged
    assert clean_id not in flagged
    assert train_id not in flagged  # train docs are never emitted
    assert set(out.columns) == {"doc_id", "split", "n_hits"}
    assert (out["n_hits"] > 0).all()
    assert set(out["split"]) <= {"val", "test"}
    assert int(out.set_index("doc_id").loc[leak_id, "n_hits"]) == 1


def test_shingle_contamination_no_overlap_empty():
    splits = {"train": 0.5, "val": 0.5}
    ids = np.arange(64, dtype=np.int64)
    rows = [{"doc_id": int(i), "text": (f"u{i}x%03d " % i) * 12}
            for i in ids]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = shingle_contamination(ds, splits, 7).to_pandas()
    assert len(out) == 0


def test_bloom_prefilter_path_is_bit_identical():
    """The Bloom-prefiltered path returns exactly the direct path's rows
    — superset candidates + exact in-bucket compare ⇒ lossless — even at
    an aggressive FPR where false positives certainly occur."""
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    salt = 23
    ids = np.arange(300, dtype=np.int64)
    labs = split_labels(ids, splits, salt)
    train_id = int(ids[labs == "train"][0])
    leak_id = int(ids[labs != "train"][0])
    passage = "alpha beta gamma delta epsilon zeta eta theta"
    texts = {train_id: "x y " + passage + " z",
             leak_id: passage + " tail words here"}
    rows = [{"doc_id": int(i), "text": texts.get(int(i), f"f{i} " * 10)}
            for i in ids]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(6)
    direct = (shingle_contamination(ds, splits, salt)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    bloomed = (shingle_contamination(ds, splits, salt, prefilter="bloom",
                                     bloom_fpr=0.3)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert direct.equals(bloomed)
    assert leak_id in set(direct.doc_id)
