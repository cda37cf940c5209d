"""Crawl-history + crawl-policy operators over the pages corpus.

Three web-scale pipeline pieces the incremental-crawl store needs beyond
point-in-time snapshots (reference analogue: PyOFS's per-day granule
inventory and skip-existing scans, `state/manifest` / reference
`viirs.py` — the "what version was live when" and "may I fetch this"
questions asked against that inventory):

- ``scd2_url_history`` — SCD-type-2 version intervals per url from
  epochal crawl snapshots (`stages/scd.py`), the temporal complement of
  `crawl_diff_3way`'s single-epoch delta.
- ``robots_policy`` — robots.txt-style LONGEST-prefix-match rule
  application per url: broadcast rule table, per-batch vectorized
  `starts_with` cascade, zero shuffles.
- ``containment_pairs`` — asymmetric near-dup: docs ≥ τ CONTAINED in
  another doc (quote/excerpt detection), the directed complement of the
  symmetric Jaccard family in `stages/dedup.py`.

The fixture corpus is dup-free and single-epoch, so — like
`host_mirror_pairs` / `crawl_diff_3way` — each query plants its
deterministic fixture INSIDE the pipeline and the SQL twin seeds
identically, keeping the driver's gate row non-vacuous.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import pages_dataset

# ------------------------------------------------------------- SCD2 history
SCD_EPOCHS = 4          # crawl epochs 0..3
SCD_SENTINEL = 999      # open valid_to


def _emit_snapshots(b: pa.Table) -> pa.Table:
    """Four seeded crawl epochs per page: the text fingerprint bumps a
    version at epoch e ≥ 1 iff ``(page_key + e²) % 3 == 0`` — per key that
    yields 1, 2 or 3 distinct versions (key%3 = 1 / 0 / 2), exercising
    no-change runs, a mid-history change and consecutive changes. Only
    (key, url, epoch, fp) rows leave the read task — text never shuffles.
    """
    key = b["page_key"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = b["text"].to_pylist()
    n = len(key)
    ver = np.zeros((SCD_EPOCHS, n), np.int64)
    for e in range(1, SCD_EPOCHS):
        ver[e] = ver[e - 1] + ((key + e * e) % 3 == 0)
    maxv = ver[SCD_EPOCHS - 1]
    fpm = np.empty((SCD_EPOCHS, n), object)
    fpm[0] = np.asarray(
        [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts], object)
    for v in range(1, SCD_EPOCHS):
        for i in np.flatnonzero(maxv >= v):
            fpm[v, i] = hashlib.md5(
                (texts[i] + f" v{v}").encode("utf-8")).hexdigest()
    ar = np.arange(n)
    url = b["url"].combine_chunks()
    return pa.table({
        "page_key": pa.array(np.tile(key, SCD_EPOCHS)),
        "url": pa.concat_arrays([url] * SCD_EPOCHS),
        "epoch": pa.array(np.repeat(np.arange(SCD_EPOCHS, dtype=np.int64),
                                    n)),
        "fp": pa.array(np.concatenate(
            [fpm[ver[e], ar] for e in range(SCD_EPOCHS)]).tolist(),
            pa.string()),
    })


def scd2_url_history(sf_dir: str) -> ray.data.Dataset:
    """SCD-type-2 url history: (url, text_hash, valid_from, valid_to)
    version intervals over the seeded 4-epoch crawl (valid_to = 999 for
    the open current version).

    ZERO exchanges: the epoch emitter generates every snapshot of a key
    inside one batch, so the collapse runs fused in the same UDF —
    intervalizing BEFORE returning also means Ray's output-buffer block
    slicing can never tear a key's snapshot run (the ADVICE round-3
    prefix_emit failure shape). Snapshots arriving as separate rows (real
    multi-epoch crawl stores) go through the general one-exchange stage
    `stages/scd.scd2_intervals` instead, which the unit tests exercise
    with cross-bucket keys."""
    from ..stages.scd import intervals_table

    def emit_and_collapse(b: pa.Table) -> pa.Table:
        iv = intervals_table(_emit_snapshots(b), key_col="page_key",
                             ts_col="epoch", fp_col="fp", carry=("url",),
                             sentinel=SCD_SENTINEL)
        return pa.table({"url": iv["url"], "text_hash": iv["fp"],
                         "valid_from": iv["valid_from"],
                         "valid_to": iv["valid_to"]})

    return pages_dataset(sf_dir, keep_key=True).map_batches(
        emit_and_collapse, batch_format="pyarrow")


def scd2_url_history_sql() -> str:
    return f"""
snaps AS (
  SELECT p.page_key, p.url, t.e,
         SUM(CASE WHEN t.e > 0 AND (p.page_key + t.e * t.e) % 3 = 0
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY p.page_key ORDER BY t.e) AS ver,
         p.text
  FROM pages p CROSS JOIN (VALUES (0), (1), (2), (3)) t(e)
),
fps AS (
  SELECT url, e,
         md5(text || CASE WHEN ver = 0 THEN ''
                          ELSE ' v' || CAST(ver AS VARCHAR) END) AS fp
  FROM snaps
),
st AS (
  SELECT url, e, fp,
         CASE WHEN LAG(fp) OVER (PARTITION BY url ORDER BY e)
                   IS DISTINCT FROM fp THEN 1 ELSE 0 END AS s
  FROM fps
),
iv AS (SELECT url, fp, e FROM st WHERE s = 1)
SELECT url, fp AS text_hash, CAST(e AS BIGINT) AS valid_from,
       CAST(COALESCE(LEAD(e) OVER (PARTITION BY url ORDER BY e),
                     {SCD_SENTINEL}) AS BIGINT) AS valid_to
FROM iv
"""


# --------------------------------------------------- robots longest-prefix
# (prefix, allow); longest matching prefix wins — two distinct same-length
# prefixes cannot both match one path, so the winner is unique.
ROBOTS_RULES: tuple[tuple[str, int], ...] = (
    ("/", 1), ("/p/", 1), ("/p/1", 0), ("/p/3", 0), ("/p/7", 0),
    ("/p/12", 1), ("/p/33", 1), ("/p/77", 1))


def robots_policy(sf_dir: str) -> ray.data.Dataset:
    """Longest-prefix-match crawl-policy application: every page's path is
    matched against the broadcast rule table; the longest matching prefix
    decides allow/deny. Zero shuffles — per-batch vectorized
    ``starts_with`` cascade in ascending prefix-length order (a later,
    longer match overwrites a shorter one); the rule table is a module
    constant here and a ``ray.put`` broadcast for real robots corpora."""
    rules = sorted(ROBOTS_RULES, key=lambda r: (len(r[0]), r[0]))

    def apply_rules(b: pa.Table) -> pa.Table:
        n = len(b)
        path = pc.binary_join_element_wise(
            pa.array(["/p/"] * n), pc.cast(b["page_key"], pa.string()), "")
        matched = np.full(n, "", object)
        allowed = np.zeros(n, np.int64)
        for prefix, allow in rules:
            m = pc.starts_with(path, prefix).to_numpy(zero_copy_only=False)
            matched[m] = prefix
            allowed[m] = allow
        return pa.table({"url": b["url"],
                         "matched_rule": pa.array(matched.tolist(),
                                                  pa.string()),
                         "allowed": pa.array(allowed)})

    return pages_dataset(sf_dir, keep_key=True, with_text=False).map_batches(
        apply_rules, batch_format="pyarrow")


def robots_policy_sql() -> str:
    vals = ", ".join(f"('{p}', {a})" for p, a in ROBOTS_RULES)
    return f"""
rules AS (SELECT * FROM (VALUES {vals}) v(prefix, allow)),
m AS (SELECT url, '/p/' || CAST(page_key AS VARCHAR) AS path FROM pages)
SELECT m.url, r.prefix AS matched_rule, CAST(r.allow AS BIGINT) AS allowed
FROM m JOIN rules r ON starts_with(m.path, r.prefix)
QUALIFY ROW_NUMBER() OVER (PARTITION BY m.url
                           ORDER BY LENGTH(r.prefix) DESC) = 1
"""


# -------------------------------------------------------- containment pairs
QUOTE_MOD = 50            # every 50th page gets a seeded excerpt doc
QUOTE_STRIDE = 40_000_000  # excerpt doc_id offset (disjoint from replicas)
CONTAIN_NUM, CONTAIN_DEN = 4, 5   # τ = 0.8 as an exact integer ratio
CONTAIN_MAX_DF = 4096     # loud gate-scale bound (exactness is the contract)


def _seeded_quote_docs(b: pa.Table) -> pa.Table:
    """Base docs + a seeded middle-third excerpt ('Q<key> ' + slice) per
    ``page_key % QUOTE_MOD == 0`` page — every excerpt gram except the
    few spanning the salt prefix is a gram of its host, so the excerpt is
    ≈ (m-4)/(m+len(salt)) contained and passes τ for hosts ≳ 150 chars
    while staying a genuinely distinct document."""
    key = b["page_key"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = b["text"].to_pylist()
    qidx = np.flatnonzero(key % QUOTE_MOD == 0)
    qtexts = []
    for i in qidx:
        t = texts[i]
        third = len(t) // 3
        qtexts.append(f"Q{key[i]} " + t[third:third + third])
    return pa.table({
        "doc_id": pa.array(np.concatenate([key, key[qidx] + QUOTE_STRIDE])),
        "text": pa.concat_arrays([
            b["text"].combine_chunks().cast(pa.string()),
            pa.array(qtexts, pa.string())]),
    })


def containment_pairs(sf_dir: str) -> ray.data.Dataset:
    """Directed near-dup: (contained_id, container_id, shared, n_contained)
    for every doc pair where ≥ τ of the contained doc's distinct byte
    5-grams appear in the container — quote/excerpt detection, the
    asymmetric complement of `minhash_pairs`' symmetric Jaccard.

    Exactness is the contract (same gram space and FNV hashing as the
    Jaccard family, `stages/dedup._distinct_gram_rows`): ONE gram-hash
    bucket exchange, per-gram pair expansion (Σ df² — the same cost the
    DuckDB twin pays), pair totals via a second bounded exchange. A gram
    with df > {CONTAIN_MAX_DF} raises loudly instead of truncating
    (ADVICE round-3: silent caps void exact contracts); vocabulary-
    saturated corpora should use the prefix-filtered Jaccard family
    instead — this operator is gate-scale, like `ngram_jaccard_pairs`.
    """
    import ray as _ray

    from ..stages.agg import bucketed_group_agg, hash_bucket_tag
    from ..stages.cocite import _pair_rows
    from ..stages.dedup import _distinct_gram_rows

    cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    nb = max(8, cpus)

    def gram_rows(b: pa.Table) -> pa.Table:
        return _distinct_gram_rows(_seeded_quote_docs(b), "doc_id")

    rows = pages_dataset(sf_dir, keep_key=True).map_batches(
        gram_rows, batch_format="pyarrow")
    tagged = rows.map_batches(lambda b: hash_bucket_tag(b, ["bkey"], nb),
                              batch_format="pyarrow")

    def pair_kernel(g: pa.Table) -> pa.Table:
        bkey = g["bkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ng = g["ng"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, counts = np.unique(bkey, return_counts=True)
        if len(counts) and counts.max() > CONTAIN_MAX_DF:
            raise RuntimeError(
                f"containment_pairs: gram df {counts.max()} exceeds the "
                f"exactness bound {CONTAIN_MAX_DF} — vocabulary-saturated "
                "corpus; use the prefix-filtered Jaccard family instead")
        pairs = _pair_rows(pa.table({"dst": pa.array(bkey),
                                     "src": pa.array(ids)}))
        uid, first = np.unique(ids, return_index=True)
        ngu = ng[first]
        a = pairs["src_a"].to_numpy().astype(np.int64)
        c = pairs["src_b"].to_numpy().astype(np.int64)
        return pa.table({"id_a": pairs["src_a"], "id_b": pairs["src_b"],
                         "one": pairs["one"],
                         "n_a": pa.array(ngu[np.searchsorted(uid, a)]),
                         "n_b": pa.array(ngu[np.searchsorted(uid, c)])})

    parts = tagged.groupby("_bucket").map_groups(pair_kernel,
                                                 batch_format="pyarrow")
    counted = bucketed_group_agg(parts, ["id_a", "id_b"],
                                 [("one", "sum", "shared"),
                                  ("n_a", "max", "n_a"),
                                  ("n_b", "max", "n_b")])

    def direct(b: pa.Table) -> pa.Table:
        ia = b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = b["n_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        nbv = b["n_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ka = c * CONTAIN_DEN >= CONTAIN_NUM * na
        kb = c * CONTAIN_DEN >= CONTAIN_NUM * nbv
        return pa.table({
            "contained_id": pa.array(np.concatenate([ia[ka], ib[kb]])),
            "container_id": pa.array(np.concatenate([ib[ka], ia[kb]])),
            "shared": pa.array(np.concatenate([c[ka], c[kb]])),
            "n_contained": pa.array(np.concatenate([na[ka], nbv[kb]])),
        })

    return counted.map_batches(direct, batch_format="pyarrow")


def containment_pairs_sql() -> str:
    return f"""
cdocs AS (
  SELECT page_key AS doc_id, text FROM pages
  UNION ALL
  SELECT page_key + {QUOTE_STRIDE} AS doc_id,
         'Q' || CAST(page_key AS VARCHAR) || ' ' ||
         substr(text, length(text) // 3 + 1, length(text) // 3) AS text
  FROM pages WHERE page_key % {QUOTE_MOD} = 0
),
g AS (
  SELECT DISTINCT doc_id, substr(text, i, 5) AS gram
  FROM cdocs, LATERAL (SELECT unnest(generate_series(1, length(text)-4)) AS i)
  WHERE length(text) >= 5
  UNION
  SELECT doc_id, chr(1) AS gram FROM cdocs WHERE length(text) < 5
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS c
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a AS contained_id, id_b AS container_id, c AS shared,
       s.n AS n_contained
FROM inter JOIN sz s ON s.doc_id = id_a
WHERE c * {CONTAIN_DEN} >= {CONTAIN_NUM} * s.n
UNION ALL
SELECT id_b, id_a, c, s.n
FROM inter JOIN sz s ON s.doc_id = id_b
WHERE c * {CONTAIN_DEN} >= {CONTAIN_NUM} * s.n
"""


# ------------------------------------------------- politeness wave plan

def crawl_wave_plan(sf_dir: str) -> ray.data.Dataset:
    """Politeness-constrained crawl schedule: with one-request-per-host
    politeness, the frontier drains in WAVES — wave ``w`` fetches one url
    from every host that still has ≥ w urls queued. The wave profile
    (``n_hosts`` = fetches in that wave, ``cum_pages`` = frontier drained
    so far) is the crawl-makespan estimate: the tail after the bulk of
    hosts exhaust is exactly the hot-host skew (the fixture's 70 %-one-
    host shape shows as a long n_hosts=1 tail).

    Shape: per-host counts via `bucketed_group_agg` (host cardinality
    tracks corpus size), then the count HISTOGRAM coalesces (distinct
    count-values are log-scale few) and one finish kernel derives every
    wave row by suffix-cumsum — no per-wave expansion of the host table
    (the SQL twin's generate_series does expand; at engine scale the
    histogram form moves #distinct-counts rows, not #pages).
    """
    from ..pipelines.flagship import url_host
    from ..stages.agg import bucketed_group_agg

    pages = pages_dataset(sf_dir, with_text=False)

    def hosted(b: pa.Table) -> pa.Table:
        return pa.table({"host": url_host(b["url"]),
                         "one": pa.array(np.ones(len(b), np.int64))})

    per_host = bucketed_group_agg(
        pages.map_batches(hosted, batch_format="pyarrow"),
        ["host"], [("one", "sum", "cnt")])

    def hist_partial(b: pa.Table) -> pa.Table:
        c = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        uc, n = np.unique(c, return_counts=True)
        return pa.table({"cnt": pa.array(uc),
                         "n_hosts": pa.array(n.astype(np.int64))})

    def finish(b: pa.Table) -> pa.Table:
        c = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        nh = b["n_hosts"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(c, kind="stable")
        c, nh = c[order], nh[order]
        uc, inv = np.unique(c, return_inverse=True)
        hist = np.zeros(len(uc), np.int64)
        np.add.at(hist, inv, nh)
        waves = np.arange(1, int(uc.max()) + 1, dtype=np.int64) \
            if len(uc) else np.zeros(0, np.int64)
        # hosts still active in wave w = sum of hist over cnt >= w
        suffix = np.cumsum(hist[::-1])[::-1]
        n_hosts = suffix[np.searchsorted(uc, waves)]
        return pa.table({"wave": pa.array(waves),
                         "n_hosts": pa.array(n_hosts),
                         "cum_pages": pa.array(np.cumsum(n_hosts))})

    return (per_host.map_batches(hist_partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(finish, batch_format="pyarrow", batch_size=None))


def crawl_wave_plan_sql() -> str:
    """Composed after `sqlgen.pages_prefix()`."""
    return """
hc AS (
  SELECT SPLIT_PART(url, '/', 3) AS host,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pages GROUP BY host
),
wv AS (SELECT UNNEST(generate_series(1, cnt)) AS wave FROM hc)
SELECT wave, CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(COUNT(*)) OVER (ORDER BY wave) AS BIGINT) AS cum_pages
FROM wv GROUP BY wave
"""


# ------------------------------------------- placement / budget planning

def hrw_doc_shards(sf_dir: str, num_shards: int = 8) -> ray.data.Dataset:
    """Rendezvous-hashing shard plan over doc_id (`stages/placement.py`)."""
    from ..sources.readers import read_parquet_clean
    from ..stages.placement import hrw_shard_plan
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
    return hrw_shard_plan(ds, num_shards)


CRAWL_BUDGET = 200


def crawl_budget_alloc(sf_dir: str,
                       budget: int = CRAWL_BUDGET) -> ray.data.Dataset:
    """Max-min-fair fetch allocation across hosts under a global budget
    (`stages/placement.py:waterfill_alloc`): small hosts fetch fully,
    the hot host is clamped to the waterline — the fairness complement
    of `crawl_wave_plan`'s makespan view."""
    from ..pipelines.flagship import url_host
    from ..stages.agg import bucketed_group_agg
    from ..stages.placement import crawl_budget_waterfill

    pages = pages_dataset(sf_dir, with_text=False)

    def hosted(b: pa.Table) -> pa.Table:
        return pa.table({"host": url_host(b["url"]),
                         "one": pa.array(np.ones(len(b), np.int64))})

    per_host = bucketed_group_agg(
        pages.map_batches(hosted, batch_format="pyarrow"),
        ["host"], [("one", "sum", "cnt")])
    return crawl_budget_waterfill(per_host, budget)


# ------------------------------------------- cross-epoch content drift

def host_content_drift(sf_dir: str) -> ray.data.Dataset:
    """Per-host content drift between two crawl epochs, measured at CDC
    chunk granularity: epoch 1 PREPENDS a seeded marker to every third
    page (the byte-offset-shifting edit whole-doc hashing maximally
    overstates); drift = 1 − Jaccard of the host's chunk-signature sets,
    reported as exact integers (n0, n1, inter, uni) plus ``drift_ppm``.
    Because CDC boundaries move with content, an edited page loses only
    its head chunks — drift isolates how much of a site actually changed,
    not how many bytes moved.

    Shape: one pages scan emits BOTH epochs of a page in-batch (the
    `scd2_url_history` emitter discipline — both snapshots of a key in
    one kernel call), `cdc.chunk_batch` over the doubled batch, per-batch
    distinct (host, sig, epoch-presence) partials, ONE (host, sig) bucket
    exchange with max-combine, ONE host reduce. Hosts span batches, so
    presence flags combine with MAX across the exchange."""
    from ..core.geom import host_of_key
    from ..stages.agg import bucketed_group_agg
    from ..stages.cdc import chunk_batch

    def epochs_and_chunks(b: pa.Table) -> pa.Table:
        key = b["page_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = b["text"].combine_chunks() \
            if isinstance(b["text"], pa.ChunkedArray) else b["text"]
        mask = pa.array(key % 3 == 0)
        kstr = pa.array(key.astype(str))
        pre = pc.binary_join_element_wise(
            pa.array(["u"] * len(b)), kstr, pa.array([" "] * len(b)), "")
        edited = pc.if_else(mask,
                            pc.binary_join_element_wise(pre, text, ""),
                            text)
        doubled = pa.table({
            "sid": pa.array(np.concatenate([key * 2, key * 2 + 1])),
            "text": pa.concat_arrays([text, edited.combine_chunks()
                                      if isinstance(edited, pa.ChunkedArray)
                                      else edited])})
        ch = chunk_batch(doubled, id_col="sid")
        sid = ch["sid"].to_numpy(zero_copy_only=False).astype(np.int64)
        sig = ch["sig"].to_numpy(zero_copy_only=False).astype(np.int64)
        host = host_of_key(sid // 2)
        epoch = sid % 2
        # distinct (host, sig) presence flags within the batch
        u, inv = np.unique(np.stack([host, sig], axis=1), axis=0,
                           return_inverse=True)
        in0 = np.zeros(len(u), np.int64)
        in1 = np.zeros(len(u), np.int64)
        np.maximum.at(in0, inv, (epoch == 0).astype(np.int64))
        np.maximum.at(in1, inv, (epoch == 1).astype(np.int64))
        return pa.table({"host_id": pa.array(u[:, 0]),
                         "sig": pa.array(u[:, 1]),
                         "in0": pa.array(in0), "in1": pa.array(in1)})

    presence = bucketed_group_agg(
        pages_dataset(sf_dir, keep_key=True)
        .map_batches(epochs_and_chunks, batch_format="pyarrow",
                     zero_copy_batch=True),
        ["host_id", "sig"],
        [("in0", "max", "in0"), ("in1", "max", "in1")])

    def to_counts(b: pa.Table) -> pa.Table:
        i0 = b["in0"].to_numpy(zero_copy_only=False)
        i1 = b["in1"].to_numpy(zero_copy_only=False)
        return pa.table({"host_id": b["host_id"],
                         "n0": pa.array(i0), "n1": pa.array(i1),
                         "inter": pa.array(i0 * i1)})

    per_host = bucketed_group_agg(
        presence.map_batches(to_counts, batch_format="pyarrow"),
        ["host_id"],
        [("n0", "sum", "n0"), ("n1", "sum", "n1"),
         ("inter", "sum", "inter")])

    def finish(b: pa.Table) -> pa.Table:
        n0 = b["n0"].to_numpy(zero_copy_only=False)
        n1 = b["n1"].to_numpy(zero_copy_only=False)
        it = b["inter"].to_numpy(zero_copy_only=False)
        uni = n0 + n1 - it
        return pa.table({"host_id": b["host_id"], "n0": b["n0"],
                         "n1": b["n1"], "inter": b["inter"],
                         "uni": pa.array(uni),
                         "drift_ppm": pa.array(
                             (uni - it) * 1_000_000 // uni)})

    return per_host.map_batches(finish, batch_format="pyarrow")


def host_content_drift_sql() -> str:
    from ..core import geom
    from ..core.sqlgen_sample import MOD64
    from ..stages.cdc import _chunk_cte
    host_expr = (f"CASE WHEN (sid // 2) % 10 < {geom.HOST_HOT_FRAC} THEN 0 "
                 f"ELSE (sid // 2) % {geom.HOST_MOD} END")
    return f"""
WITH snap AS (
  SELECT doc_id * 2 AS sid, text FROM documents
  UNION ALL
  SELECT doc_id * 2 + 1 AS sid,
         CASE WHEN doc_id % 3 = 0
              THEN 'u' || CAST(doc_id AS VARCHAR) || ' ' || text
              ELSE text END AS text
  FROM documents
),
{_chunk_cte(16, 64, 'snap', 'sid').lstrip()},
sigs AS (
  SELECT DISTINCT {host_expr} AS host_id, sid % 2 AS epoch,
         CAST(CASE WHEN sigu >= {1 << 63} THEN sigu - {MOD64} ELSE sigu END
              AS BIGINT) AS sig
  FROM agg
),
per_sig AS (
  SELECT host_id, sig,
         MAX(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS in0,
         MAX(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS in1
  FROM sigs GROUP BY host_id, sig
)
SELECT host_id,
       CAST(SUM(in0) AS BIGINT) AS n0,
       CAST(SUM(in1) AS BIGINT) AS n1,
       CAST(SUM(in0 * in1) AS BIGINT) AS inter,
       CAST(SUM(in0) + SUM(in1) - SUM(in0 * in1) AS BIGINT) AS uni,
       CAST((SUM(in0) + SUM(in1) - 2 * SUM(in0 * in1)) * 1000000
            // (SUM(in0) + SUM(in1) - SUM(in0 * in1)) AS BIGINT)
         AS drift_ppm
FROM per_sig GROUP BY host_id
"""


# ----------------------------------------------- change-rate recrawl order
REVISIT_K = 100


def url_revisit_priority(sf_dir: str, k: int = REVISIT_K) -> ray.data.Dataset:
    """Change-rate-ordered recrawl schedule (Cho & Garcia-Molina's
    frequency-based revisit policy): pages that changed most across the
    seeded 4-epoch crawl history (the `scd2_url_history` seeding) get the
    highest priority; ``revisit_every = epochs // (n_changes + 1)`` is the
    integer expected-epochs-between-changes estimate a scheduler feeds its
    frontier with.

    Scale shape: `with_text=False` — the scan reads ZERO text bytes
    (change counts derive from the fingerprint-bump arithmetic, exactly
    as the SCD2 emitter does); global top-k via `agg.exact_topk`
    (per-block lexsort + coalesced k×blocks finish, no Sort all-to-all);
    page_key is the numeric total-order tie-break."""
    from ..stages.agg import exact_topk

    ds = pages_dataset(sf_dir, keep_key=True, with_text=False)

    def score(b: pa.Table) -> pa.Table:
        key = b["page_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = np.zeros(len(key), np.int64)
        for e in range(1, SCD_EPOCHS):
            nc += (key + e * e) % 3 == 0
        return pa.table({"page_key": b["page_key"], "url": b["url"],
                         "n_changes": pa.array(nc),
                         "revisit_every": pa.array(
                             SCD_EPOCHS // (nc + 1))})

    scored = ds.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
    return exact_topk(scored, ["n_changes", "page_key"], [True, False], k)


def url_revisit_priority_sql(k: int = REVISIT_K) -> str:
    terms = " + ".join(
        f"(CASE WHEN (page_key + {e * e}) % 3 = 0 THEN 1 ELSE 0 END)"
        for e in range(1, SCD_EPOCHS))
    return f""",
ch AS (
  SELECT page_key, url, CAST({terms} AS BIGINT) AS n_changes
  FROM pages
)
SELECT page_key, url, n_changes,
       CAST({SCD_EPOCHS} // (n_changes + 1) AS BIGINT) AS revisit_every
FROM ch ORDER BY n_changes DESC, page_key ASC LIMIT {k}"""
