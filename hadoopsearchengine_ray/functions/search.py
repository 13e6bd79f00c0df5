"""Driver-facing full-text search over an arbitrary (doc_id, text) table.

Builds (or reuses via the manifest) an on-disk index under /tmp for the
given table, then serves BM25 top-k through the scorer — the glue between
the generic documents table and the index/query pipelines.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..pipelines.build_index import build_index
from ..pipelines.query import BM25Scorer

CACHE_ROOT = "/tmp/hse_index_cache"


def index_for(parquet_path: str, text_col: str = "text",
              id_col: str = "doc_id") -> str:
    """Build-or-reuse an index for a documents parquet; returns index dir.

    The manifest's lineage fingerprint makes this a no-op when the input
    is unchanged (resume path exercised on every driver run)."""
    key = hashlib.sha256(parquet_path.encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, key)
    build_index(
        parquet_path, index_dir,
        id_mode="column", id_col=id_col, text_col=text_col,
        hot_df_frac=0.25,
    )
    return index_dir


def store_for(parquet_path: str) -> str:
    """Build-or-reuse a range-partitioned DocStore for a documents
    parquet; returns the store dir.  The ``_DONE`` sentinel carries the
    input's lineage fingerprint (path, size, mtime_ns — the same
    invalidation ``index_for``'s manifest uses), so an in-place rewrite
    of the parquet rebuilds the store instead of serving stale docs."""
    import shutil

    import ray.data as rd

    from ..pipelines.docstore import write_docstore
    from ..state.manifest import lineage_fingerprint

    key = hashlib.sha256(("store:" + parquet_path).encode()).hexdigest()[:16]
    store_dir = os.path.join(CACHE_ROOT, key)
    done = os.path.join(store_dir, "_DONE")
    fp = lineage_fingerprint([parquet_path])
    have = None
    if os.path.exists(done):
        with open(done) as f:
            have = f.read()
    if have != fp:
        shutil.rmtree(store_dir, ignore_errors=True)
        write_docstore(rd.read_parquet(parquet_path), store_dir)
        with open(done, "w") as f:
            f.write(fp)
    return store_dir


def trigram_for(parquet_path: str, text_col: str = "text",
                id_col: str = "doc_id", casefold: bool = False) -> str:
    """Build-or-reuse a trigram grep index for a documents parquet;
    same lineage-fingerprint invalidation as ``store_for``.  Casefolded
    and case-sensitive indexes cache under distinct keys."""
    import shutil

    from ..pipelines.grep import build_trigram_index
    from ..state.manifest import lineage_fingerprint

    # key carries EVERY build parameter (an index built over one
    # column pair must never be served for another) plus a format
    # version (v2 = utf8_lower casefold; bumping evicts stale caches).
    # json framing, not ':' joins — column names containing the
    # separator must not collide (['a:b','c'] vs ['a','b:c'])
    import json as _json

    tag = _json.dumps(["tri", "v2", text_col, id_col, bool(casefold),
                       parquet_path])
    key = hashlib.sha256(tag.encode()).hexdigest()[:16]
    idx_dir = os.path.join(CACHE_ROOT, key)
    done = os.path.join(idx_dir, "_DONE")
    fp = lineage_fingerprint([parquet_path])
    have = None
    if os.path.exists(done):
        with open(done) as f:
            have = f.read()
    if have != fp:
        shutil.rmtree(idx_dir, ignore_errors=True)
        build_trigram_index(parquet_path, idx_dir,
                            text_col=text_col, id_col=id_col,
                            casefold=casefold)
        with open(done, "w") as f:
            f.write(fp)
    return idx_dir


def search_snippets_table(parquet_path: str, terms: list[str],
                          k: int = 10,
                          text_col: str = "text") -> pd.DataFrame:
    """The full serving path as one call — BM25 top-k, DocStore fetch,
    query-biased excerpts (``search_with_snippets``) — projected to the
    driver-checkable columns: (rank, doc_id, snippet_nonempty).  The
    oracle asserts the ranking AND that every served row rendered a
    snippet (a matched doc always contains a query term, so an empty
    snippet would mean the fetch/render join dropped the record)."""
    from ..pipelines.docstore import search_with_snippets

    out = search_with_snippets(
        index_for(parquet_path, text_col=text_col),
        store_for(parquet_path), terms, k=k, text_col=text_col)
    df = out.to_pandas()
    if "snippet" not in df.columns:
        return pd.DataFrame({
            "rank": pd.array([], dtype="int64"),
            "doc_id": pd.array([], dtype="int64"),
            "snippet_nonempty": pd.array([], dtype="bool"),
        })
    return pd.DataFrame({
        "rank": df["rank"].astype("int64"),
        "doc_id": df["doc_id"].astype("int64"),
        "snippet_nonempty": (df["snippet"].str.len() > 0).astype("bool"),
    })


def bm25_topk_table(parquet_path: str, terms: list[str], k: int = 10,
                    text_col: str = "text") -> pd.DataFrame:
    """(rank, doc_id) int64 — rank-identical contract with the SQL oracle."""
    index_dir = index_for(parquet_path, text_col=text_col)
    scorer = BM25Scorer(index_dir)
    d, _ = scorer.score(terms, k)
    return pd.DataFrame({
        "rank": pd.array(range(1, len(d) + 1), dtype="int64"),
        "doc_id": pd.array([int(x) for x in d], dtype="int64"),
    })


def lm_dirichlet_topk(parquet_path: str, terms: list[str], k: int = 10,
                      mu: float = 2000.0,
                      text_col: str = "text") -> pd.DataFrame:
    """(rank, doc_id) under query-likelihood LM ranking with Dirichlet
    smoothing (Zhai & Lafferty 2001 — public) — the alternative ranking
    family over the SAME index BM25 serves from: collection stats (cf,
    total tokens) come from the dictionary's cf column, per-doc tf/dl
    from the postings, nothing re-tokenizes the corpus.  Rank contract
    (-score, doc_id), mirrored by the SQL oracle."""
    index_dir = index_for(parquet_path, text_col=text_col)
    d, _ = BM25Scorer(index_dir).score_lm(terms, k, mu=mu)
    return pd.DataFrame({
        "rank": pd.array(range(1, len(d) + 1), dtype="int64"),
        "doc_id": pd.array([int(x) for x in d], dtype="int64"),
    })


def ltr_features(parquet_path: str, terms: list[str],
                 text_col: str = "text") -> pd.DataFrame:
    """Learning-to-rank feature extraction: one row per doc matching
    >=1 query term, with the integer ranking features a downstream
    model trains on — ``dl`` (doc length in valid tokens),
    ``n_matched`` (distinct query terms present), ``tf_sum`` /
    ``tf_max`` (total / max query-term occurrences) and ``min_pos``
    (1-based earliest occurrence of any query term — the "hit near the
    title" signal).  Everything is read from the index (postings +
    in-index positions), never by re-tokenizing documents — the
    reference assembles the same per-hit features (tf, position,
    title-region flag) inside its ranker at serve time
    (/root/reference/DyableRequest/CompileRankedList/CompileRankedList.h,
    hit-type routing CompileHitList.h:142-177); here they are exported
    as a training table.  All-integer columns keep the driver's
    value-hash comparison exact.  Scale path: per-term decoded postings
    are vocabulary-bounded (|terms| lists), the combine is one
    np.unique + ufunc reductions — no corpus scan, no shuffle."""
    from ..pipelines.query import IndexReader

    index_dir = index_for(parquet_path, text_col=text_col)
    r = IndexReader(index_dir)
    docs_l, tf_l, fp_l = [], [], []
    for t in sorted(set(terms)):
        if not r.lookup(t):
            continue
        d, f, flat, offs = r.decoded_positions(t)
        if len(d) == 0:
            continue
        docs_l.append(d.astype(np.int64))
        tf_l.append(f.astype(np.int64))
        # positions are ascending per doc: the slice head is the first
        fp_l.append(np.asarray(flat, dtype=np.int64)[
            np.asarray(offs[:-1], dtype=np.int64)])
    cols = ("doc_id", "dl", "n_matched", "tf_sum", "tf_max", "min_pos")
    if not docs_l:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tf_l)
    fps = np.concatenate(fp_l)
    uniq, inv, n_matched = np.unique(docs, return_inverse=True,
                                     return_counts=True)
    tf_sum = np.zeros(len(uniq), np.int64)
    np.add.at(tf_sum, inv, tfs)
    tf_max = np.zeros(len(uniq), np.int64)
    np.maximum.at(tf_max, inv, tfs)
    min_pos = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(min_pos, inv, fps)
    return pd.DataFrame({
        "doc_id": pd.array(uniq, dtype="int64"),
        "dl": pd.array(r.dl[uniq].astype(np.int64), dtype="int64"),
        "n_matched": pd.array(n_matched.astype(np.int64), dtype="int64"),
        "tf_sum": pd.array(tf_sum, dtype="int64"),
        "tf_max": pd.array(tf_max, dtype="int64"),
        "min_pos": pd.array(min_pos + 1, dtype="int64"),  # 1-based
    })


def autocomplete(parquet_path: str, prefix: str, n: int = 10,
                 text_col: str = "text") -> pd.DataFrame:
    """Top-``n`` query completions for ``prefix``, ranked by collection
    frequency (cf DESC, term ASC) — served from the on-disk index
    dictionary via a PRUNED Ray Data read: the term range filter pushes
    down to parquet row groups, so only the dictionary slice covering
    the prefix leaves storage (never the postings, never the corpus).
    Reference analog: the spell/expansion dictionary walk of
    DyableRequest (SURVEY M10) restricted to a prefix range.
    Returns (rank, term, cf)."""
    import re

    import ray.data as rd

    if not re.fullmatch(r"[a-z0-9]+", prefix or ""):
        raise ValueError(
            f"prefix must be non-empty lowercase [a-z0-9] (the tokenizer "
            f"alphabet); got {prefix!r}")
    index_dir = index_for(parquet_path, text_col=text_col)
    hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
    top = (rd.read_parquet(os.path.join(index_dir, "dictionary"),
                           columns=["term", "cf"])
           .filter(expr=f"term >= '{prefix}' and term < '{hi}'")
           .sort(["cf", "term"], descending=[True, False])
           .limit(n)
           .to_pandas())
    if top.empty:   # schema-less empty: restore the typed frame
        top = pd.DataFrame({"term": pd.Series([], dtype="string"),
                            "cf": pd.Series([], dtype="int64")})
    top.insert(0, "rank", pd.array(range(1, len(top) + 1), dtype="int64"))
    top["cf"] = top["cf"].astype("int64")
    return top


def facet_counts(parquet_path: str, terms: list[str],
                 facet_col: str = "lang",
                 text_col: str = "text") -> pd.DataFrame:
    """Faceted search counts: number of distinct docs matching ANY of
    ``terms`` (disjunctive), grouped by a metadata facet.

    Shape: the matching doc-id set comes from the INDEX (decode only
    the query terms' postings — work ~ sum of their df, not corpus
    size), is broadcast once (``ray.put``), and the metadata table is
    scanned with a pruned (doc_id, facet) read + vectorized ``np.isin``
    membership per batch — the broadcast-join pattern for a small
    match set.  A stopword-scale term would make the broadcast large;
    that regime belongs to the posting-side groupby ops (A1/A2), not a
    facet panel.  Returns (facet value, n_docs) sorted by facet."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..pipelines.query import IndexReader

    index_dir = index_for(parquet_path, text_col=text_col)
    rdr = IndexReader(index_dir)
    ids = [rdr.decoded_postings(t)[0].astype(np.int64) for t in terms]
    match = np.unique(np.concatenate(ids)) if ids else np.empty(0, np.int64)
    m_ref = ray.put(match)

    def _partial(batch: pa.Table) -> pa.Table:
        mm = ray.get(m_ref)
        keep = np.isin(
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            mm, assume_unique=False)
        sub = batch.filter(pa.array(keep))
        col = (sub[facet_col].combine_chunks()
               if isinstance(sub[facet_col], pa.ChunkedArray)
               else sub[facet_col])
        # SQL GROUP BY keeps a NULL group — count nulls separately
        # (null dictionary indices would poison the bincount)
        n_null = int(pc.sum(pc.is_null(col)).as_py() or 0)
        d = col.drop_null().dictionary_encode()
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False).astype(np.int64),
            minlength=len(d.dictionary))
        vals = d.dictionary.cast(pa.string()).to_pylist()
        counts = cnt.astype(np.int64).tolist()
        if n_null:
            vals.append(None)
            counts.append(n_null)
        return pa.table({
            facet_col: pa.array(vals, pa.string()),
            "n_docs": pa.array(counts, pa.int64()),
        })

    # the partials table is tiny (facets x blocks) — a pandas combine
    # keeps NULL-group semantics identical to SQL without relying on
    # the shuffle's null-key behavior
    parts = (rd.read_parquet(parquet_path, columns=["doc_id", facet_col])
             .map_batches(_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
             .to_pandas())
    out = (parts.groupby(facet_col, dropna=False)["n_docs"].sum()
           .reset_index().sort_values(facet_col, na_position="last")
           .reset_index(drop=True))
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


def facet_topk(parquet_path: str, terms: list[str], facet_col: str = "lang",
               k: int = 3, text_col: str = "text",
               driver_merge_threshold: int = 200_000,
               num_ranges: int | None = None,
               pool=None) -> pd.DataFrame:
    """Grouped retrieval: the BM25 top-``k`` docs PER FACET VALUE for a
    disjunctive term query (the 'best hits in every category' panel).

    Shape: SIZE-DISPATCHED on the matched-set UPPER BOUND (sum of the
    query terms' dictionary dfs — known before any scoring, so the
    dispatch itself costs nothing).  At or below
    ``driver_merge_threshold`` the small path runs: one driver-side
    exact score + a pruned (doc_id, facet) scan attach + one vectorized
    sort/groupby-head.  Above it — a stopword-scale term — scoring
    itself is DISTRIBUTED (round-5, closing the r4 driver-side
    ``score_exact(terms, 1 << 62)`` mark): the doc-range-partitioned
    pool's owners each score THEIR slice with the range-local dense
    pass (bit-identical per-doc scores: global df/avgdl, same
    accumulation order), attach the facet column via a
    doc-id-range-pruned parquet read, and emit only their per-facet
    top-k heads — the driver merges facets × k × ranges rows and never
    holds a matched (doc_id, score) array.  Both paths are
    oracle-identical (same final sort, asserted by the facet_topk /
    facet_topk_hot driver queries).  Returns (facet, rank, doc_id) with
    rank per facet by (score DESC, doc_id) — the bm25_topk tie-break.

    ``pool``: an already-warm ``RangePartitionedPool`` over the same
    index (e.g. a serving daemon's) — used for the big path instead of
    constructing and killing a fleet per call; the caller keeps
    ownership.  ``num_ranges`` sizes a per-call pool when none is
    passed (default: CPU-derived)."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    index_dir = index_for(parquet_path, text_col=text_col)
    # dispatch bound = sum of the query terms' dictionary dfs — a
    # term-pruned read of just the df column, NOT a full IndexReader
    # (whose __init__ materializes the O(num_docs) doclen array and the
    # whole dictionary on the driver, exactly what the big path exists
    # to avoid)
    d_tbl = pads.dataset(os.path.join(index_dir, "dictionary")).to_table(
        columns=["df"],
        filter=pads.field("term").isin(sorted(set(terms))))
    df_bound = int(pc.sum(d_tbl["df"]).as_py() or 0)
    small = df_bound <= driver_merge_threshold

    if small:
        scorer = BM25Scorer(index_dir)
        docs, scores = scorer.score_exact(terms, 1 << 62)  # all matched
        order = np.argsort(docs)
        docs_s = np.asarray(docs, np.int64)[order]
        scores_s = np.asarray(scores, np.float64)[order]
        m_ref = ray.put((docs_s, scores_s))

        def _attach(batch: pa.Table):
            dd, ss = ray.get(m_ref)
            ids = batch["doc_id"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            if len(dd):
                pos = np.searchsorted(dd, ids)
                pos[pos == len(dd)] = 0
                hit = dd[pos] == ids
            else:
                hit = np.zeros(len(ids), bool)
            sub = batch.filter(pa.array(hit)).to_pandas()
            sub["score"] = ss[np.searchsorted(dd, ids[hit])] \
                if hit.any() else np.empty(0, np.float64)
            return sub

        j = (rd.read_parquet(parquet_path, columns=["doc_id", facet_col])
             .map_batches(_attach, batch_format="pyarrow",
                          zero_copy_batch=True)
             .to_pandas())
    elif pool is not None:
        # caller-owned warm pool (a serving daemon): no per-call fleet
        j = pool.facet_heads(terms, k, facet_col, parquet_path)
    else:
        from ..pipelines.pool import RangePartitionedPool

        if num_ranges is None:
            ncpu = int(ray.cluster_resources().get("CPU", 8)) \
                if ray.is_initialized() else 8
            num_ranges = max(2, min(8, ncpu // 4))
        pool = RangePartitionedPool(index_dir, num_ranges=num_ranges)
        try:
            j = pool.facet_heads(terms, k, facet_col, parquet_path)
        finally:
            pool.shutdown()
    j = j.sort_values([facet_col, "score", "doc_id"],
                      ascending=[True, False, True])
    head = (j.groupby(facet_col, sort=False, dropna=False).head(k)
            .reset_index(drop=True))
    head["rank"] = head.groupby(facet_col, dropna=False).cumcount() + 1
    out = head[[facet_col, "rank", "doc_id"]].copy()
    out["rank"] = out["rank"].astype("int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out


_SPELL_CACHE: dict[str, tuple[str, object]] = {}


def _spell_for(index_dir: str):
    """Build-or-reuse the SymSpell deletion index for ``index_dir``,
    keyed by the dictionary's lineage (size+mtime of its files) so a
    rebuilt index evicts the cached structure.  The deletion index is
    vocabulary-bounded driver state — the same regime as the scorer's
    dictionary broadcast; a >2M-term corpus would shard it per term
    range (documented trade-off, stages/dictionary.py)."""
    from ..state.manifest import lineage_fingerprint
    from .spellcheck import SpellIndex

    fp = lineage_fingerprint([os.path.join(index_dir, "dictionary")])
    hit = _SPELL_CACHE.get(index_dir)
    if hit is not None and hit[0] == fp:
        return hit[1]
    sp = SpellIndex.from_index_dir(index_dir)
    _SPELL_CACHE[index_dir] = (fp, sp)
    return sp


def fuzzy_topk(parquet_path: str, terms: list[str], k: int = 10,
               text_col: str = "text") -> pd.DataFrame:
    """Fuzzy retrieval: each query term expands to EVERY dictionary
    term within Levenshtein distance 1 (Lucene FuzzyQuery rewrite
    shape, the serving-time form of the reference's CSpellCheck
    permutation lookup — /root/reference/FileStorage.h:798-1150);
    the union scores as a disjunctive BM25, each expanded term with
    its own idf.  Expansion is exact (SymSpell 1-deletion candidate
    guarantee + plain-Levenshtein filter, the same metric as DuckDB's
    ``levenshtein()``), so the SQL oracle reproduces the expansion set
    verbatim.  Returns (rank, doc_id)."""
    index_dir = index_for(parquet_path, text_col=text_col)
    spell = _spell_for(index_dir)
    expanded: set[str] = set()
    for t in sorted(set(terms)):
        expanded.update(spell.within_distance(t, 1))
    empty = pd.DataFrame({"rank": pd.array([], dtype="int64"),
                          "doc_id": pd.array([], dtype="int64")})
    if not expanded:
        return empty
    d, _ = BM25Scorer(index_dir).score_exact(sorted(expanded), k)
    return pd.DataFrame({
        "rank": pd.array(range(1, len(d) + 1), dtype="int64"),
        "doc_id": pd.array([int(x) for x in d], dtype="int64"),
    })


def feedback_topk(parquet_path: str, terms: list[str], k: int = 10,
                  fb_docs: int = 5, fb_terms: int = 3,
                  fb_weight: float = 0.5,
                  text_col: str = "text") -> pd.DataFrame:
    """Pseudo-relevance feedback (Rocchio-style expansion, Rocchio
    1971 — public): the original query's BM25 top-``fb_docs`` form the
    feedback set; their pooled tf x idf term weights pick the
    ``fb_terms`` strongest terms not already in the query (ties by
    term asc); the query rescans with originals at 1.0 and feedback
    terms at ``fb_weight`` via the ``score_expanded`` weighted pass.
    The reference's nearest analog is its keyword-set association
    serving (SURVEY M9/A10); this adds the query-time feedback loop.

    Shape: pass 1 is a normal in-memory scorer call; the feedback docs
    fetch via ONE doc_id-pruned row-group read (``fb_docs`` rows);
    term stats come from the in-memory dictionary; pass 2 is one
    weighted dense scan.  Returns (rank, doc_id)."""
    import pyarrow.dataset as pads

    from ..pipelines.query import BM25Scorer, IndexReader
    from ..tokenizer import tokenize_py

    index_dir = index_for(parquet_path, text_col=text_col)
    rdr = IndexReader(index_dir)
    scorer = BM25Scorer(index_dir, reader=rdr)
    qterms = sorted(set(terms))
    empty = pd.DataFrame({"rank": pd.array([], dtype="int64"),
                          "doc_id": pd.array([], dtype="int64")})
    d1, _ = scorer.score_exact(qterms, fb_docs)
    if len(d1) == 0:
        return empty
    fb = pads.dataset(parquet_path).to_table(
        columns=["doc_id", text_col],
        filter=pads.field("doc_id").isin([int(x) for x in d1]))
    toks = [tok for txt in fb[text_col].to_pylist()
            for tok in tokenize_py(txt or "")]
    exp: list[str] = []
    if toks:
        uniq, tfs = np.unique(np.asarray(toks, dtype=object),
                              return_counts=True)
        w = np.empty(len(uniq), np.float64)
        for i, t in enumerate(uniq):
            ent = rdr.lookup(str(t))
            # same op order as the SQL oracle: sum(tf) * ln(idf)
            w[i] = tfs[i] * rdr.idf(ent[1]) if ent else 0.0
        qset = set(qterms)
        order = sorted(range(len(uniq)), key=lambda i: (-w[i], uniq[i]))
        exp = [str(uniq[i]) for i in order
               if str(uniq[i]) not in qset and w[i] > 0.0][:fb_terms]
    assoc = {qterms[0]: exp} if exp else {}
    d, _ = scorer.score_expanded(qterms, k, assoc, discount=fb_weight,
                                 per_term=len(exp))
    return pd.DataFrame({
        "rank": pd.array(range(1, len(d) + 1), dtype="int64"),
        "doc_id": pd.array([int(x) for x in d], dtype="int64"),
    })


def more_like_this(parquet_path: str, doc_id: int, m: int = 5,
                   k: int = 10, text_col: str = "text") -> pd.DataFrame:
    """Related-document retrieval: extract the source doc's top-``m``
    terms by tf x BM25-idf (ties by term), then run them as a
    disjunctive BM25 query.  The reference derives per-doc keyword sets
    and serves association lookups from them (SURVEY M9/A10,
    /root/reference/DyableKeywordSet); this is that feature as one
    query.  The source doc itself typically ranks first — kept, so the
    contract stays pure BM25.

    Shape: ONE pruned row-group read fetches the source doc (filter
    pushdown on doc_id), term stats come from the in-memory dictionary,
    and the query runs through the normal scorer — no corpus scan
    beyond the m query terms' postings.  Returns (rank, doc_id)."""
    import ray.data as rd

    from ..tokenizer import tokenize_py
    from ..pipelines.query import IndexReader

    index_dir = index_for(parquet_path, text_col=text_col)
    src = (rd.read_parquet(parquet_path, columns=["doc_id", text_col])
           .filter(expr=f"doc_id == {int(doc_id)}")
           .to_pandas())
    if src.empty:
        raise KeyError(f"doc_id {doc_id} not found in {parquet_path}")
    toks = tokenize_py(src[text_col].iloc[0])
    terms, tfs = np.unique(np.asarray(toks, dtype=object),
                           return_counts=True)
    rdr = IndexReader(index_dir)
    w = np.empty(len(terms), np.float64)
    for i, t in enumerate(terms):
        ent = rdr.lookup(str(t))
        w[i] = tfs[i] * rdr.idf(ent[1]) if ent else 0.0
    order = sorted(range(len(terms)), key=lambda i: (-w[i], terms[i]))[:m]
    qterms = [str(terms[i]) for i in order]
    scorer = BM25Scorer(index_dir, reader=rdr)
    d, _ = scorer.score(qterms, k)
    return pd.DataFrame({
        "rank": pd.array(range(1, len(d) + 1), dtype="int64"),
        "doc_id": pd.array([int(x) for x in d], dtype="int64"),
    })
