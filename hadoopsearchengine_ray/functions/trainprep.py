"""Training-data preparation operators over a (doc_id, text) table.

Beyond the reference's own operator set: the ops a large-scale
LLM-training-data pipeline runs between raw corpus and tokenized
training shards.  Same conventions as ``functions/text.py`` — pure
``map_batches`` over Arrow batches wherever a doc is self-contained,
int64/rounded-float columns so every output hash-matches its DuckDB
oracle, shuffles only where semantics force one (the contamination
semi-join), and O(blocks) driver state (the packing prefix sum).

Operators:
  * ``repetition_stats``  — Gopher-style repetition filter signals
    (duplicate-line fraction, top unigram/bigram fraction) + keep flag.
  * ``unigram_logprob``   — corpus-unigram-LM mean log-prob per doc, the
    deterministic stand-in for CCNet-style LM perplexity filtering.
  * ``bigram_logprob``    — adjacent-pair conditional-LM mean log-prob,
    the order-sensitive fluency signal the unigram bag can't see.
  * ``pii_redact``        — email/IPv4 scrubbing with per-doc counts
    (C4-style PII removal), regex parity with the SQL oracle.
  * ``contamination_table`` — train/test n-gram overlap (benchmark
    contamination check): distinct test-doc shingles semi-joined
    against the distinct train-side shingle set.
  * ``pack_sequences``    — concat-and-chunk packing: global token
    offsets by doc_id order via a metadata-only prefix sum (the
    ``zip_with_index`` pattern), emitting each doc's training-sequence
    span.
  * ``prepare_corpus``    — the composed prep: C4-style gate + exact
    dedup keep-first + packing of the survivors, one call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..tokenizer import tokenize_column
from .text import _docs

# ---------------------------------------------------------------------------
# shared per-doc kernels


def _doc_index(offsets: np.ndarray) -> np.ndarray:
    """Flat-item -> doc ordinal for a list array's int offsets."""
    return np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                     np.diff(offsets))


def _top_and_total(doc_idx: np.ndarray, codes: np.ndarray,
                   n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (count of the most frequent code, total items).

    One ``np.unique`` over packed (doc, code) keys + ``maximum.reduceat``
    — no Python loop, no per-doc groupby."""
    top = np.zeros(n_docs, np.int64)
    total = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    if len(doc_idx) == 0:
        return top, total
    v = int(codes.max()) + 1
    uniq, cnt = np.unique(doc_idx * v + codes, return_counts=True)
    ud = uniq // v
    starts = np.flatnonzero(np.concatenate([[True], ud[1:] != ud[:-1]]))
    top[ud[starts]] = np.maximum.reduceat(cnt, starts)
    return top, total


def _ngram_join(flat: pa.Array, doc_idx: np.ndarray,
                n: int) -> tuple[pa.Array, np.ndarray]:
    """Space-joined n-grams over a flat token array that respects doc
    boundaries.  Returns (ngram strings, doc ordinal per ngram)."""
    nflat = len(flat)
    if nflat < n:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    valid = doc_idx[: nflat - n + 1] == doc_idx[n - 1:]
    mask = pa.array(valid)
    parts = [pc.array_filter(flat.slice(k, nflat - n + 1), mask)
             for k in range(n)]
    joined = pc.binary_join_element_wise(*parts, " ")
    return joined, doc_idx[: nflat - n + 1][valid]


# ---------------------------------------------------------------------------
# 1. Gopher-style repetition stats


def repetition_stats(docs, text_col: str = "text") -> rd.Dataset:
    """(doc_id, n_lines, dup_lines, top_unigram_cnt, n_tokens,
    top_bigram_cnt, n_bigrams, keep) — the repetition signals of the
    Gopher quality rules (duplicate-line fraction and most-common-n-gram
    fraction), all int64 so the oracle hash is exact.

    ``keep`` = 1 iff duplicate-line fraction <= 0.3 AND top-bigram
    fraction <= 0.2 (integer cross-multiplied — no float thresholds).
    Pure map over documents: every signal is intra-doc, so there is no
    shuffle at any corpus size."""
    docs = _docs(docs, text_col)

    def _stats(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        texts = batch[text_col].combine_chunks() if isinstance(
            batch[text_col], pa.ChunkedArray) else batch[text_col]

        # --- line stats: split on newline, drop empty lines
        lines = pc.split_pattern(texts, "\n")
        loffs = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lflat = lines.values
        ldoc = _doc_index(loffs)
        nonempty = pc.not_equal(lflat, "").to_numpy(zero_copy_only=False)
        ldoc_ne = ldoc[nonempty]
        n_lines = np.bincount(ldoc_ne, minlength=n_docs).astype(np.int64)
        dup_lines = np.zeros(n_docs, np.int64)
        if len(ldoc_ne):
            lcodes = lflat.dictionary_encode().indices.to_numpy(
                zero_copy_only=False).astype(np.int64)[nonempty]
            v = int(lcodes.max()) + 1
            distinct = np.bincount(
                (np.unique(ldoc_ne * v + lcodes) // v),
                minlength=n_docs).astype(np.int64)
            dup_lines = n_lines - distinct

        # --- token stats
        toks = tokenize_column(texts)
        toffs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        tdoc = _doc_index(toffs)
        flat = toks.values
        if len(flat):
            codes = flat.dictionary_encode().indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            codes = np.zeros(0, np.int64)
        top_uni, n_tokens = _top_and_total(tdoc, codes, n_docs)

        # --- bigram stats (doc-boundary-safe adjacent join)
        big, bdoc = _ngram_join(flat, tdoc, 2)
        if len(big):
            bcodes = big.dictionary_encode().indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            bcodes = np.zeros(0, np.int64)
        top_big, n_bigrams = _top_and_total(bdoc, bcodes, n_docs)

        keep = ((10 * dup_lines <= 3 * n_lines)
                & ((5 * top_big <= n_bigrams) | (n_bigrams == 0)))
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_lines": pa.array(n_lines),
            "dup_lines": pa.array(dup_lines),
            "top_unigram_cnt": pa.array(top_uni),
            "n_tokens": pa.array(n_tokens),
            "top_bigram_cnt": pa.array(top_big),
            "n_bigrams": pa.array(n_bigrams),
            "keep": pa.array(keep.astype(np.int64)),
        })

    return docs.map_batches(_stats, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# 2. corpus-unigram-LM log-prob scoring


def unigram_logprob(docs, text_col: str = "text",
                    broadcast_limit: int = 2_000_000) -> rd.Dataset:
    """(doc_id, n_tokens, logprob) where ``logprob`` is the mean
    corpus-unigram log-probability of the doc's tokens, rounded to 6
    decimals (0.0 for token-less docs) — the deterministic analog of
    CCNet/Wikipedia-LM perplexity quality filtering.

    Scale shape mirrors ``tfidf_table``: one vocabulary-cardinality
    aggregate for (term -> cf), broadcast back as a ``ray.put`` lookup
    into a single per-doc map (no shuffle of token rows); above
    ``broadcast_limit`` distinct terms the log-probs attach via the
    co-partitioned ``hash_join`` and a doc-keyed aggregate instead."""
    import pandas as pd

    from .text import dictionary_from_token_rows, token_table

    docs = _docs(docs, text_col)
    tok = token_table(docs, text_col)
    dict_ds = dictionary_from_token_rows(tok)

    vocab_n = dict_ds.count()
    if vocab_n > broadcast_limit:
        from ray.data.aggregate import Sum

        from ..pipelines.relational import hash_join

        total = float(dict_ds.sum("cf"))

        def _lp_col(batch: pa.Table) -> pa.Table:
            cf = batch["cf"].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({"term": batch["term"],
                             "lp": pa.array(np.log(cf / total), pa.float64())})

        joined = hash_join(
            tok, dict_ds.map_batches(_lp_col, batch_format="pyarrow",
                                     batch_size=None), on="term")

        def _w(batch: pa.Table) -> pa.Table:
            tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "ntok": batch["tf"].cast(pa.int64()),
                "wsum": pa.array(tf * batch["lp"].to_numpy(
                    zero_copy_only=False), pa.float64()),
            })

        agg = (joined.map_batches(_w, batch_format="pyarrow", batch_size=None)
               .groupby("doc_id")
               .aggregate(Sum("ntok", alias_name="n_tokens"),
                          Sum("wsum", alias_name="wsum")))

        ids = docs.map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"].cast(pa.int64())}),
            batch_format="pyarrow", batch_size=None)
        out = hash_join(ids, agg, on="doc_id", how="left")

        def _fin(batch: pa.Table) -> pa.Table:
            n = batch["n_tokens"].to_numpy(zero_copy_only=False)
            n = np.nan_to_num(np.asarray(n, np.float64), nan=0.0)
            w = np.nan_to_num(batch["wsum"].to_numpy(zero_copy_only=False),
                              nan=0.0)
            lp = np.where(n > 0, np.round(w / np.maximum(n, 1), 6), 0.0)
            return pa.table({
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(n.astype(np.int64)),
                "logprob": pa.array(lp, pa.float64()),
            })

        return out.map_batches(_fin, batch_format="pyarrow", batch_size=None)

    dpdf = dict_ds.to_pandas()
    total = float(dpdf["cf"].sum())
    lut = pd.Series(np.log(dpdf["cf"].to_numpy(np.float64) / total),
                    index=dpdf["term"])
    lut_ref = ray.put(lut)

    def _score(batch: pa.Table) -> pa.Table:
        lp_by_term = ray.get(lut_ref)
        n_docs = batch.num_rows
        texts = batch[text_col].combine_chunks() if isinstance(
            batch[text_col], pa.ChunkedArray) else batch[text_col]
        toks = tokenize_column(texts)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = _doc_index(offs)
        lp = toks.values.to_pandas().map(lp_by_term).to_numpy(np.float64)
        sums = np.bincount(doc_idx, weights=lp, minlength=n_docs)
        n = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        out = np.where(n > 0, np.round(sums / np.maximum(n, 1), 6), 0.0)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_tokens": pa.array(n),
            "logprob": pa.array(out, pa.float64()),
        })

    return docs.map_batches(_score, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# 3. PII redaction

# ASCII-only classes ([0-9], not \d) so Python re and the oracle's RE2
# agree byte-for-byte; both engines match leftmost non-overlapping.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_redact(docs, text_col: str = "text") -> rd.Dataset:
    """(doc_id, n_emails, n_ips, text) with emails then IPv4 literals
    replaced by ``<EMAIL>`` / ``<IP>`` (C4-style scrubbing).  Counts are
    taken at each replacement step, matching the oracle's
    ``regexp_extract_all`` lengths; pure map, no shuffle."""
    docs = _docs(docs, text_col)

    def _redact(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype(str)
        n_emails = s.str.count(EMAIL_RE).to_numpy(np.int64)
        s = s.str.replace(EMAIL_RE, "<EMAIL>", regex=True)
        n_ips = s.str.count(IPV4_RE).to_numpy(np.int64)
        s = s.str.replace(IPV4_RE, "<IP>", regex=True)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_emails": pa.array(n_emails),
            "n_ips": pa.array(n_ips),
            "text": pa.array(s, pa.string()),
        })

    return docs.map_batches(_redact, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# 4. train/test n-gram contamination


def _distinct_shingles(docs: rd.Dataset, text_col: str, n: int,
                       side: int, num_buckets: int) -> rd.Dataset:
    """(bucket, side, doc_id, sh): each doc's DISTINCT space-joined
    n-grams, tagged with the split side and a shingle-hash bucket.
    Distinctness is resolved inside the batch (docs are whole per row),
    so the output is ~|unique shingles| rows with no shuffle."""

    def _sh(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks() if isinstance(
            batch[text_col], pa.ChunkedArray) else batch[text_col]
        toks = tokenize_column(texts)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        joined, sdoc = _ngram_join(toks.values, _doc_index(offs), n)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(joined) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "side": pa.array([], pa.int8()),
                             "doc_id": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.string())})
        d = joined.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(d.dictionary)
        uniq = np.unique(sdoc * v + codes)
        sh = d.dictionary.take(pa.array(uniq % v)).cast(pa.string())
        import pandas as pd
        bucket = (pd.util.hash_pandas_object(sh.to_pandas(), index=False)
                  .to_numpy() % num_buckets).astype(np.int64)
        m = len(uniq)
        return pa.table({
            "bucket": pa.array(bucket),
            "side": pa.array(np.full(m, side, np.int8)),
            "doc_id": pa.array(ids[uniq // v]),
            "sh": sh,
        })

    return docs.map_batches(_sh, batch_format="pyarrow", zero_copy_batch=True)


def contamination_table(docs, test_source: str, text_col: str = "text",
                        n: int = 5, num_buckets: int = 16) -> rd.Dataset:
    """Benchmark-contamination check: for every doc from ``test_source``,
    how many of its distinct ``n``-gram shingles appear anywhere in the
    rest of the corpus (the training split).

    Returns (doc_id, n_shingles, n_overlap, contaminated) — int64 —
    with ``contaminated`` = 1 iff overlap fraction >= 0.8 (integer
    cross-multiply).

    Scale shape: per-doc shingle totals are MAP-side (docs are whole in
    a batch); the membership test is ONE co-partitioned exchange — both
    sides' distinct shingles bucketed by shingle hash, each bucket doing
    a local isin against its train-side set and emitting per-doc partial
    overlap counts.  The partials and the map-side totals then meet in a
    single doc-keyed union-aggregate (no join).  No broadcast of a
    corpus-sized set, no driver materialization."""
    from ..pipelines.relational import _coalesce_for_buckets

    if isinstance(docs, str):
        docs = rd.read_parquet(docs, columns=["doc_id", text_col, "source"])

    test = docs.filter(expr=f"source == '{test_source}'")
    train = docs.filter(expr=f"source != '{test_source}'")

    # map-side per-doc totals (distinct shingles per doc, 0 included)
    def _totals(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks() if isinstance(
            batch[text_col], pa.ChunkedArray) else batch[text_col]
        toks = tokenize_column(texts)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        joined, sdoc = _ngram_join(toks.values, _doc_index(offs), n)
        n_docs = batch.num_rows
        tot = np.zeros(n_docs, np.int64)
        if len(joined):
            codes = joined.dictionary_encode().indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            v = int(codes.max()) + 1
            uniq = np.unique(sdoc * v + codes)
            tot = np.bincount(uniq // v, minlength=n_docs).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_shingles": pa.array(tot),
            "ov": pa.array(np.zeros(n_docs, np.int64)),
        })

    totals = test.map_batches(_totals, batch_format="pyarrow",
                              zero_copy_batch=True)

    tagged = (_distinct_shingles(train, text_col, n, 0, num_buckets)
              .union(_distinct_shingles(test, text_col, n, 1, num_buckets)))

    def _bucket_overlap(g: pa.Table) -> pa.Table:
        import pandas as pd
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_shingles": pa.array([], pa.int64()),
                          "ov": pa.array([], pa.int64())})
        if g.num_rows == 0 or "side" not in g.column_names:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        sh = g["sh"].to_pandas()
        train_set = set(sh[side == 0])
        tmask = side == 1
        hit = sh[tmask].isin(train_set).to_numpy()
        ids = g["doc_id"].to_numpy(zero_copy_only=False)[tmask][hit]
        if len(ids) == 0:
            return empty
        u, c = np.unique(ids, return_counts=True)
        return pa.table({"doc_id": pa.array(u.astype(np.int64)),
                         "n_shingles": pa.array(np.zeros(len(u), np.int64)),
                         "ov": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum

    partials = (_coalesce_for_buckets(tagged, num_buckets)
                .groupby("bucket").map_groups(_bucket_overlap,
                                              batch_format="pyarrow"))

    # totals (ov=0) ∪ overlap partials (n_shingles=0) -> ONE doc-keyed
    # sum; every test doc appears in totals, so no outer join is needed.
    # The union is tiny rows spread over ~(read blocks + buckets) blocks
    # and sort-aggregate cost scales with input block COUNT, so coalesce
    # first (the pre-shuffle coalesce pattern from pipelines/relational).
    out = (_coalesce_for_buckets(totals.union(partials),
                                 max(2, num_buckets // 4))
           .groupby("doc_id")
           .aggregate(Sum("n_shingles", alias_name="n_shingles"),
                      Sum("ov", alias_name="n_overlap")))

    def _fin(batch: pa.Table) -> pa.Table:
        tot = np.asarray(batch["n_shingles"].to_numpy(
            zero_copy_only=False), np.int64)
        ov = np.asarray(batch["n_overlap"].to_numpy(
            zero_copy_only=False), np.int64)
        cont = ((tot > 0) & (5 * ov >= 4 * tot)).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_shingles": pa.array(tot),
            "n_overlap": pa.array(ov),
            "contaminated": pa.array(cont),
        })

    return out.map_batches(_fin, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# 5. concat-and-chunk sequence packing


def pack_sequences(docs, text_col: str = "text",
                   seq_len: int = 512) -> rd.Dataset:
    """Concat-and-chunk packing (GPT-style): concatenate all docs in
    doc_id order into one token stream and cut fixed-``seq_len``
    training sequences.  Emits per doc:

        (doc_id, n_tokens, start_tok, seq_first, seq_last)

    where ``start_tok`` is the doc's global token offset and
    ``seq_first``/``seq_last`` the first/last training-sequence index it
    lands in (token-less docs get an empty span at their offset).

    Scale shape: per-doc counts are a pure map; the global offsets come
    from ONE range sort of the narrow (doc_id, n_tokens) table plus a
    metadata-only prefix sum over per-block sums — the same
    O(blocks)-driver pattern as ``stages.ingest.zip_with_index``; the
    driver never sees a row."""
    docs = _docs(docs, text_col)

    def _cnt(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks() if isinstance(
            batch[text_col], pa.ChunkedArray) else batch[text_col]
        toks = tokenize_column(texts)
        n = np.diff(toks.offsets.to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_tokens": pa.array(n),
        })

    counts = docs.map_batches(_cnt, batch_format="pyarrow",
                              zero_copy_batch=True)
    return _pack_offsets(counts, seq_len)


def _pack_offsets(counts: rd.Dataset, seq_len: int) -> rd.Dataset:
    """Attach global token offsets + sequence spans to a
    (doc_id, n_tokens) table: ONE range sort by doc_id, then per-block
    sums -> driver prefix sum (O(blocks)) -> vectorized in-block cumsum."""
    counts = counts.sort("doc_id").materialize()

    block_refs = []
    for bundle in counts.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                block_refs.append(block_ref)

    @ray.remote
    def _bsum(block: pa.Table) -> int:
        s = pc.sum(block["n_tokens"]).as_py()
        return int(s or 0)

    sums = ray.get([_bsum.remote(r) for r in block_refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]) if sums else []

    @ray.remote
    def _attach(block: pa.Table, off: int) -> pa.Table:
        n = block["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = off + np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
        seq_first = start // seq_len
        seq_last = np.where(n > 0, (start + n - 1) // seq_len, seq_first)
        return pa.table({
            "doc_id": block["doc_id"],
            "n_tokens": block["n_tokens"],
            "start_tok": pa.array(start),
            "seq_first": pa.array(seq_first),
            "seq_last": pa.array(seq_last),
        })

    if not block_refs:
        return counts
    return rd.from_arrow_refs(
        [_attach.remote(r, int(o)) for r, o in zip(block_refs, offsets)])


# ---------------------------------------------------------------------------
# 6. composed training-data prep: clean -> exact dedup -> pack


def prepare_corpus(docs, text_col: str = "text", seq_len: int = 512,
                   **gate_kwargs) -> rd.Dataset:
    """The end-to-end training-data prep a corpus goes through before
    tokenization: C4-style quality gate + exact dedup keep-first
    (``text.clean_corpus``), then concat-and-chunk packing of the
    survivors in doc_id order.  Returns per kept doc:

        (doc_id, n_tokens, start_tok, seq_first, seq_last)

    Scale shape = the parts': gate + hash + token count in one map,
    one content-hash groupby for the dedup (the survivors' token
    counts ride the same aggregate — no re-tokenization), one narrow
    range sort + metadata prefix sum for the offsets."""
    from .text import clean_corpus

    kept = clean_corpus(docs, text_col, emit_tokens=True, **gate_kwargs)
    return _pack_offsets(kept.select_columns(["doc_id", "n_tokens"]),
                         seq_len)


# ---------------------------------------------------------------------------
# 7. domain-mix sampling + LM-quality band filter


def domain_mix(docs, weights: dict[str, float], domain_col: str = "source",
               id_col: str = "doc_id",
               resolution: int = 1_000_000) -> rd.Dataset:
    """Deterministic domain-weighted subsampling: keep a doc iff

        md5_low64(str(doc_id)) % resolution < round(weight * resolution)

    where ``weight`` is the target sampling rate for its domain
    (missing domains sample at 0.0, i.e. drop).  The content-free,
    id-keyed coin is the same ``md5_number_lower`` parity hash the
    stratified sampler uses, so the selection is reproducible across
    runs, engines and the SQL oracle — the standard way a training mix
    (e.g. The Pile / Dolma domain weights) is realized without a
    shuffle.  Returns ``(doc_id, domain_col)`` for the kept rows.

    Scale: a stateless per-batch filter — no shuffle, no driver state;
    the weights dict is vocabulary-of-domains sized (broadcast via
    closure).  The per-row md5 is C ``hashlib`` (~1 us/row), the same
    cost already accepted by ``stratified_sample``."""
    from .._tokflat import md5_low64

    if isinstance(docs, str):
        docs = rd.read_parquet(docs, columns=[id_col, domain_col])
    thresholds = {d: int(round(w * resolution)) for d, w in weights.items()}

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        coin = np.fromiter((md5_low64(str(int(i))) % resolution
                            for i in ids), np.int64, len(ids))
        dom = batch[domain_col].to_pandas()
        thr = dom.map(thresholds).fillna(0).to_numpy(np.int64)
        mask = coin < thr
        return pa.table({
            id_col: pa.array(ids[mask].astype(np.int64)),
            domain_col: batch[domain_col].filter(pa.array(mask)),
        })

    return docs.map_batches(_keep, batch_format="pyarrow",
                            zero_copy_batch=True)


def ppl_bucket_filter(docs, text_col: str = "text", lo: float = 0.1,
                      hi: float = 0.9) -> rd.Dataset:
    """CCNet-style LM-quality band filter: keep docs whose corpus-unigram
    mean log-prob (``unigram_logprob``) lies within the [``lo``, ``hi``]
    quantile band — dropping both the lowest-quality tail and the
    boilerplate-like head.  Quantiles are exact discrete order
    statistics (``quantile_disc`` parity via ``kth_percentile``'s
    formula).  Returns ``(doc_id, n_tokens, logprob)`` for kept docs.

    Scale: the logprob table is one row per doc (3 numeric cols), small
    next to the corpus; it is materialized once and re-read for the
    cut computation and the filter.  Both cuts come from ONE
    per-value-counts groupby (cardinality = distinct 6-dp logprobs).
    At 10^10+ docs swap the exact cuts for the mergeable MRL sketch
    (``functions.sketch.quantile_sketch``) — same band semantics,
    bounded driver state."""
    lp = unigram_logprob(docs, text_col=text_col).materialize()

    counts = (lp.groupby("logprob")
              .count()
              .to_pandas()
              .sort_values("logprob")
              .reset_index(drop=True))
    if counts.empty:
        raise ValueError("ppl_bucket_filter: empty documents dataset — "
                         "no logprob values to cut quantiles from")
    n = int(counts["count()"].sum())
    cum = counts["count()"].cumsum().to_numpy()

    def _cut(q: float) -> float:
        target = max(0, int(np.ceil(q * n)) - 1)
        return float(counts["logprob"].iloc[
            int(np.searchsorted(cum, target + 1))])

    c_lo, c_hi = _cut(lo), _cut(hi)

    def _band(batch: pa.Table) -> pa.Table:
        v = batch["logprob"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((v >= c_lo) & (v <= c_hi)))

    return lp.map_batches(_band, batch_format="pyarrow",
                          zero_copy_batch=True)


def packed_shards(docs, text_col: str = "text",
                  seq_len: int = 512) -> rd.Dataset:
    """Materialize the packed training sequences themselves (the step
    after ``pack_sequences``' span metadata): the doc_id-ordered token
    stream cut into fixed-``seq_len`` sequences, each emitted as

        (seq_id, n_tokens, h)

    with ``h`` the md5 of the space-joined token sequence — the same
    hash-exact convention as ``text.chunk_hashes`` so the shard content
    is verifiable byte-for-byte against the SQL oracle (production
    would carry the int64 token-id list instead of the digest; the cut
    discipline and shuffle shape are identical).

    Scale: global offsets from ``pack_sequences`` (one narrow range
    sort + O(blocks) prefix sum); offsets attach to the text via ONE
    co-partitioned hash_join; each doc then emits at most
    n_tokens/seq_len + 1 contiguous fragments (vectorized slicing +
    ``pc.binary_join`` — no per-token Python), and sequences assemble
    in a groupby whose groups are bounded by seq_len tokens.  The only
    corpus-scale exchanges are the offset attach and the fragment
    groupby — both unavoidable for cross-doc packing."""
    import hashlib

    import pandas as pd

    from ..pipelines.relational import hash_join

    docs = _docs(docs, text_col)
    spans = pack_sequences(docs, text_col, seq_len)
    # token-less corpus: no sequences — return a TYPED empty frame (an
    # empty groupby result would drop the schema).  Cheap: spans'
    # blocks are already materialized by the offsets prefix sum.
    if not (spans.sum("n_tokens") or 0):
        return rd.from_arrow(pa.table({
            "seq_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "h": pa.array([], pa.string()),
        }))
    joined = hash_join(
        docs, spans.select_columns(["doc_id", "start_tok"]), on="doc_id")

    def _frag(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks() if isinstance(
            batch[text_col], pa.ChunkedArray) else batch[text_col]
        toks = tokenize_column(texts)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = toks.values
        n = np.diff(offs)
        start = batch["start_tok"].to_numpy(zero_copy_only=False)
        bounds = [offs[0]]          # absolute cut positions into `vals`
        seq_ids, frag_starts = [], []
        for d in range(len(n)):
            if n[d] == 0:
                continue
            s, nd = int(start[d]), int(n[d])
            # global stream positions of the internal seq_len cuts
            cuts = np.arange((s // seq_len + 1) * seq_len, s + nd, seq_len)
            b = np.concatenate([[s], cuts, [s + nd]])
            bounds.extend((b[1:] - s + offs[d]).tolist())
            seq_ids.extend((b[:-1] // seq_len).tolist())
            frag_starts.extend(b[:-1].tolist())
        la = pa.ListArray.from_arrays(
            pa.array(np.asarray(bounds, np.int64) - bounds[0], pa.int32()),
            vals.slice(bounds[0]))
        nfr = np.diff(np.asarray(bounds, np.int64))
        return pa.table({
            "seq_id": pa.array(np.asarray(seq_ids, np.int64)),
            "frag_start": pa.array(np.asarray(frag_starts, np.int64)),
            "frag_n": pa.array(nfr),
            "frag_txt": pc.binary_join(la, " "),
        })

    frags = joined.map_batches(_frag, batch_format="pyarrow",
                               zero_copy_batch=True)

    def _asm(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("frag_start")
        txt = " ".join(g["frag_txt"])
        return pd.DataFrame({
            "seq_id": [int(g["seq_id"].iloc[0])],
            "n_tokens": [int(g["frag_n"].sum())],
            "h": [hashlib.md5(txt.encode()).hexdigest()],
        })

    return frags.groupby("seq_id").map_groups(_asm, batch_format="pandas")


def bigram_logprob(docs, text_col: str = "text",
                   broadcast_limit: int = 2_000_000) -> rd.Dataset:
    """(doc_id, n_pairs, logprob): mean corpus-bigram conditional
    log-probability ln P(b|a) over each doc's ADJACENT token pairs,
    rounded to 6 decimals (0.0 for docs with < 2 tokens) — the order-
    sensitive upgrade of ``unigram_logprob``'s bag-of-words LM (a
    fluency/quality signal unigrams can't see: scrambled text keeps
    its unigram score but craters here).

    P(b|a) = n_ab / n_head(a), with n_head(a) = Σ_b n_ab derived from
    the AGGREGATED bigram table (no second corpus scan) — so the model
    normalizes exactly and, being trained on the scored corpus itself,
    never needs smoothing.  Scale shape mirrors ``unigram_logprob``:
    one bigram-cardinality aggregate, broadcast back via ``ray.put``
    into a single per-doc map (docs are row-atomic, so the scoring
    pass needs no shuffle at all).  Above ``broadcast_limit`` distinct
    bigrams the log-probs attach via the co-partitioned ``hash_join``
    and a doc-keyed aggregate instead.  Tokenization (and therefore
    pair adjacency) is post-filter, byte-identical to the oracle's
    TOK_ORDERED_CTE."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .text import _adjacent_bigrams

    docs = _docs(docs, text_col)

    def _pair_counts(batch: pa.Table) -> pa.Table:
        big = _adjacent_bigrams(tokenize_column(batch[text_col]))
        if len(big) == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n_ab": pa.array([], pa.int64())})
        d = big.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(d.dictionary)).astype(np.int64)
        return pa.table({"bigram": d.dictionary.cast(pa.string()),
                         "n_ab": pa.array(cnt, pa.int64())})

    bc = (docs.map_batches(_pair_counts, batch_format="pyarrow",
                           zero_copy_batch=True)
          .groupby("bigram").aggregate(Sum("n_ab", alias_name="n_ab"))
          ).materialize()

    # head counts from the aggregated table: tokens can't contain the
    # joiner space, so the split is lossless
    def _lp_table(bpdf: pd.DataFrame) -> pd.Series:
        heads = bpdf["bigram"].str.split(" ", n=1).str[0]
        n_head = bpdf.groupby(heads)["n_ab"].transform("sum")
        # ln(n_ab / n_head) elementwise — the oracle's exact IEEE op
        # order, so per-pair values are bit-identical and only the
        # per-doc summation order differs (absorbed by round-6)
        return pd.Series(
            np.log(bpdf["n_ab"].to_numpy(np.float64)
                   / n_head.to_numpy(np.float64)),
            index=bpdf["bigram"])

    def _pair_doc_index(offs: np.ndarray) -> np.ndarray:
        return np.repeat(np.arange(len(offs) - 1, dtype=np.int64),
                         np.maximum(np.diff(offs) - 1, 0))

    if bc.count() > broadcast_limit:
        from ..pipelines.relational import hash_join

        lp_ds = rd.from_arrow(pa.Table.from_pandas(
            _lp_table(bc.to_pandas()).rename("lp").reset_index(),
            preserve_index=False))
        # (doc_id, bigram, tf) rows; join attaches lp, doc groupby sums
        def _doc_pairs(batch: pa.Table) -> pa.Table:
            toks = tokenize_column(batch[text_col])
            big = _adjacent_bigrams(toks)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            didx = _pair_doc_index(offs)
            ids = batch["doc_id"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({"doc_id": pa.array(ids[didx]),
                             "bigram": big})

        joined = hash_join(
            docs.map_batches(_doc_pairs, batch_format="pyarrow",
                             zero_copy_batch=True), lp_ds, on="bigram")
        agg = (joined.map_batches(
                   lambda b: pa.table({"doc_id": b["doc_id"],
                                       "np_": pa.array(
                                           np.ones(b.num_rows, np.int64)),
                                       "lp": b["lp"]}),
                   batch_format="pyarrow", batch_size=None)
               .groupby("doc_id")
               .aggregate(Sum("np_", alias_name="n_pairs"),
                          Sum("lp", alias_name="lp")))
        ids = docs.map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"].cast(pa.int64())}),
            batch_format="pyarrow", batch_size=None)
        out = hash_join(ids, agg, on="doc_id", how="left")

        def _fin(batch: pa.Table) -> pa.Table:
            n = np.nan_to_num(np.asarray(batch["n_pairs"].to_numpy(
                zero_copy_only=False), np.float64), nan=0.0)
            w = np.nan_to_num(np.asarray(batch["lp"].to_numpy(
                zero_copy_only=False), np.float64), nan=0.0)
            lp = np.where(n > 0, np.round(w / np.maximum(n, 1), 6), 0.0)
            return pa.table({
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_pairs": pa.array(n.astype(np.int64)),
                "logprob": pa.array(lp, pa.float64()),
            })

        return out.map_batches(_fin, batch_format="pyarrow",
                               batch_size=None)

    lut_ref = ray.put(_lp_table(bc.to_pandas()))

    def _score(batch: pa.Table) -> pa.Table:
        lp_by_pair = ray.get(lut_ref)
        n_docs = batch.num_rows
        toks = tokenize_column(batch[text_col])
        big = _adjacent_bigrams(toks)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        didx = _pair_doc_index(offs)
        lp = big.to_pandas().map(lp_by_pair).to_numpy(np.float64)
        sums = np.bincount(didx, weights=lp, minlength=n_docs)
        n = np.bincount(didx, minlength=n_docs).astype(np.int64)
        out = np.where(n > 0, np.round(sums / np.maximum(n, 1), 6), 0.0)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_pairs": pa.array(n),
            "logprob": pa.array(out, pa.float64()),
        })

    return docs.map_batches(_score, batch_format="pyarrow",
                            zero_copy_batch=True)
