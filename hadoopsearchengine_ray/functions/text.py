"""Text-analysis operators over a (doc_id, text) table.

Backs the driver ``queries()`` entries on the testdata ``documents``
table and doubles as the training-data-pipeline toolkit: token stats,
quality metrics, language ID, bigram associations
(/root/reference/DyableAssociations/CreateAssociations.cpp:24-48),
rolling-hash document fingerprints.
All column types are chosen to hash-match the DuckDB oracle SQL
(int64/string only — no floats in comparable outputs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from ..stages.tokenize import tokenize_batch
from ..tokenizer import tokenize_column

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic; inlined identically in the oracle SQL (VALUES list)
LANG_STOPWORDS: list[tuple[str, str]] = [
    ("the", "en"), ("and", "en"), ("is", "en"), ("of", "en"), ("to", "en"),
    ("le", "fr"), ("la", "fr"), ("et", "fr"), ("les", "fr"), ("des", "fr"),
    ("el", "es"), ("los", "es"), ("las", "es"), ("una", "es"), ("que", "es"),
    ("der", "de"), ("die", "de"), ("und", "de"), ("das", "de"), ("ein", "de"),
]


def _docs(ds_or_path, text_col="text", id_col="doc_id") -> rd.Dataset:
    if isinstance(ds_or_path, str):
        return rd.read_parquet(ds_or_path, columns=[id_col, text_col])
    return ds_or_path


def token_table(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """(doc_id, term, tf) with int64 tf (hash-parity with SQL count(*))."""

    def _tok(batch: pa.Table) -> pa.Table:
        t = tokenize_batch(batch, text_col=text_col, id_col="doc_id")
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "term": t["term"],
            "tf": t["tf"].cast(pa.int64()),
        })

    return docs.map_batches(_tok, batch_format="pyarrow", zero_copy_batch=True)


def dictionary_table(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """(term, df, cf) global term stats (A1/A2 shape, map-side combined)."""
    return dictionary_from_token_rows(token_table(docs, text_col))


def dictionary_from_token_rows(tok: rd.Dataset,
                               combine_blocks: int = 8) -> rd.Dataset:
    """Same, over an existing (doc_id, term, tf) table (lets callers
    that already materialized the token rows avoid a second tokenize).

    The string-keyed final groupby's cost scales with its input BLOCK
    count (measured: 7.6s over ~100 partial blocks vs ~4s over 16 at
    the same row count), so partials are repartitioned to
    ``combine_blocks`` and locally re-combined first — the same
    two-level combine ``stages.dictionary.vocab_table`` uses."""

    def _partial(batch: pa.Table) -> pa.Table:
        d = batch["term"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d.dictionary)
        return pa.table({
            "term": d.dictionary.cast(pa.string()),
            "df": pa.array(np.bincount(codes, minlength=n).astype(np.int64)),
            "cf": pa.array(np.bincount(codes, weights=tf, minlength=n).astype(np.int64)),
        })

    def _combine(batch: pa.Table) -> pa.Table:
        d = batch["term"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        df = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        cf = batch["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d.dictionary)
        return pa.table({
            "term": d.dictionary.cast(pa.string()),
            "df": pa.array(np.bincount(codes, weights=df, minlength=n).astype(np.int64)),
            "cf": pa.array(np.bincount(codes, weights=cf, minlength=n).astype(np.int64)),
        })

    ds = tok.map_batches(_partial, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
    if combine_blocks:
        ds = (ds.repartition(combine_blocks)
              .map_batches(_combine, batch_format="pyarrow", batch_size=None))
    return (ds.groupby("term")
            .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf")))


def chunk_table(docs, text_col: str = "text",
                size: int = 64, stride: int = 32,
                emit_text: bool = False) -> rd.Dataset:
    """Overlapping token-window chunking — the RAG/LLM-data splitter:
    each doc emits windows starting at 0, stride, 2·stride, … while the
    start is inside the doc, each window up to ``size`` tokens.
    Output: (doc_id, chunk_idx, n_tokens, h) where ``h`` is the md5 of
    the space-joined window text (the SQL oracle's
    ``md5(string_agg(term, ' ' ORDER BY pos))``); with
    ``emit_text=True`` the column is the chunk text itself (the
    production output — the md5 form exists for hash-exact checking).

    Pure map, no shuffle: windows materialize per batch via one gather
    (flat-token take with precomputed indices) + one vectorized
    ``binary_join_element_wise`` — no per-chunk Python string loop."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    docs = _docs(docs, text_col)

    def _chunks(batch: pa.Table) -> pa.Table:
        import hashlib

        toks = tokenize_column(batch[text_col])
        flat = toks.values
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.diff(offs)
        # chunk starts per doc: 0, stride, ... < n_tok (zero-token docs
        # emit nothing, matching the oracle's GROUP BY over tok)
        n_chunks = np.where(n_tok > 0,
                            (n_tok + stride - 1) // stride, 0).astype(np.int64)
        if n_chunks.sum() == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                ("text" if emit_text else "h"): pa.array([], pa.string()),
            })
        chunk_doc = np.repeat(np.arange(len(n_tok)), n_chunks)
        chunk_offsets = np.concatenate(([0], np.cumsum(n_chunks)))
        chunk_ord = np.arange(len(chunk_doc)) - chunk_offsets[:-1][chunk_doc]
        starts = chunk_ord * stride                       # within-doc
        lens = np.minimum(size, n_tok[chunk_doc] - starts)
        # gather indices: for chunk c, flat[doc_off + start .. +len)
        g_starts = offs[:-1][chunk_doc] + starts
        flat_idx = (np.repeat(g_starts, lens)
                    + (np.arange(lens.sum())
                       - np.repeat(np.cumsum(lens) - lens, lens)))
        taken = flat.take(pa.array(flat_idx, pa.int64()))
        # binary_join over the list array (one call, no Python loop)
        chunk_lists = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(lens))).astype(np.int32)),
            taken)
        joined = pc.binary_join(chunk_lists, " ")
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[chunk_doc]
        if emit_text:
            hcol = joined.cast(pa.string())
        else:
            hcol = pa.array([hashlib.md5(s.encode()).hexdigest()
                             for s in joined.to_pylist()], pa.string())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "chunk_idx": pa.array(chunk_ord, pa.int64()),
            "n_tokens": pa.array(lens.astype(np.int64), pa.int64()),
            ("text" if emit_text else "h"): hcol,
        })

    return docs.map_batches(_chunks, batch_format="pyarrow",
                            zero_copy_batch=True)


def clean_corpus(docs, text_col: str = "text",
                 min_tokens: int = 20, max_tokens: int = 5000,
                 min_distinct_ratio: float = 0.1,
                 min_mean_len: float = 2.0,
                 max_mean_len: float = 12.0,
                 emit_tokens: bool = False) -> rd.Dataset:
    """C4-style corpus cleaning gate + exact dedup: returns the
    surviving (doc_id, h) — docs passing the per-doc quality thresholds
    (token count bounds, distinct-token ratio, mean token length) and
    the FIRST (lowest doc_id) per content hash among the survivors.
    ``emit_tokens=True`` adds each survivor's token count as
    ``n_tokens`` (identical text -> identical count, so the dedup
    groupby can carry it with a second Min) — the input
    ``prepare_corpus`` packing needs, with no re-tokenization.

    Scale shape: the quality gate is a pure vectorized map over doc
    rows (each doc is whole in its batch row — metrics, thresholds and
    the content hash all compute inline, no join against a metrics
    table); the only shuffle is the exact-dedup groupby on the 64-char
    hash.  The thresholds mirror the reference's doc-size gate
    (M7, Webpage.h doc acceptance) extended with the repetition and
    length-shape filters an LLM-data pipeline applies."""
    import hashlib

    docs = _docs(docs, text_col)

    def _gate(batch: pa.Table) -> pa.Table:
        # same vectorized kernel as quality_table (M7), thresholds inline
        toks = tokenize_column(batch[text_col])
        flat = toks.values
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.diff(offs)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        chars = np.add.reduceat(np.concatenate([lens, [0]]), offs[:-1])
        chars[n_tok == 0] = 0
        ndoc = len(toks)
        codes = flat.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.uint64)
        doc_idx = np.repeat(np.arange(ndoc, dtype=np.uint64), n_tok)
        uniq = np.unique((doc_idx << np.uint64(32)) | codes)
        n_distinct = np.bincount(
            (uniq >> np.uint64(32)).astype(np.int64), minlength=ndoc)
        nt = np.maximum(n_tok, 1).astype(np.float64)
        dr = n_distinct / nt
        ml = chars / nt
        ok = ((n_tok >= min_tokens) & (n_tok <= max_tokens)
              & (dr >= min_distinct_ratio)
              & (ml >= min_mean_len) & (ml <= max_mean_len))
        kept = batch.filter(pa.array(ok))
        hs = [hashlib.sha256((t or "").encode()).hexdigest()
              for t in kept[text_col].to_pylist()]
        cols = {
            "doc_id": kept["doc_id"].cast(pa.int64()),
            "h": pa.array(hs, pa.string()),
        }
        if emit_tokens:
            cols["n_tokens"] = pa.array(n_tok[ok].astype(np.int64))
        return pa.table(cols)

    gated = docs.map_batches(_gate, batch_format="pyarrow",
                             zero_copy_batch=True)
    aggs = [Min("doc_id", alias_name="doc_id")]
    out_cols = ["doc_id", "h"]
    if emit_tokens:
        aggs.append(Min("n_tokens", alias_name="n_tokens"))
        out_cols.append("n_tokens")
    return (gated.groupby("h")
            .aggregate(*aggs)
            .select_columns(out_cols))


def tfidf_table(docs, text_col: str = "text",
                broadcast_limit: int = 2_000_000) -> rd.Dataset:
    """Sparse TF-IDF featurization: (doc_id, term, w) with
    ``w = round(tf * (ln((1+N)/(1+df)) + 1), 6)`` — the smooth-idf
    vectorizer convention, SQL-exact against the DuckDB oracle.

    Scale shape: tf needs NO shuffle (each doc is whole inside one
    batch row, so (doc, term, tf) is a pure map); only the
    vocabulary-cardinality df aggregate shuffles, and its result
    broadcasts back as one ``ray.put`` idf lookup (hashtable .map, not
    a per-row loop).  Above ``broadcast_limit`` distinct terms the idf
    attaches via the co-partitioned hash_join instead."""
    import pandas as pd
    import ray

    docs = _docs(docs, text_col)
    n_docs = docs.count()
    tok = token_table(docs, text_col).materialize()   # feeds df AND weights
    dict_ds = dictionary_from_token_rows(tok)

    vocab_n = dict_ds.count()
    if vocab_n > broadcast_limit:
        from ..pipelines.relational import hash_join

        def _idf_col(batch: pa.Table) -> pa.Table:
            df = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
            idf = np.log((1.0 + n_docs) / (1.0 + df)) + 1.0
            return pa.table({"term": batch["term"],
                             "idf": pa.array(idf, pa.float64())})

        joined = hash_join(
            tok, dict_ds.map_batches(_idf_col, batch_format="pyarrow",
                                     batch_size=None),
            on="term")

        def _mul(batch: pa.Table) -> pa.Table:
            w = (batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
                 * batch["idf"].to_numpy(zero_copy_only=False))
            return pa.table({
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "term": batch["term"],
                "w": pa.array(np.round(w, 6), pa.float64()),
            })

        return joined.map_batches(_mul, batch_format="pyarrow",
                                  batch_size=None)

    dpdf = dict_ds.to_pandas()
    idf = pd.Series(
        np.log((1.0 + n_docs) / (1.0 + dpdf["df"].to_numpy(dtype=np.float64)))
        + 1.0, index=dpdf["term"])
    lut_ref = ray.put(idf)

    def _weight(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        terms = batch["term"].to_pandas()
        w = (batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
             * terms.map(lut).to_numpy(dtype=np.float64))
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "term": batch["term"],
            "w": pa.array(np.round(w, 6), pa.float64()),
        })

    return tok.map_batches(_weight, batch_format="pyarrow", batch_size=None)


def doc_length_table(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """(doc_id, dl) for docs with >=1 valid token."""
    tok = token_table(docs, text_col)

    def _partial(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(doc, return_inverse=True)
        return pa.table({
            "doc_id": pa.array(uniq, pa.int64()),
            "dl": pa.array(np.bincount(inv, weights=tf).astype(np.int64)),
        })

    return (tok.map_batches(_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
            .groupby("doc_id").aggregate(Sum("dl", alias_name="dl")))


def quality_table(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Integer quality metrics per doc: token count, total token chars,
    distinct terms (doc-size gates, the M7 analog of
    /root/reference/DyableDocument/DyableIndex/DocumentInstance.h:464-474)."""

    def _quality(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        flat = toks.values
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        total_chars = np.add.reduceat(
            np.concatenate([lens, [0]]), offs[:-1])
        total_chars[counts == 0] = 0
        ndoc = len(toks)
        # distinct terms per doc via (doc, code) unique
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
        doc_idx = np.repeat(np.arange(ndoc, dtype=np.uint64), counts)
        uniq = np.unique((doc_idx << np.uint64(32)) | codes)
        n_distinct = np.bincount(
            (uniq >> np.uint64(32)).astype(np.int64), minlength=ndoc)
        # drop zero-token docs: the SQL oracle (GROUP BY over tok) emits no
        # row for a doc with no valid tokens — both sides must agree
        keep = counts > 0
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_tokens": pa.array(counts, pa.int64()),
            "total_chars": pa.array(total_chars, pa.int64()),
            "n_distinct": pa.array(n_distinct.astype(np.int64), pa.int64()),
        }).filter(pa.array(keep))

    return docs.map_batches(_quality, batch_format="pyarrow", zero_copy_batch=True)


# BPE-style pre-tokenizer split (letter runs / digit runs / symbol runs,
# each with an optional leading space) — the token-budget estimator a
# training-data pipeline runs before real BPE.  RE2 syntax: the SAME
# pattern string runs in Arrow's count_substring_regex and in DuckDB's
# regexp_extract_all (both RE2), so the SQL oracle is exact.
BPE_SPLIT_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"
WS_SPLIT_RE = r"\S+"


def token_count_table(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Per-doc token budgets: whitespace token count and BPE-ish
    pre-tokenizer piece count — both as one vectorized Arrow regex-count
    kernel per column, no per-row Python."""

    def _counts(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_ws": pc.count_substring_regex(txt, WS_SPLIT_RE).cast(pa.int64()),
            "n_bpe": pc.count_substring_regex(txt, BPE_SPLIT_RE).cast(pa.int64()),
        })

    return docs.map_batches(_counts, batch_format="pyarrow", zero_copy_batch=True)


def lang_id_table(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Stopword-vote language ID: argmax language by stopword hits,
    ties broken by language code asc, no hits -> 'und'.

    Vectorized (round-4, replacing the per-row per-token Python loop):
    one flat-token dictionary-encode per batch, then per language ONE
    ``pc.is_in`` membership test over the batch's DISTINCT terms
    (vocabulary-bounded) propagated to occurrences by a code gather +
    bincount per doc — no Python in the hot map stage."""
    from .._tokflat import flat_token_view

    langs = sorted({l for _, l in LANG_STOPWORDS})
    lang_terms = {
        l: pa.array(sorted(t for t, ll in LANG_STOPWORDS if ll == l))
        for l in langs
    }
    lang_arr = np.asarray(langs, object)

    def _langid(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        counts, d, codes, doc_idx = flat_token_view(toks)
        ndoc = len(counts)
        votes = np.zeros((ndoc, len(langs)), np.int64)
        if len(codes):
            for li, l in enumerate(langs):
                hit = pc.is_in(d.dictionary,
                               value_set=lang_terms[l]).to_numpy(
                                   zero_copy_only=False)
                tok_hit = hit[codes]
                if tok_hit.any():
                    votes[:, li] = np.bincount(doc_idx[tok_hit],
                                               minlength=ndoc)
        # argmax returns the FIRST max — langs are sorted asc, matching
        # the (votes desc, lang asc) tie-break of the SQL oracle
        best = votes.argmax(axis=1)
        has = votes[np.arange(ndoc), best] > 0
        out = np.where(has, lang_arr[best], "und")
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "lang_pred": pa.array(out, pa.string()),
        })

    return docs.map_batches(_langid, batch_format="pyarrow", zero_copy_batch=True)


def _adjacent_bigrams(toks) -> pa.Array:
    """Joined ``"left right"`` strings of ADJACENT same-doc token pairs
    from a tokenized list column.  The doc-boundary mask (a pair is
    valid iff both tokens belong to one doc) lives only here — shared
    by ``bigram_table`` and ``pmi_bigrams`` so the two counts can never
    drift."""
    flat = toks.values
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(flat)
    if n <= 1:
        return pa.array([], pa.string())
    valid = np.ones(n - 1, dtype=bool)
    ends = offs[1:-1] - 1  # last token index of each doc (nonempty handling)
    ends = ends[(ends >= 0) & (ends < n - 1)]
    valid[ends] = False
    left = pc.array_filter(flat.slice(0, n - 1), pa.array(valid))
    right = pc.array_filter(flat.slice(1), pa.array(valid))
    return pc.binary_join_element_wise(left, right, " ")


def bigram_table(docs: rd.Dataset, text_col: str = "text",
                 k: int = 100) -> rd.Dataset:
    """Top-k adjacent-token bigrams by count (association counting,
    /root/reference/DyableAssociations/CreateAssociations.cpp:24-48 +
    KeyOccurrence).  Deterministic order: count desc, bigram asc."""

    def _bigrams(batch: pa.Table) -> pa.Table:
        big = _adjacent_bigrams(tokenize_column(batch[text_col]))
        if len(big) == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        d = big.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(d.dictionary)).astype(np.int64)
        return pa.table({"bigram": d.dictionary.cast(pa.string()),
                         "n": pa.array(cnt, pa.int64())})

    agg = (docs.map_batches(_bigrams, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("bigram").aggregate(Sum("n", alias_name="n")))
    return agg.sort(["n", "bigram"], descending=[True, False]).limit(k)


def pmi_bigrams(docs: rd.Dataset, text_col: str = "text",
                min_count: int = 5, k: int = 50):
    """Top-k adjacent-token collocations by pointwise mutual
    information (Church & Hanks 1990, public), the statistical upgrade
    of the reference's raw association counting
    (/root/reference/DyableAssociations/CreateAssociations.cpp:24-48).

    PMI = ln(lift) with lift = P(ab) / (P(a) P(b)), P(a) from the
    unigram stream (N1 tokens) and P(ab) from the adjacent-bigram
    stream (N2 = N1 - num_docs pairs).  ln is monotone, so ranking
    uses lift directly and the returned frame carries only EXACT
    integers (rank, bigram, n_ab, n_a, n_b) — float-hash-safe against
    the SQL oracle, which computes lift with the identical IEEE
    operation order ((n_ab * N1) * N1) / ((N2 * n_a) * n_b).

    Shape: ONE tokenizing pass emits partial unigram+bigram counts
    (combiner inside the batch), one groupby merges them; the
    aggregated count table (vocab + bigram-vocab, corpus-independent
    upper bound) is materialized once and feeds totals, the broadcast
    unigram map, and the qualifying-bigram scorer.  Only bigrams with
    n_ab >= min_count are scored (standard PMI practice — rare pairs
    have unstable PMI — and it bounds the sort input)."""
    import pandas as pd

    def _counts(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        flat = toks.values
        empty = pa.table({"kind": pa.array([], pa.string()),
                          "gram": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if len(flat) == 0:
            return empty
        du = flat.dictionary_encode()
        ucodes = du.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ucnt = np.bincount(ucodes, minlength=len(du.dictionary))
        parts = [pa.table({
            "kind": pa.array(["u"] * len(du.dictionary), pa.string()),
            "gram": du.dictionary.cast(pa.string()),
            "n": pa.array(ucnt.astype(np.int64), pa.int64())})]
        big = _adjacent_bigrams(toks)   # shared doc-boundary kernel
        if len(big):
            db = big.dictionary_encode()
            bcodes = db.indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            bcnt = np.bincount(bcodes, minlength=len(db.dictionary))
            parts.append(pa.table({
                "kind": pa.array(["b"] * len(db.dictionary), pa.string()),
                "gram": db.dictionary.cast(pa.string()),
                "n": pa.array(bcnt.astype(np.int64), pa.int64())}))
        return pa.concat_tables(parts)

    counts = (docs.map_batches(_counts, batch_format="pyarrow",
                               zero_copy_batch=True)
              .groupby(["kind", "gram"])
              .aggregate(Sum("n", alias_name="n"))
              .materialize())

    empty = pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                          "bigram": pd.Series([], dtype="object"),
                          "n_ab": pd.Series([], dtype="int64"),
                          "n_a": pd.Series([], dtype="int64"),
                          "n_b": pd.Series([], dtype="int64")})
    totals = {r["kind"]: int(r["sum(n)"])
              for r in counts.groupby("kind").sum("n").take_all()}
    n1, n2 = totals.get("u", 0), totals.get("b", 0)
    if n2 == 0:
        return empty

    # unigram map: vocab-bounded broadcast (same regime note as the
    # dictionary broadcast in stages/dictionary.py — a >2M-term corpus
    # would swap this for a hash join on the left/right term)
    upd = counts.filter(expr="kind == 'u'").to_pandas()
    umap = pd.Series(upd["n"].astype("int64").to_numpy(),
                     index=upd["gram"])

    def _score(batch: pa.Table) -> pa.Table:
        t = batch.to_pandas()
        if not len(t):
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n_ab": pa.array([], pa.int64()),
                             "n_a": pa.array([], pa.int64()),
                             "n_b": pa.array([], pa.int64()),
                             "lift": pa.array([], pa.float64())})
        sides = t["gram"].str.split(" ", n=1, expand=True)
        n_a = sides[0].map(umap).to_numpy(dtype=np.int64)
        n_b = sides[1].map(umap).to_numpy(dtype=np.int64)
        n_ab = t["n"].to_numpy(dtype=np.int64)
        # IEEE op order mirrored in the SQL oracle exactly
        lift = (n_ab.astype(np.float64) * n1 * n1) \
            / (np.float64(n2) * n_a * n_b)
        return pa.table({"bigram": pa.array(t["gram"], pa.string()),
                         "n_ab": pa.array(n_ab, pa.int64()),
                         "n_a": pa.array(n_a, pa.int64()),
                         "n_b": pa.array(n_b, pa.int64()),
                         "lift": pa.array(lift, pa.float64())})

    top = (counts.filter(expr=f"kind == 'b' and n >= {int(min_count)}")
           .map_batches(_score, batch_format="pyarrow")
           .sort(["lift", "bigram"], descending=[True, False])
           .limit(k).to_pandas())
    if not len(top):
        return empty
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top.drop(columns=["lift"])


def association_map(docs: rd.Dataset, text_col: str = "text",
                    top_m: int = 3, max_bigrams: int = 10_000) -> dict[str, list[str]]:
    """Per-term top co-occurring partners from adjacent-bigram counts —
    the reference's association map for query expansion
    (CreateAssociationMapSet, /root/reference/DyableCommand/DyableCommand.cpp:290-304).
    Returns {term: [partners ranked by count desc, partner asc]}."""
    big = bigram_table(docs, text_col, k=max_bigrams).to_pandas()
    assoc: dict[str, list[tuple[int, str]]] = {}
    for bigram, n in zip(big["bigram"], big["n"]):
        a, b = bigram.split(" ", 1)
        assoc.setdefault(a, []).append((-n, b))
        assoc.setdefault(b, []).append((-n, a))
    out = {}
    for t, partners in assoc.items():
        partners.sort()
        seen, ranked = set(), []
        for _, p in partners:
            if p != t and p not in seen:
                seen.add(p)
                ranked.append(p)
            if len(ranked) >= top_m:
                break
        out[t] = ranked
    return out


def expand_query(terms: list[str], assoc: dict[str, list[str]],
                 per_term: int = 1) -> list[str]:
    """Append each query term's top association partners (dedup, original
    terms first) — the query-expansion hook of the reference's
    TextStringServer (/root/reference/DyableRequest/TextStringServer.h:40-116)."""
    out = list(terms)
    seen = set(terms)
    for t in terms:
        for p in assoc.get(t, [])[:per_term]:
            if p not in seen:
                seen.add(p)
                out.append(p)
    return out


_FP_P = np.uint64(0x100000001B3)          # polynomial base (FNV prime)
_FP_OFFSET = np.uint64(0xCBF29CE484222325)  # leading coefficient (FNV basis)


def fingerprint_py(tokens: list[str]) -> int:
    """Single-process shadow of the doc fingerprint (dual-implementation
    testing, SURVEY.md §5): polynomial rolling hash mod 2^64 over the
    per-token md5-low-64 hash sequence, order-sensitive.  The token hash
    is DuckDB's ``md5_number_lower`` (the shared ``_tokflat.md5_low64``)
    so the whole fingerprint has an exact integer SQL oracle."""
    from .._tokflat import md5_low64

    h = int(_FP_OFFSET)
    for t in tokens:
        h = (h * int(_FP_P) + md5_low64(t)) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


def fingerprint_table(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Order-sensitive rolling-hash fingerprint of each doc's token
    sequence — the D2 excerpt checksum analog
    (/root/reference/DyableRequest/HitScore.h:262-267).

    Vectorized (round-2 fix of the per-byte Python loop): each DISTINCT
    token in the batch is hashed once (md5-low-64 over the dictionary,
    unique terms << total tokens), then every doc's fingerprint is the
    polynomial rolling hash  OFFSET*P^n + Σ th_j * P^(n-1-j)  mod 2^64
    over its token-hash sequence — computed with one precomputed power
    table and a single ``np.add.at`` scatter (uint64 wraparound is the
    mod).  Identical to ``fingerprint_py`` per doc, and — because the
    token hash equals DuckDB's ``md5_number_lower`` — to the exact
    integer SQL oracle (list_reduce rolling hash in HUGEINT)."""
    def _fp(batch: pa.Table) -> pa.Table:
        from .._tokflat import flat_token_view, md5_low64_uniques

        counts, d, codes, doc_idx = flat_token_view(tokenize_column(batch[text_col]))
        ndoc = len(counts)
        uhash = md5_low64_uniques(d.dictionary)
        th = uhash[codes] if len(codes) else np.empty(0, np.uint64)
        maxlen = int(counts.max()) if ndoc else 0
        pows = np.empty(maxlen + 1, np.uint64)
        pows[0] = 1
        if maxlen:
            np.multiply.accumulate(np.full(maxlen, _FP_P, np.uint64),
                                   out=pows[1:])
        ends = np.repeat(np.cumsum(counts), counts)
        exp = ends - 1 - np.arange(len(th), dtype=np.int64)
        acc = np.zeros(ndoc, np.uint64)
        np.add.at(acc, doc_idx, th * pows[exp])
        fp = acc + _FP_OFFSET * pows[counts]
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "fingerprint": pa.array(
                (fp & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64),
                pa.int64()),
        })

    return docs.map_batches(_fp, batch_format="pyarrow", zero_copy_batch=True)


def keyword_table(docs: rd.Dataset, text_col: str = "text",
                  top_m: int = 3, pct: float = 0.95) -> rd.Dataset:
    """Per-doc excerpt keyword sets (M9): keep a doc's terms whose GLOBAL
    collection frequency is at or below the ``pct`` threshold (the
    excerpt-keyword culler, /root/reference/DyableHitList/DyableHitList/
    CompileHitList.h:184-197 with FindOccurrenceThreshold,
    DyableLexonWords/LexonWords.cpp:87-102), ranked top_m by
    (tf desc, term asc).  Output: (doc_id, keyword, tf) int64/str/int64.

    Shuffle shape: the token table is materialized ONCE and feeds both
    the dictionary aggregate and the per-doc top-k; the eligible-term set
    is vocabulary-cardinality and broadcast."""
    import ray

    from ..pipelines.relational import kth_percentile, top_k_per_group

    tok = token_table(docs, text_col).materialize()
    dic = dictionary_from_token_rows(tok).materialize()
    thresh = kth_percentile(dic, "cf", pct)
    elig_pdf = dic.to_pandas()
    # the Arrow value_set is built ONCE and broadcast; each batch only
    # runs the is_in kernel against it
    elig_ref = ray.put(pa.array(
        sorted(elig_pdf[elig_pdf["cf"] <= thresh]["term"]), pa.string()))

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        mask = _pc.is_in(batch["term"], value_set=ray.get(elig_ref))
        f = batch.filter(mask)
        return pa.table({
            "doc_id": f["doc_id"].cast(pa.int64()),
            "keyword": f["term"],
            "tf": f["tf"].cast(pa.int64()),
        })

    filt = tok.map_batches(_filter, batch_format="pyarrow", batch_size=None)
    return top_k_per_group(filt, "doc_id", "tf", top_m)


def keyword_links(keywords, top_m_unused: int = 0) -> "pa.Table":
    """Co-occurrence edge list over per-doc keyword sets: every ordered
    pair of distinct keywords in one doc is an edge, weight 1/outdeg —
    the keyword-graph input of the reference's second PulseRank run
    (DyableCommand/DyableCommand.cpp:704-705).  ``keywords`` is the
    keyword_table output as a pandas DataFrame (keyword-vocabulary and
    per-doc-set sizes are tiny; the pairing is per-doc local)."""
    import pandas as pd

    kws = keywords.sort_values(["doc_id", "keyword"])
    vocab = sorted(kws["keyword"].unique())
    kid = {k: i for i, k in enumerate(vocab)}
    src, dst = [], []
    for _, g in kws.groupby("doc_id", sort=False):
        ks = [kid[k] for k in g["keyword"]]
        for a in ks:
            for b in ks:
                if a != b:
                    src.append(a)
                    dst.append(b)
    src_a = np.asarray(src, np.int64)
    dst_a = np.asarray(dst, np.int64)
    outdeg = np.bincount(src_a, minlength=len(vocab)) if len(src_a) else np.zeros(len(vocab), np.int64)
    w = np.where(outdeg[src_a] > 0, 1.0 / np.maximum(outdeg[src_a], 1), 0.0) \
        if len(src_a) else np.empty(0, np.float64)
    return vocab, pa.table({
        "src": pa.array(src_a.astype(np.uint64), pa.uint64()),
        "dst": pa.array(dst_a.astype(np.uint64), pa.uint64()),
        "weight": pa.array(w.astype(np.float32), pa.float32()),
    })


def keyword_link_edges(kws: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """Distributed keyword co-occurrence edges over the keyword_table:
    (src_kw, dst_kw, cnt) where cnt = #docs emitting that ordered pair.

    Round-3 replacement of the driver-side per-doc Python pair loop in
    ``keyword_links``: rows are hash-BUCKETED by doc (one shuffle), each
    bucket emits every ordered pair of distinct keywords per doc with
    one vectorized repeat/tile index construction and combines pairs
    map-side (np.unique over packed (src,dst) codes), then a final
    groupby sums the per-bucket partials.  Per-doc sets are <= top_m
    rows, so the pair fan-out is bounded by top_m^2."""
    from ray.data.aggregate import Sum

    def _bucket(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = doc * np.uint64(0x9E3779B97F4A7C15)
        return pa.table({
            "doc_id": batch["doc_id"],
            "keyword": batch["keyword"],
            "b": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
        })

    def _pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"src_kw": pa.array([], pa.string()),
                          "dst_kw": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if g.num_rows < 2 or "doc_id" not in g.column_names:
            return empty
        doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kw = g["keyword"].combine_chunks().dictionary_encode()
        codes = kw.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(doc, kind="stable")
        doc_s, code_s = doc[order], codes[order]
        n = len(doc_s)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(doc_s)) + 1))
        counts = np.diff(np.concatenate((starts, [n])))
        run = np.repeat(np.arange(len(starts)), counts)  # doc-run per row
        m = counts[run]                       # pair slots per row (as src)
        src_idx = np.repeat(np.arange(n), m)
        slot = np.arange(int(m.sum())) - np.repeat(np.cumsum(m) - m, m)
        dst_idx = np.repeat(starts[run], m) + slot
        keep = src_idx != dst_idx
        a, b = code_s[src_idx[keep]], code_s[dst_idx[keep]]
        packed, cnt = np.unique(a << np.int64(32) | b, return_counts=True)
        d = kw.dictionary.cast(pa.string())
        return pa.table({
            "src_kw": d.take(pa.array((packed >> np.int64(32)).astype(np.int32))),
            "dst_kw": d.take(pa.array((packed & np.int64(0xFFFFFFFF)).astype(np.int32))),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    # final cross-bucket combine: a (src,dst) pair can surface from up to
    # ``num_buckets`` doc-buckets.  A two-STRING-key groupby().aggregate
    # here measured 10.8s for 590k rows where an int64-keyed groupby of
    # the same size runs in <0.3s (Ray's sort-based aggregate pays per
    # string key column), so pairs are hash-bucketed on one int64 key and
    # summed EXACTLY inside each group (dictionary-encode + bincount —
    # hash collisions only co-locate rows, never merge distinct pairs).
    def _pair_bucket(batch: pa.Table) -> pa.Table:
        import pandas as pd

        h = (pd.util.hash_array(batch["src_kw"].to_pandas().to_numpy())
             ^ pd.util.hash_array(batch["dst_kw"].to_pandas().to_numpy())
             * np.uint64(0x9E3779B97F4A7C15))
        return batch.append_column(
            "pb", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    def _pair_combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "src_kw" not in g.column_names:
            return pa.table({"src_kw": pa.array([], pa.string()),
                             "dst_kw": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        s = g["src_kw"].combine_chunks().dictionary_encode()
        d = g["dst_kw"].combine_chunks().dictionary_encode()
        si = s.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        di = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        packed, inv = np.unique(si << np.int64(32) | di, return_inverse=True)
        total = np.bincount(inv, weights=cnt, minlength=len(packed))
        return pa.table({
            "src_kw": s.dictionary.cast(pa.string()).take(
                pa.array((packed >> np.int64(32)).astype(np.int32))),
            "dst_kw": d.dictionary.cast(pa.string()).take(
                pa.array((packed & np.int64(0xFFFFFFFF)).astype(np.int32))),
            "cnt": pa.array(total.astype(np.int64), pa.int64()),
        })

    return (kws.map_batches(_bucket, batch_format="pyarrow", batch_size=None)
            .groupby("b").map_groups(_pairs, batch_format="pyarrow")
            .map_batches(_pair_bucket, batch_format="pyarrow", batch_size=None)
            .groupby("pb").map_groups(_pair_combine, batch_format="pyarrow"))


def keyword_pagerank(docs: rd.Dataset, text_col: str = "text",
                     top_m: int = 3, cycles: int = 20):
    """PulseRank over the keyword co-occurrence graph (reference stage 13)
    -> pandas (keyword, kw_score) sorted by keyword.

    Fully distributed graph construction (round-3): pair edges come from
    ``keyword_link_edges`` (bucketed shuffle, vectorized pair emit); the
    out-degree normalization is an edge-table aggregate broadcast back
    map-side; only the VOCABULARY (distinct keywords — dictionary-scale,
    same budget the scorer's term dict lives under) and the final score
    vector touch the driver.  Scores identical to the driver-loop
    ``keyword_links`` shadow (asserted by the driver query)."""
    import pandas as pd
    import ray

    from ..pipelines.pagerank import pagerank

    kws = keyword_table(docs, text_col, top_m).materialize()
    # distinct keywords via per-block distinct partials (vocabulary-
    # cardinality per block) + driver unique — a groupby here would pay
    # the block-count-scaling aggregate cost for a vocab-sized result
    # (measured 9s vs 0.3s on the 20k-doc bench corpus)

    def _dk(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"keyword": batch["keyword"].combine_chunks().unique()})

    vocab_pdf = kws.map_batches(_dk, batch_format="pyarrow",
                                batch_size=None).to_pandas()
    vocab = sorted(vocab_pdf["keyword"].unique())
    if not vocab:
        return pd.DataFrame({"keyword": pd.Series(dtype=str),
                             "kw_score": pd.Series(dtype=float)})
    edges = keyword_link_edges(kws).materialize()
    # out-degree per src: per-block dictionary-encode + bincount partials
    # (vocab-cardinality per block) + tiny driver sum — a string-keyed
    # groupby().aggregate() here measured 2.6s on the 100k-doc bench
    # corpus where these partials run in <0.2s (Ray's sort-based
    # aggregate pays per string key; see keyword_link_edges' combine)
    def _pdeg(batch: pa.Table) -> pa.Table:
        s = batch["src_kw"].combine_chunks().dictionary_encode()
        idx = s.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = np.bincount(idx, weights=cnt, minlength=len(s.dictionary))
        return pa.table({
            "src_kw": s.dictionary.cast(pa.string()),
            "deg": pa.array(tot.astype(np.int64), pa.int64()),
        })

    deg = (edges.map_batches(_pdeg, batch_format="pyarrow", batch_size=None)
           .to_pandas().groupby("src_kw", as_index=False)["deg"].sum())
    kid = {k: i for i, k in enumerate(vocab)}
    state_ref = ray.put((kid, dict(zip(deg["src_kw"], deg["deg"]))))

    def _ids(batch: pa.Table) -> pa.Table:
        # vocabulary-bounded attach (round-4, replacing the per-ROW dict
        # mapping): only each batch's DISTINCT keywords pass through the
        # broadcast id/degree maps; rows are a vectorized code gather
        kmap, dmap = ray.get(state_ref)
        s = batch["src_kw"].combine_chunks().dictionary_encode()
        t = batch["dst_kw"].combine_chunks().dictionary_encode()
        si = s.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ti = t.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        s_terms = s.dictionary.to_pylist()
        t_terms = t.dictionary.to_pylist()
        s_ids = np.fromiter((kmap[x] for x in s_terms), np.uint64,
                            len(s_terms))
        t_ids = np.fromiter((kmap[x] for x in t_terms), np.uint64,
                            len(t_terms))
        s_deg = np.fromiter((dmap[x] for x in s_terms), np.float64,
                            len(s_terms))
        cnt = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "src": pa.array(s_ids[si], pa.uint64()),
            "dst": pa.array(t_ids[ti], pa.uint64()),
            "weight": pa.array((cnt / s_deg[si]).astype(np.float32),
                               pa.float32()),
        })

    links = edges.map_batches(_ids, batch_format="pyarrow", batch_size=None)
    score = pagerank(links, len(vocab), cycles)
    return pd.DataFrame({"keyword": vocab,
                         "kw_score": np.round(score, 9)}).sort_values(
        "keyword").reset_index(drop=True)


def word_stats(docs: rd.Dataset, text_col: str = "text"):
    """Global word statistics (A7: per-division max + net occurrence,
    /root/reference/DyableHitList/DyableLogFile/IndexLogFile.h:163-179)
    as one aggregate over the dictionary: (max_cf, net_cf, n_terms)."""
    import pandas as pd
    from ray.data.aggregate import Count, Max, Sum

    row = (dictionary_table(docs, text_col)
           .aggregate(Max("cf", alias_name="max_cf"),
                      Sum("cf", alias_name="net_cf"),
                      Count(alias_name="n_terms")))
    return pd.DataFrame({
        "max_cf": pd.array([int(row["max_cf"])], dtype="int64"),
        "net_cf": pd.array([int(row["net_cf"])], dtype="int64"),
        "n_terms": pd.array([int(row["n_terms"])], dtype="int64"),
    })
