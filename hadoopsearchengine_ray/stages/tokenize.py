"""Tokenize stage: corpus rows -> (doc_id, term, tf) token rows.

The Ray-native rebuild of the reference's CreateDocumentIndex stage
(/root/reference/DyableDocument/DyableIndex/DocumentInstance.h:50-158 and
the per-client hit streams, Webpage.h:326-361): a stateless
``map_batches`` over zero-copy Arrow batches.  Term frequencies are
counted *within* the batch (every document is wholly contained in its
batch row), so the emitted rows are already the per-(doc, term) partials —
the downstream groupbys never see raw token occurrences.  This is the
map-side combine that the reference lacks (it ships every hit to the log
divisions, LogFile.h:190-200).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..tokenizer import tokenize_column

def tokenize_batch(batch: pa.Table, text_col: str = "content",
                   id_col: str = "doc_id",
                   with_positions: bool = False,
                   exclude_terms: tuple[str, ...] = ()) -> pa.Table:
    """(doc_id, text) batch -> unique (doc_id, term, tf) rows.

    ``with_positions`` adds a ``pos: list<uint32>`` column — the 0-based
    indices of the term within the doc's VALID token sequence, ascending
    (the positional-posting source, reference SWordHit positions,
    CompileHitList.h:304-315).

    ``exclude_terms``: optional stopword amputation, the reference's
    exclude-word filter (Webpage.h:334-346).  Excluded terms vanish
    before anything downstream sees them: dl, positions and df are all
    over the KEPT token sequence.  The engine's default is lossless
    hot-term salting instead — use this only when the reference's
    lossy behavior is wanted."""
    tokens = tokenize_column(batch[text_col])  # list<string>, one per doc
    flat = tokens.values
    ndocs = len(tokens)
    counts = np.diff(tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.uint64), counts)
    if exclude_terms:
        import pyarrow.compute as pc

        keep = pc.invert(pc.is_in(
            flat, value_set=pa.array(list(exclude_terms), pa.string())))
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        doc_idx = doc_idx[keep_np]
        if with_positions:
            # per-doc counts are only read again to derive positional
            # doc_starts — skip the O(kept tokens) bincount otherwise
            counts = np.bincount(doc_idx.astype(np.int64),
                                 minlength=ndocs).astype(np.int64)

    # count (doc, term) pairs vectorized: dictionary-encode terms, pack
    # (local_doc, code) into one uint64 key, np.unique with counts
    dict_arr = flat.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    keys = (doc_idx << np.uint64(32)) | codes
    if not with_positions:
        uniq, cnt = np.unique(keys, return_counts=True)
    else:
        # stable sort keeps within-doc token order, so each (doc, term)
        # group's positions come out ascending
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        starts = np.flatnonzero(np.diff(ks)) + 1 if len(ks) else np.empty(0, np.int64)
        bounds = np.concatenate(([0], starts)) if len(ks) else np.empty(0, np.int64)
        uniq = ks[bounds] if len(ks) else np.empty(0, np.uint64)
        cnt = np.diff(np.concatenate((bounds, [len(ks)]))) if len(ks) else np.empty(0, np.int64)
        doc_starts = np.repeat(
            np.cumsum(counts) - counts, counts).astype(np.int64)
        pos_in_doc = (np.arange(len(keys), dtype=np.int64) - doc_starts)
        pos_sorted = pos_in_doc[order].astype(np.uint32)
    u_doc_local = (uniq >> np.uint64(32)).astype(np.int64)
    u_code = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int32)

    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)[u_doc_local]
    terms = dict_arr.dictionary.take(pa.array(u_code))
    cols = {
        "doc_id": pa.array(doc_ids, pa.uint64()),
        "term": terms.cast(pa.string()),
        "tf": pa.array(cnt.astype(np.uint32), pa.uint32()),
    }
    if with_positions:
        offs = np.concatenate(([0], np.cumsum(cnt))).astype(np.int32)
        cols["pos"] = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(pos_sorted, pa.uint32()))
    return pa.table(cols)


def tokenize_stage(corpus: rd.Dataset, text_col: str = "content",
                   id_col: str = "doc_id", batch_size: int = 512,
                   with_positions: bool = False,
                   exclude_terms: tuple[str, ...] = ()) -> rd.Dataset:
    """corpus (doc_id, content, ...) -> token rows (doc_id, term, tf[, pos]).

    ``batch_size`` is deliberately small: content rows can be MBs
    (SURVEY.md §7.4 "wide rows") and the token fan-out is ~100x rows.
    """
    ds = corpus.map_batches(
        lambda b: tokenize_batch(b, text_col, id_col, with_positions,
                                 exclude_terms),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    return ds


def doc_length_partials(tokens: rd.Dataset) -> rd.Dataset:
    """Token rows -> per-batch partial (doc_id, dl); exact after
    ``groupby('doc_id').sum('dl')`` regardless of block splits."""

    def _partial(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(doc, return_inverse=True)
        dl = np.bincount(inv, weights=tf).astype(np.int64)
        return pa.table({"doc_id": pa.array(uniq, pa.uint64()),
                         "dl": pa.array(dl, pa.int64())})

    return tokens.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)


def doc_lengths(tokens: rd.Dataset, combine_blocks: int = 32) -> rd.Dataset:
    """(doc_id, dl) — total token count per document (BM25's dl input).

    Two-level combine before the groupby: the aggregate's cost scales
    with input block count, so partials are coalesced first."""
    from ray.data.aggregate import Sum

    def _combine(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(doc, return_inverse=True)
        return pa.table({"doc_id": pa.array(uniq, pa.uint64()),
                         "dl": pa.array(np.bincount(inv, weights=dl).astype(np.int64))})

    ds = doc_length_partials(tokens)
    if combine_blocks:  # needed when the input arrives in many blocks
        ds = (ds.repartition(combine_blocks)
              .map_batches(_combine, batch_format="pyarrow", batch_size=None))
    return ds.groupby("doc_id").aggregate(Sum("dl", alias_name="dl"))
