"""Delta-gap + varint posting-list codec, numpy-vectorized.

The reference engine stores postings as LEB128-style varints inside
zlib-compressed block files (``AddEscapedItem``/``GetEscapedItem``,
/root/reference/DataStructure.h:2639-2740, block compression at
:2748-2759) with fixed-size lookup blocks for random access
(/root/reference/NodeStat.h:28-60).  This module is the Ray/Arrow-native
re-expression: each term's posting list becomes two binary cells
(delta-gap varint doc ids; varint term frequencies) plus per-block skip
metadata (last doc id, byte offsets, block-max tf) enabling block-max
pruning at query time.  Blobs live in Arrow ``binary`` columns inside
Parquet (zstd), so the "zlib block file" role is played by Parquet pages.

Everything is numpy/Arrow vectorized — ``encode_term_partition`` encodes
every term of an index partition in one shot with no per-term Python loop
(one global varint pass; per-term cells are zero-copy slices of the shared
byte buffer via Arrow binary offsets).

Per-term layout::

    doc_blob = varint(doc[0]) varint(doc[1]-doc[0]) ... varint(doc[df-1]-doc[df-2])
    tf_blob  = varint(tf[0]) ... varint(tf[df-1])

Skip metadata every ``SKIP_BLOCK`` docs (one list cell per term)::

    skip_docs[i]    = last doc id of block i
    skip_doc_off[i] = byte offset of block i within doc_blob
    skip_tf_off[i]  = byte offset of block i within tf_blob
    block_max_tf[i] = max tf within block i   (block-max WAND upper bound)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SKIP_BLOCK = 128  # docs per skip block (reference: LOOKUP_DIV_SIZE=1000 hits, FileStorage.h:16)

_THRESH = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_sizes(values: np.ndarray) -> np.ndarray:
    """Byte length of the LEB128 encoding of each uint64 value."""
    v = values.astype(np.uint64, copy=False)
    nb = np.ones(len(v), dtype=np.int64)
    for t in _THRESH:
        nb += v >= t
    return nb


def encode_varints(values: np.ndarray,
                   sizes: np.ndarray | None = None) -> np.ndarray:
    """Vectorized LEB128 encode: uint64 array -> uint8 array.

    ``sizes``: optional precomputed ``varint_sizes(values)`` — callers
    that also need the per-value lengths (for offset cumsums) pass them
    in so the 9-comparison size pass runs once, not twice."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    nb = varint_sizes(v) if sizes is None else sizes
    offsets = np.cumsum(nb) - nb
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    maxb = int(nb.max())
    for j in range(maxb):
        mask = nb > j
        byte = (v[mask] >> np.uint64(7 * j)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[offsets[mask] + j] = byte.astype(np.uint8) | cont
    return out


def decode_varints(buf: np.ndarray) -> np.ndarray:
    """Vectorized LEB128 decode: uint8 array -> uint64 array (all values)."""
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    gidx = np.zeros(len(b), dtype=np.int64)
    np.cumsum(is_end[:-1], out=gidx[1:])
    starts = np.flatnonzero(np.concatenate(([True], is_end[:-1])))
    within = np.arange(len(b), dtype=np.int64) - starts[gidx]
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (np.uint64(7) * within.astype(np.uint64))
    return np.bitwise_or.reduceat(contrib, starts)


def _binary_from_offsets(data: np.ndarray, cell_offsets: np.ndarray) -> pa.BinaryArray:
    """Arrow binary array whose cells are slices of one shared byte buffer."""
    if len(data) >= 1 << 31:
        # int32 offsets would wrap silently; a partition this big means
        # the shard count is undersized for the corpus — fail with the fix
        raise ValueError(
            f"index partition holds {len(data)} posting bytes (> 2 GiB); "
            "raise num_shards/num_salts so shards stay under the Arrow "
            "binary 2 GiB offset limit")
    return pa.Array.from_buffers(
        pa.binary(), len(cell_offsets) - 1,
        [None, pa.py_buffer(cell_offsets.astype(np.int32)), pa.py_buffer(data)],
    )


def _list_from_offsets(values: pa.Array, cell_offsets: np.ndarray) -> pa.ListArray:
    return pa.ListArray.from_arrays(pa.array(cell_offsets.astype(np.int32), pa.int32()), values)


def encode_term_partition(term_starts: np.ndarray, doc_ids: np.ndarray,
                          tfs: np.ndarray,
                          positions: np.ndarray | None = None,
                          aux: np.ndarray | None = None) -> dict[str, pa.Array]:
    """Encode ALL terms of a partition at once.

    Input: postings sorted by (term, doc_id); ``term_starts`` = start row of
    each term (len T+1, last = n_rows).  Returns Arrow columns
    ``doc_blob, tf_blob, skip_docs, skip_doc_off, skip_tf_off, block_max_tf``
    (one row per term) built with zero per-term Python work.

    ``positions``: optional flat uint32 array of within-doc token positions
    (ascending per posting row, ``tfs[i]`` values per row, rows in the same
    sorted order) — the reference's positional hit encoding
    (``enc=(pos<<3)|bits``, CompileHitList.h:304-315) as a third parallel
    blob: per doc, first position absolute then delta-gaps (each doc
    self-contained, so block-sliced decode needs no cross-block base).
    Adds ``pos_blob`` + ``skip_pos_off`` columns.

    ``aux``: optional per-posting uint32 channel aligned with doc_ids
    (one value per posting row) — the unified index's anchor-field tf,
    the analog of the reference's per-posting hit-type routing
    (``enc=(pos<<3)|type_bits``, FileStorage.h:317-465,
    CompileHitList.h:142-177): one posting row carries every field's
    frequency so one reader pass scores all fields.  Encoded exactly
    like tf_blob (plain varints, offsets by term).  Adds ``aux_blob``.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    n = len(doc_ids)
    t_start = term_starts[:-1].astype(np.int64)
    t_end = term_starts[1:].astype(np.int64)
    dfs = t_end - t_start

    # delta-gap: diff everywhere, reset at term starts to the absolute doc id
    gaps = np.empty(n, dtype=np.uint64)
    if n:
        gaps[1:] = doc_ids[1:] - doc_ids[:-1]
        # df==0 terms (and an all-empty input) have start == n: masking
        # keeps the reset write in bounds instead of IndexError-ing
        resets = t_start[t_start < n]
        gaps[resets] = doc_ids[resets]

    doc_nb, tf_nb = varint_sizes(gaps), varint_sizes(tfs)
    doc_bytes = encode_varints(gaps, sizes=doc_nb)
    tf_bytes = encode_varints(tfs, sizes=tf_nb)
    doc_sz = np.concatenate(([0], np.cumsum(doc_nb)))
    tf_sz = np.concatenate(([0], np.cumsum(tf_nb)))

    # global block structure: for each term, blocks of SKIP_BLOCK docs
    nblocks = (dfs + SKIP_BLOCK - 1) // SKIP_BLOCK
    blk_term = np.repeat(np.arange(len(dfs)), nblocks)            # owning term of each block
    blk_offsets = np.concatenate(([0], np.cumsum(nblocks)))       # list offsets per term
    # ordinal of each block within its term
    blk_ord = np.arange(len(blk_term)) - blk_offsets[:-1][blk_term]
    blk_start = t_start[blk_term] + blk_ord * SKIP_BLOCK          # absolute row of block start
    blk_end = np.minimum(blk_start + SKIP_BLOCK, t_end[blk_term]) - 1

    skip_docs = doc_ids[blk_end] if n else np.empty(0, np.uint64)
    skip_doc_off = (doc_sz[blk_start] - doc_sz[t_start][blk_term]).astype(np.uint32)
    skip_tf_off = (tf_sz[blk_start] - tf_sz[t_start][blk_term]).astype(np.uint32)
    if len(blk_start):
        block_max_tf = np.maximum.reduceat(tfs, blk_start).astype(np.uint32)
    else:
        block_max_tf = np.empty(0, np.uint32)

    out = {
        "df": pa.array(dfs.astype(np.uint32), pa.uint32()),
        "doc_blob": _binary_from_offsets(doc_bytes, doc_sz[term_starts]),
        "tf_blob": _binary_from_offsets(tf_bytes, tf_sz[term_starts]),
        "skip_docs": _list_from_offsets(pa.array(skip_docs, pa.uint64()), blk_offsets),
        "skip_doc_off": _list_from_offsets(pa.array(skip_doc_off, pa.uint32()), blk_offsets),
        "skip_tf_off": _list_from_offsets(pa.array(skip_tf_off, pa.uint32()), blk_offsets),
        "block_max_tf": _list_from_offsets(pa.array(block_max_tf, pa.uint32()), blk_offsets),
    }
    if positions is not None:
        pos = np.ascontiguousarray(positions, dtype=np.uint64)
        rows_flat = np.concatenate(([0], np.cumsum(tfs))).astype(np.int64)
        if len(pos) != rows_flat[-1]:
            raise ValueError(f"positions length {len(pos)} != sum(tf) {rows_flat[-1]}")
        pgaps = np.empty(len(pos), dtype=np.uint64)
        if len(pos):
            pgaps[1:] = pos[1:] - pos[:-1]
        row_starts = rows_flat[:-1][tfs > 0] if n else np.empty(0, np.int64)
        pgaps[row_starts] = pos[row_starts]   # absolute first position per doc
        pos_nb = varint_sizes(pgaps)
        pos_bytes = encode_varints(pgaps, sizes=pos_nb)
        pos_sz = np.concatenate(([0], np.cumsum(pos_nb))) \
            if len(pos) else np.zeros(1, np.int64)
        term_flat_start = rows_flat[term_starts]
        out["pos_blob"] = _binary_from_offsets(pos_bytes, pos_sz[term_flat_start])
        skip_pos_off = (pos_sz[rows_flat[blk_start]]
                        - pos_sz[term_flat_start][blk_term]).astype(np.uint32) \
            if len(blk_start) else np.empty(0, np.uint32)
        out["skip_pos_off"] = _list_from_offsets(
            pa.array(skip_pos_off, pa.uint32()), blk_offsets)
    if aux is not None:
        a = np.ascontiguousarray(aux, dtype=np.uint64)
        if len(a) != n:
            raise ValueError(f"aux length {len(a)} != posting rows {n}")
        aux_nb = varint_sizes(a)
        aux_bytes = encode_varints(a, sizes=aux_nb)
        aux_sz = np.concatenate(([0], np.cumsum(aux_nb)))
        out["aux_blob"] = _binary_from_offsets(aux_bytes, aux_sz[term_starts])
    return out


def decode_aux(aux_blob: bytes, df: int) -> np.ndarray:
    """Decode a term's aux channel (e.g. anchor tf) -> uint64[df]."""
    vals = decode_varints(np.frombuffer(aux_blob, dtype=np.uint8))
    if len(vals) != df:
        raise ValueError(
            f"aux blob decodes {len(vals)} values, want df={df} — "
            "corrupt or truncated blob")
    return vals


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> dict:
    """Encode one term's postings (doc_ids strictly ascending) -> dict of
    python values (doc_blob, tf_blob, skip arrays)."""
    cols = encode_term_partition(np.array([0, len(doc_ids)]), doc_ids, tfs)
    return {k: v[0].as_py() for k, v in cols.items()}


def decode_postings(doc_blob: bytes, tf_blob: bytes, df: int):
    """Decode blobs back to (doc_ids: uint64[df], tfs: uint64[df])."""
    gaps = decode_varints(np.frombuffer(doc_blob, dtype=np.uint8))
    tfs = decode_varints(np.frombuffer(tf_blob, dtype=np.uint8))
    if len(gaps) != df or len(tfs) != df:
        # ValueError (not assert): a truncated blob must fail loudly
        # even under `python -O`, like decode_positions does
        raise ValueError(
            f"posting blobs decode ({len(gaps)}, {len(tfs)}) values, "
            f"want df={df} — corrupt or truncated blob")
    return np.cumsum(gaps, dtype=np.uint64), tfs


def decode_positions(pos_blob: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode a term's position blob -> (flat_positions: uint64, row_offsets).

    ``tfs`` are the per-doc frequencies (the per-doc position counts);
    ``row_offsets`` (len df+1) slices flat_positions per doc.  Positions
    are reconstructed by per-doc cumulative sums over the delta gaps."""
    tfs = np.asarray(tfs, dtype=np.int64)
    rows_flat = np.concatenate(([0], np.cumsum(tfs)))
    pgaps = decode_varints(np.frombuffer(pos_blob, dtype=np.uint8))
    if len(pgaps) != rows_flat[-1]:
        raise ValueError(f"pos blob decodes {len(pgaps)} values, want {rows_flat[-1]}")
    if len(pgaps) == 0:
        return np.empty(0, np.uint64), rows_flat
    c = np.cumsum(pgaps, dtype=np.uint64)
    row_starts = rows_flat[:-1][tfs > 0]
    # subtract each doc's running base so the cumsum restarts per doc
    base = np.repeat(c[row_starts] - pgaps[row_starts], tfs[tfs > 0])
    return c - base, rows_flat


def decode_positions_blocks(pos_blob: bytes, blocks: np.ndarray,
                            skip_pos_off, block_tfs: list[np.ndarray]):
    """Positions for selected skip blocks only (random-access path).

    ``block_tfs``: decoded tf array per selected block (from decode_blocks
    over the same block ordinals).  Per-doc position runs are
    self-contained, so each block decodes independently."""
    nblocks = len(skip_pos_off)
    buf = np.frombuffer(pos_blob, dtype=np.uint8)
    out = []
    for b, tfb in zip(blocks, block_tfs):
        p0 = int(skip_pos_off[b])
        p1 = int(skip_pos_off[b + 1]) if b + 1 < nblocks else len(buf)
        flat, offs = decode_positions(buf[p0:p1].tobytes(), tfb)
        out.append((flat, offs))
    return out


def decode_posting_row_blocks(row, blocks: np.ndarray,
                              with_positions: bool = False):
    """Decode selected block ordinals of ONE posting row dict (the
    parquet row shape: df / doc_blob / tf_blob / skip_* [+ pos_blob]).

    Returns ``(doc_ids, tfs)`` — plus ``flat_positions`` (tf-aligned,
    concatenated over the selected blocks) when ``with_positions`` —
    so the subtle skip-block slicing (block-end searchsorted
    semantics, SKIP_BLOCK tail sizing, tf-aligned position splits)
    lives in exactly one place for every block-sliced reader."""
    df = int(row["df"])
    sd = np.asarray(row["skip_docs"], dtype=np.uint64)
    d, tf = decode_blocks(row["doc_blob"], row["tf_blob"], df, blocks,
                          sd, row["skip_doc_off"], row["skip_tf_off"])
    if not with_positions:
        return d, tf
    sizes = np.minimum(SKIP_BLOCK,
                       df - blocks.astype(np.int64) * SKIP_BLOCK)
    tf_splits = np.split(tf, np.cumsum(sizes)[:-1])
    pos_parts = decode_positions_blocks(row["pos_blob"], blocks,
                                        row["skip_pos_off"], tf_splits)
    flat = (np.concatenate([p[0] for p in pos_parts])
            if pos_parts else np.empty(0, np.uint64))
    return d, tf, flat


def decode_blocks(doc_blob: bytes, tf_blob: bytes, df: int, blocks: np.ndarray,
                  skip_docs, skip_doc_off, skip_tf_off):
    """Decode only the given block ordinals of one posting list.

    Returns (doc_ids, tfs) concatenated over the selected blocks (ascending
    block order).  This is the random-access path used by block-max
    pruning — the analog of the reference's comp-block random reads
    (``RetrieveCompIndexLookup``, /root/reference/FileStorage.h:1331+).
    """
    nblocks = len(skip_docs)
    dbuf = np.frombuffer(doc_blob, dtype=np.uint8)
    tbuf = np.frombuffer(tf_blob, dtype=np.uint8)
    doc_parts, tf_parts = [], []
    for b in blocks:
        d0 = int(skip_doc_off[b])
        d1 = int(skip_doc_off[b + 1]) if b + 1 < nblocks else len(dbuf)
        t0 = int(skip_tf_off[b])
        t1 = int(skip_tf_off[b + 1]) if b + 1 < nblocks else len(tbuf)
        gaps = decode_varints(dbuf[d0:d1])
        docs = np.cumsum(gaps, dtype=np.uint64)
        if b > 0:
            docs += np.uint64(skip_docs[b - 1])
        doc_parts.append(docs)
        tf_parts.append(decode_varints(tbuf[t0:t1]))
    if not doc_parts:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    return np.concatenate(doc_parts), np.concatenate(tf_parts)
