"""Ingest stages: corpus load, dense doc-id assignment, sha256 validation.

Replaces the reference's doc numbering (round-robin sharding at
/root/reference/DyableParseTREC/DyableParseHTML/DyableParseHTML.cpp:88-92
and the doc-database lookup streams, FileStorage.h:3375-3630) with dense
ranks over the sorted natural key — stable across runs and parallelism.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def load_corpus(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned Parquet read of the corpus table."""
    return rd.read_parquet(path, columns=columns or CORPUS_COLUMNS)


def _attach_block_ranks(ds: rd.Dataset, id_column: str,
                        check_dup_keys: list[str] | None = None) -> rd.Dataset:
    """Dense 0-based id in current dataset order via a metadata-only
    prefix sum over per-block row counts (the distributed analog of the
    reference's division prefix sums,
    /root/reference/DyableLexonWords/LexonWords.cpp:110-153).

    ``check_dup_keys``: when set (and the input is SORTED by these keys),
    every block reports its within-block adjacent-duplicate count plus
    its first/last key rows; the driver sees only O(blocks) tuples and
    fails loudly on any duplicate — no key materialization."""
    ds = ds.materialize()
    block_refs, offsets = [], []
    total = 0
    for b in ds.iter_internal_ref_bundles():
        for block_ref, meta in zip(b.block_refs, b.metadata):
            if meta.num_rows == 0:
                continue
            block_refs.append(block_ref)
            offsets.append(total)
            total += meta.num_rows

    if check_dup_keys:
        @ray.remote
        def _dup_info(block: pa.Table):
            import pandas as pd
            sub = block.select(check_dup_keys).to_pandas()
            dups = int(sub.duplicated().sum())
            first = tuple(sub.iloc[0]) if len(sub) else None
            last = tuple(sub.iloc[-1]) if len(sub) else None
            return dups, first, last

        infos = ray.get([_dup_info.remote(r) for r in block_refs])
        within = sum(d for d, _, _ in infos)
        boundary = sum(1 for (_, _, la), (_, fb, _) in zip(infos, infos[1:])
                       if la is not None and la == fb)
        if within or boundary:
            raise ValueError(
                f"zip_with_index: sort keys {check_dup_keys} are not unique "
                f"({within + boundary} duplicate rows); deduplicate the "
                "corpus or extend the key (the reference renames duplicate "
                "base URLs, IndexLogFile.h:46-53 — see functions/dedup.py)")

    @ray.remote
    def _attach(block: pa.Table, offset: int) -> pa.Table:
        ids = np.arange(offset, offset + block.num_rows, dtype=np.uint64)
        return block.append_column(id_column, pa.array(ids, pa.uint64()))

    new_refs = [_attach.remote(r, off) for r, off in zip(block_refs, offsets)]
    return rd.from_arrow_refs(new_refs)


def zip_with_index(ds: rd.Dataset, sort_keys: list[str] | None = None,
                   id_column: str = "doc_id") -> rd.Dataset:
    """Attach a dense 0-based ``id_column`` equal to each row's rank over
    the sorted ``sort_keys`` (FIXTURES.md §1's ``doc_id`` contract).
    Fully distributed: no driver key table, no broadcast (see below).
    """
    if not sort_keys:
        return _attach_block_ranks(ds, id_column)

    # Range-partitioned sort-merge attach (round-2 fix of the driver-LUT
    # broadcast): ONE distributed range sort of the full table by the
    # natural key, then ids = metadata-only prefix-sum block ranks.
    # Duplicate keys are detected from O(blocks) per-block summaries
    # (within-block dups + block-boundary equality) — the driver never
    # materializes the key table and nothing is broadcast.  The wide
    # content column crosses exactly one range exchange, which is the
    # minimum any distributed id-by-global-rank assignment can do.
    # Block count is BYTES-derived (floor 16 = the measured single-box
    # sweet spot; ~256MB per block beyond that) so the whole corpus —
    # content column included — never funnels through a fixed 16 blocks
    # at 100x scale.
    from .._block import blocks_for_bytes

    try:
        nbytes = ds.size_bytes()
    except Exception:
        nbytes = 0
    full = ds.repartition(blocks_for_bytes(nbytes)).sort(list(sort_keys))
    return _attach_block_ranks(full, id_column,
                               check_dup_keys=list(sort_keys))


def sha256_hex_column(col, null_to_empty: bool = False) -> pa.Array:
    """sha256 hexdigest per row of a string column — THE content-hash
    kernel (add_sha256 and incremental_dedup must hash identically or
    the ingestion anti-join silently stops matching).  ``null_to_empty``
    hashes NULL text as "" (dedup gate semantics); False keeps NULL."""
    hashes = [hashlib.sha256(v.encode()).hexdigest() if v is not None
              else (hashlib.sha256(b"").hexdigest() if null_to_empty
                    else None)
              for v in col.to_pylist()]
    return pa.array(hashes, pa.string())


def add_sha256(ds: rd.Dataset, text_col: str = "content",
               out_col: str = "sha256") -> rd.Dataset:
    """Per-row sha256 hex of the text column (the north-rule invariant:
    content sha256 equality vs the reference corpus)."""

    def _hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, sha256_hex_column(batch[text_col]))

    return ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)
