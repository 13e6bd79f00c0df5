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


def zip_with_index(ds: rd.Dataset, sort_keys: list[str] | None = None,
                   id_column: str = "doc_id") -> rd.Dataset:
    """Attach a dense 0-based ``id_column`` equal to each row's rank.

    If ``sort_keys`` is given the dataset is range-sort-shuffled first, so
    the id is the dense rank over the sorted keys (FIXTURES.md §1's
    ``doc_id`` contract).  The global prefix sum over per-block row counts
    touches ONLY block metadata on the driver (no row data): at 256 nodes
    this is one small metadata pass, the distributed analog of the
    reference's division prefix sums
    (/root/reference/DyableLexonWords/LexonWords.cpp:110-153).
    """
    if sort_keys:
        ds = ds.sort(sort_keys)
    ds = ds.materialize()

    bundles = list(ds.iter_internal_ref_bundles())
    block_refs, offsets = [], []
    total = 0
    for b in bundles:
        for block_ref, meta in zip(b.block_refs, b.metadata):
            block_refs.append(block_ref)
            offsets.append(total)
            total += meta.num_rows

    @ray.remote
    def _attach(block: pa.Table, offset: int) -> pa.Table:
        ids = np.arange(offset, offset + block.num_rows, dtype=np.uint64)
        return block.append_column(id_column, pa.array(ids, pa.uint64()))

    new_refs = [_attach.remote(r, off) for r, off in zip(block_refs, offsets)]
    return rd.from_arrow_refs(new_refs)


def add_sha256(ds: rd.Dataset, text_col: str = "content",
               out_col: str = "sha256") -> rd.Dataset:
    """Per-row sha256 hex of the text column (the north-rule invariant:
    content sha256 equality vs the reference corpus)."""

    def _hash(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        hashes = [hashlib.sha256(v.encode()).hexdigest() if v is not None else None
                  for v in col.to_pylist()]
        return batch.append_column(out_col, pa.array(hashes, pa.string()))

    return ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)
