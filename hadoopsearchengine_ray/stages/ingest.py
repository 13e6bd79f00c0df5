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


def _attach_block_ranks(ds: rd.Dataset, id_column: str) -> rd.Dataset:
    """Dense 0-based id in current dataset order via a metadata-only
    prefix sum over per-block row counts (the distributed analog of the
    reference's division prefix sums,
    /root/reference/DyableLexonWords/LexonWords.cpp:110-153)."""
    ds = ds.materialize()
    block_refs, offsets = [], []
    total = 0
    for b in ds.iter_internal_ref_bundles():
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


def zip_with_index(ds: rd.Dataset, sort_keys: list[str] | None = None,
                   id_column: str = "doc_id") -> rd.Dataset:
    """Attach a dense 0-based ``id_column`` equal to each row's rank over
    the sorted ``sort_keys`` (FIXTURES.md §1's ``doc_id`` contract).

    Only the KEY COLUMNS are sorted — the wide ``content`` column never
    moves through the sort shuffle (it dominates corpus bytes ~30:1).
    The ranked key table is then broadcast and ids attached map-side.
    Scale path: at corpus sizes where the key table itself is large, the
    broadcast becomes a range-partitioned sort-merge join on the same
    keys; the sort/rank machinery here is unchanged.
    """
    if not sort_keys:
        return _attach_block_ranks(ds, id_column)

    # coalesce before the sort: Ray's sort cost scales with input block
    # count (see BASELINE.md); the key table is narrow so 16 blocks ample
    keys = (ds.select_columns(list(sort_keys))
            .repartition(16)
            .sort(list(sort_keys)))
    ranked = _attach_block_ranks(keys, id_column)
    key_tbl = ranked.to_pandas()
    lut = {tuple(row): i for *row, i in
           key_tbl.itertuples(index=False, name=None)}
    if len(lut) != len(key_tbl):
        # silently collapsing duplicate keys would assign one doc_id to
        # multiple rows and corrupt df/dl/postings — fail loudly instead
        raise ValueError(
            f"zip_with_index: sort keys {sort_keys} are not unique "
            f"({len(key_tbl) - len(lut)} duplicate rows); deduplicate the "
            "corpus or extend the key (the reference renames duplicate "
            "base URLs, IndexLogFile.h:46-53 — see functions/dedup.py)")
    lut_ref = ray.put(lut)

    def _attach_ids(batch: pa.Table) -> pa.Table:
        m = ray.get(lut_ref)
        cols = [batch[k].to_pylist() for k in sort_keys]
        ids = np.fromiter(
            (m[t] for t in zip(*cols)), dtype=np.uint64, count=batch.num_rows)
        return batch.append_column(id_column, pa.array(ids, pa.uint64()))

    return ds.map_batches(_attach_ids, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


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
