"""Internal: format-agnostic access to Ray Data block columns.

Blocks obtained via ``iter_internal_ref_bundles`` are Arrow tables OR
pandas DataFrames depending on which operator produced them (e.g.
``map_groups(batch_format="pandas")`` yields pandas blocks).  The
iterative pipelines (PageRank, WavePass, dedup components) consume raw
blocks, so they go through this shim.
"""

from __future__ import annotations

import numpy as np


def nonempty_block_refs(ds) -> list:
    """Block refs of a MATERIALIZED dataset, skipping zero-row blocks.

    Empty blocks from a ``groupby().map_groups`` with more groups than
    rows carry a schema-less empty pandas frame — ``block["col"]`` would
    raise KeyError inside the per-block tasks (the round-1
    ``dedup_clusters`` driver failure).  Filtering on metadata.num_rows
    costs nothing and removes the hazard for every iterative pipeline."""
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    return refs


def column_np(block, name: str, dtype=None) -> np.ndarray:
    """Column of an Arrow-or-pandas block as a numpy array."""
    import pyarrow as pa

    if isinstance(block, pa.Table):
        arr = block[name].to_numpy(zero_copy_only=False)
    else:  # pandas DataFrame
        arr = block[name].to_numpy()
    return arr.astype(dtype) if dtype is not None else arr


def blocks_for_bytes(total_bytes: int | None, target_bytes: int = 256 << 20,
                     floor: int = 16, cap: int = 4096) -> int:
    """Bytes-derived block/partition count: ceil(total/target), clamped.

    The floor keeps the measured single-box sweet spots (BASELINE.md:
    ~16 blocks minimizes the sort-aggregate's block-count overhead at
    sandbox scale); the bytes term takes over once the input outgrows
    floor * target, so a 100x corpus no longer funnels through a fixed
    16 blocks (round-2 verdict, What's wrong #4)."""
    if not total_bytes or total_bytes <= 0:
        return floor
    need = -(-int(total_bytes) // int(target_bytes))  # ceil div
    return max(floor, min(cap, need))


def dir_bytes(path: str) -> int:
    """Total on-disk bytes under a directory — or of a plain file
    (single-parquet corpora size the same way)."""
    import os

    if os.path.isfile(path):
        try:
            return os.path.getsize(path)
        except OSError:
            return 0
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total
