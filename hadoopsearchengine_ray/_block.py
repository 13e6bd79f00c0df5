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
