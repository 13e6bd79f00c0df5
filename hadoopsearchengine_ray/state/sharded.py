"""Shared plumbing for range-sharded iterative graph plans.

PageRank and WavePass both keep their per-node state as span-sized
object-store shards and iterate scatter (per pinned edge block, pulling
only the src shards the block touches) -> per-dst-shard reduce ->
finalize.  The structural pieces live here so the two algorithms can't
drift (round-2 review finding); each keeps its own row-update math.
"""

from __future__ import annotations

import numpy as np
import ray


def shard_layout(num_nodes: int, shard_span: int | None,
                 default_span: int) -> tuple[int, int]:
    """(num_shards, span) with span re-balanced so shards are even."""
    span = shard_span or default_span
    S = max(1, -(-num_nodes // span))
    return S, -(-num_nodes // S)


def gather_src_rows(src: np.ndarray, shard_refs: list, span: int,
                    width: int | None = None) -> np.ndarray:
    """State rows for every src node, pulling ONLY the shards this
    block references (shard_refs is a list of ObjectRefs — passing it
    as a plain list keeps Ray from materializing every shard)."""
    ss = src // span
    if width is None:
        out = np.empty(len(src), dtype=np.float64)
    else:
        out = np.empty((len(src), width), dtype=np.float64)
    for s in np.unique(ss):
        shard = ray.get(shard_refs[int(s)])
        m = ss == s
        out[m] = shard[src[m] - int(s) * span]
    return out


def scatter_partials(dst: np.ndarray, contrib: np.ndarray, span: int,
                     num_nodes: int) -> dict[int, object]:
    """Per-dst-shard dense partials, each ray.put INDIVIDUALLY (dict of
    refs): a reduce task pulls only its own shard's partials."""
    out: dict[int, object] = {}
    ds = dst // span
    for s in np.unique(ds):
        m = ds == s
        lo = int(s) * span
        size = min(span, num_nodes - lo)
        if contrib.ndim == 1:
            part = np.bincount(dst[m] - lo, weights=contrib[m],
                               minlength=size)
        else:
            part = np.zeros((size, contrib.shape[1]), dtype=np.float64)
            np.add.at(part, dst[m] - lo, contrib[m])
        out[int(s)] = ray.put(part)
    return out


def reduce_partials(shard_id: int, span: int, num_nodes: int,
                    partial_dicts, width: int | None = None) -> np.ndarray:
    """Sum the scatter partials addressed to one shard (fixed task order
    -> deterministic float accumulation per layout)."""
    lo = shard_id * span
    size = min(span, num_nodes - lo)
    acc = (np.zeros(size, dtype=np.float64) if width is None
           else np.zeros((size, width), dtype=np.float64))
    for d in partial_dicts:
        ref = d.get(shard_id)
        if ref is not None:
            acc += ray.get(ref)
    return acc
