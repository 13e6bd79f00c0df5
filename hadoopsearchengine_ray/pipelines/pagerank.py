"""PulseRank: the reference's PageRank variant over the link table.

Semantics from /root/reference/DyableWebGraph/DyablePuleRank/: scatter
``score(src) * link_weight`` to each dst (DistributePulseScores.cpp:34-65),
gather-sum per node (AccumulateHashDivision.cpp:46-105), then normalize by
the global net score (:83-105) — NO damping teleport.  20 cycles
(``PULSE_RANK_CYCLES``, DyableCommand/DyableCommand.cpp:37).

Two physical plans, chosen by node count:

- **dense partials** (node vector fits in one worker's heap, up to
  ~4M nodes here): the edge blocks are pinned in the object store ONCE;
  each cycle launches one Ray task per edge block that returns a dense
  ``bincount`` partial, and the driver sums the few partials.  20 cycles
  cost 20 × n_blocks small tasks — no per-cycle Dataset/shuffle overhead
  (a 60x win over the groupby plan at 100k nodes).
- **grouped shuffle** (huge node spaces): per-cycle
  ``map_batches(partial bincount per dst) -> groupby(dst).sum`` — the
  reference's hash-division scatter (``node % hash_div``,
  DistributePulseScores.cpp:57), with map-side combining.  At real scale
  the score vector would also shard by node range (one broadcast chunk
  per range); that routing is the documented extension, not built here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

CYCLES = 20             # PULSE_RANK_CYCLES
DENSE_MAX_NODES = 4_000_000   # 32 MB float64 vector per task


from .._block import column_np


@ray.remote
def _scatter_dense(block, score: np.ndarray, num_nodes: int) -> np.ndarray:
    src = column_np(block, "src", np.int64)
    dst = column_np(block, "dst", np.int64)
    w = column_np(block, "weight", np.float64)
    return np.bincount(dst, weights=score[src] * w, minlength=num_nodes)


def _pagerank_dense(links: rd.Dataset, num_nodes: int, cycles: int) -> np.ndarray:
    from .._block import nonempty_block_refs

    block_refs = nonempty_block_refs(links.materialize())
    score = np.ones(num_nodes, dtype=np.float64)
    for _ in range(cycles):
        score_ref = ray.put(score)
        parts = ray.get([_scatter_dense.remote(b, score_ref, num_nodes)
                         for b in block_refs])
        nxt = np.sum(parts, axis=0) if parts else np.zeros(num_nodes)
        net = nxt.sum()
        if net > 0:
            nxt *= num_nodes / net
        score = nxt
    return score


@ray.remote
def _scatter_sharded(block, score_shards: list, span: int, num_shards: int,
                     num_nodes: int) -> dict[int, np.ndarray]:
    """Per edge-block scatter: pulls ONLY the src score shards this block
    references, returns per-dst-shard partials as a dict of refs (shared
    plumbing in state/sharded.py)."""
    from ..state.sharded import gather_src_rows, scatter_partials

    src = column_np(block, "src", np.int64)
    dst = column_np(block, "dst", np.int64)
    w = column_np(block, "weight", np.float64)
    contrib = gather_src_rows(src, score_shards, span) * w
    return scatter_partials(dst, contrib, span, num_nodes)


@ray.remote
def _reduce_shard(shard_id: int, span: int, num_nodes: int,
                  *partial_dicts) -> tuple[np.ndarray, float]:
    """Sum the scatter partials addressed to one dst shard (fixed task
    order -> deterministic float accumulation per layout)."""
    from ..state.sharded import reduce_partials

    acc = reduce_partials(shard_id, span, num_nodes, partial_dicts)
    return acc, float(acc.sum())


@ray.remote
def _scale_shard(shard: np.ndarray, factor: float) -> np.ndarray:
    return shard * factor


def _pagerank_sharded(links: rd.Dataset, num_nodes: int, cycles: int,
                      shard_span: int | None = None) -> np.ndarray:
    """Range-sharded big-graph plan: the score vector lives in the object
    store as S span-sized shards; every cycle is scatter tasks (one per
    pinned edge block, pulling only the src shards it touches) -> one
    reduce task per dst shard -> a scalar net-sum on the driver -> scale
    tasks.  The driver holds ONLY object refs and per-shard sums (O(S)),
    never a num_nodes-sized array, until the final assembly for the
    caller — the reference's hash-division scatter
    (DistributePulseScores.cpp:34-65) with divisions as Ray objects.  At
    real scale the final assembly would stay sharded (write per-shard
    parquet); the return type materializes for API compat with the dense
    path."""
    from .._block import nonempty_block_refs
    from ..state.sharded import shard_layout

    S, span = shard_layout(num_nodes, shard_span, DENSE_MAX_NODES)
    block_refs = nonempty_block_refs(links.materialize())

    shard_refs = [
        ray.put(np.ones(min(span, num_nodes - s * span), dtype=np.float64))
        for s in range(S)
    ]
    for _ in range(cycles):
        partials = [
            _scatter_sharded.remote(b, shard_refs, span, S, num_nodes)
            for b in block_refs
        ]
        reduced = [
            _reduce_shard.remote(s, span, num_nodes, *partials)
            for s in range(S)
        ]
        sums = ray.get([_shard_sum.remote(r) for r in reduced])
        net = float(np.sum(sums))
        factor = (num_nodes / net) if net > 0 else 1.0
        shard_refs = [
            _scale_shard.remote(_shard_vec.remote(r), factor) for r in reduced
        ]
    return np.concatenate(ray.get(shard_refs)) if S else np.empty(0)


@ray.remote
def _shard_vec(rv: tuple) -> np.ndarray:
    return rv[0]


@ray.remote
def _shard_sum(rv: tuple) -> float:
    return rv[1]


def pagerank(links: rd.Dataset, num_nodes: int, cycles: int = CYCLES,
             force_grouped: bool = False,
             shard_span: int | None = None) -> np.ndarray:
    """links (src, dst, weight) -> per-node score vector after `cycles`.

    <= DENSE_MAX_NODES: dense-partial plan (one vector per task).
    Bigger (or force_grouped): range-sharded plan — driver holds O(S)
    refs, never the node table."""
    if num_nodes <= DENSE_MAX_NODES and not force_grouped:
        return _pagerank_dense(links, num_nodes, cycles)
    return _pagerank_sharded(links, num_nodes, cycles, shard_span)


def pagerank_dataset(links: rd.Dataset, num_nodes: int,
                     cycles: int = CYCLES) -> rd.Dataset:
    """Same, returned as a Dataset (doc_id, pr_score) for joining into the
    ranking pipeline (the reference attaches pulse_score to every posting,
    SHitItem.pulse_score, FileStorage.h:329; we keep it a separate table)."""
    score = pagerank(links, num_nodes, cycles)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(num_nodes, dtype=np.uint64), pa.uint64()),
        "pr_score": pa.array(score, pa.float64()),
    })
    return rd.from_arrow(tbl)
