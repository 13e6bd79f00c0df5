"""PulseRank: the reference's PageRank variant over the link table.

Semantics from /root/reference/DyableWebGraph/DyablePuleRank/: scatter
``score(src) * link_weight`` to each dst (DistributePulseScores.cpp:34-65),
gather-sum per node (AccumulateHashDivision.cpp:46-105), then normalize by
the global net score (:83-105) — NO damping teleport.  20 cycles
(``PULSE_RANK_CYCLES``, DyableCommand/DyableCommand.cpp:37).

Ray shape per cycle: the score vector is broadcast once via ``ray.put``
(small side — one float64 per node), the link Dataset is scanned with a
``map_batches`` that does a within-batch ``bincount`` partial aggregation
(map-side combine), and a ``groupby('dst').sum`` merges partials.  The
driver holds only the (num_nodes)-sized vector, never the edge set.

Scale note: at 10^12 nodes the vector itself must shard — broadcast one
``ray.put`` chunk per node range and route batches by dst range (the
reference's hash divisions, ``node % hash_div``,
DistributePulseScores.cpp:57).  The per-cycle dataflow is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

CYCLES = 20  # PULSE_RANK_CYCLES


def pagerank(links: rd.Dataset, num_nodes: int, cycles: int = CYCLES) -> np.ndarray:
    """links (src, dst, weight) -> per-node score vector after `cycles`."""
    score = np.ones(num_nodes, dtype=np.float64)
    links = links.materialize()  # iterated `cycles` times — pin blocks once

    for _ in range(cycles):
        score_ref = ray.put(score)

        def _scatter(batch: pa.Table, *, _ref=score_ref) -> pa.Table:
            s = ray.get(_ref)
            src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
            contrib = s[src] * w
            uniq, inv = np.unique(dst, return_inverse=True)
            part = np.bincount(inv, weights=contrib)
            return pa.table({
                "dst": pa.array(uniq, pa.int64()),
                "part": pa.array(part, pa.float64()),
            })

        from ray.data.aggregate import Sum

        agg = (
            links.map_batches(_scatter, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("dst")
            .aggregate(Sum("part", alias_name="score"))
        )
        tbl = agg.to_pandas()
        nxt = np.zeros(num_nodes, dtype=np.float64)
        if len(tbl):  # empty link set -> all-zero next scores
            nxt[tbl["dst"].to_numpy()] = tbl["score"].to_numpy()
        net = nxt.sum()
        if net > 0:
            nxt *= num_nodes / net
        score = nxt
    return score


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
