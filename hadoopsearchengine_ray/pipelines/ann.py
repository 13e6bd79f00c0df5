"""Persistent IVF-PQ ANN index: build once, serve many queries.

Mirrors the text index's layout discipline (one directory per component,
a JSON manifest, partitioned data files): the compressed codes table is
written PARTITIONED BY list_id, so a query's nprobe list scan is a
partition-PRUNED parquet read — only the probed lists' files leave
storage, the exact analog of the term-sharded posting read
(/root/reference/DyableRequest/SearchHitItems's hit-division routing).

State sizes: centroids (num_lists x dim) and codebooks (m x ksub x
dim/m) are KBs — loaded once per reader; the codes table is m bytes per
vector.  Raw vectors stay in the SOURCE table and are touched only for
the bounded exact re-rank fetch.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.similarity import (
    _adc_scan_fn,
    _exact_rerank,
    _norm_rows,
    _rerank_candidate_ids,
    _top_candidates,
    kmeans_centroids,
    pq_encode,
    pq_train,
)


def build_ann_index(parquet_path: str, index_dir: str, num_lists: int = 16,
                    m: int = 8, ksub: int = 64, iters: int = 5,
                    dim: int = 64, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> dict:
    """Train quantizers and write the codes-only index to disk.

    Layout: ``codes/list_id=<i>/*.parquet`` (partition-pruned at query
    time), ``quantizers.parquet`` (centroids + codebooks as flat float
    rows), ``meta.json``.  Returns the manifest dict."""
    emb = rd.read_parquet(parquet_path, columns=[id_col, vec_col])
    cents = kmeans_centroids(emb, num_lists, iters, vec_col, id_col, dim)
    cbs = pq_train(emb, m=m, ksub=ksub, vec_col=vec_col, id_col=id_col,
                   dim=dim)

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    codes = pq_encode(emb, cbs, cents, vec_col, id_col)
    codes.write_parquet(os.path.join(index_dir, "codes"),
                        partition_cols=["list_id"])

    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "kind": pa.array(["centroids"] * len(cents)
                         + ["codebook"] * (m * cbs.shape[1])),
        "i": pa.array(list(range(len(cents)))
                      + [j for j in range(m) for _ in range(cbs.shape[1])],
                      pa.int64()),
        "j": pa.array([0] * len(cents)
                      + list(range(cbs.shape[1])) * m, pa.int64()),
        "vec": pa.array([r.tolist() for r in cents]
                        + [cbs[j][c].tolist() for j in range(m)
                           for c in range(cbs.shape[1])],
                        pa.list_(pa.float64())),
    }), os.path.join(index_dir, "quantizers.parquet"))
    meta = {"num_lists": int(num_lists), "m": int(m),
            "ksub": int(cbs.shape[1]), "dim": int(dim),
            "id_col": id_col, "vec_col": vec_col,
            "source": parquet_path}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


class AnnIndex:
    """Reader over a built ANN index dir: tiny quantizer state in
    memory, codes read per query with list_id partition pruning."""

    def __init__(self, index_dir: str):
        import pyarrow.parquet as pq

        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        t = pq.read_table(os.path.join(index_dir, "quantizers.parquet"))
        # the quantizer table is KBs (num_lists + m*ksub rows) — a
        # driver-side pylist decode is fine here, unlike the hot maps
        kind = np.asarray(t["kind"].to_pylist())
        ii = t["i"].to_numpy()
        jj = t["j"].to_numpy()
        vecs = t["vec"].to_pylist()
        cm = kind == "centroids"
        cidx = np.flatnonzero(cm)[np.argsort(ii[cm])]
        self.centroids = np.stack([np.asarray(vecs[i], np.float64)
                                   for i in cidx])
        m, ksub = self.meta["m"], self.meta["ksub"]
        cb = np.empty((m, ksub, self.meta["dim"] // m), np.float64)
        for r in np.flatnonzero(~cm):
            cb[ii[r], jj[r]] = np.asarray(vecs[r], np.float64)
        self.codebooks = cb

    def query(self, queries: np.ndarray, k: int = 10, nprobe: int = 12,
              rerank: int = 8) -> pd.DataFrame:
        """(qid, rank, vec_id): ADC scan over ONLY the probed list
        partitions, then exact re-rank of the top rerank*k candidates
        against the source table (bounded fetch)."""
        meta = self.meta
        m = meta["m"]
        dsub = meta["dim"] // m
        q = _norm_rows(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        luts = np.einsum("qjd,jcd->qjc", q.reshape(len(q), m, dsub),
                         self.codebooks)
        q_ref = ray.put((luts, probe))
        r_cand = max(k, rerank * k)
        id_col = meta["id_col"]

        from ray.data.datasource.partitioning import (
            Partitioning,
            PartitionStyle,
            PathPartitionFilter,
        )

        probed = {int(x) for x in np.unique(probe)}
        # partition-pruned read: the hive list_id filter runs against
        # DIRECTORY NAMES before any file opens — unprobed lists cost
        # nothing, the analog of the text index's term-shard routing
        part = Partitioning(PartitionStyle.HIVE,
                            field_types={"list_id": int})
        pf = PathPartitionFilter.of(
            lambda kv: int(kv["list_id"]) in probed,
            style=PartitionStyle.HIVE)
        cand = (rd.read_parquet(
                    os.path.join(self.index_dir, "codes"),
                    partition_filter=pf, partitioning=part)
                .map_batches(_adc_scan_fn(q_ref, m, r_cand, id_col),
                             batch_format="pyarrow",
                             zero_copy_batch=True)
                .to_pandas())

        # exact re-rank against the SOURCE table: fetch only the
        # bounded candidate set
        top = _top_candidates(cand, r_cand)
        cand_ids = _rerank_candidate_ids(top)
        vecs = (rd.read_parquet(meta["source"],
                                columns=[id_col, meta["vec_col"]])
                .filter(expr=f"{id_col} in {cand_ids}")
                .to_pandas())
        return _exact_rerank(top, vecs, q, k, id_col, meta["vec_col"])
