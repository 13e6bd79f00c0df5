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


def _load_quantizers(index_dir: str, meta: dict) -> tuple[np.ndarray, np.ndarray]:
    """(centroids, codebooks) from quantizers.parquet — KBs of state
    (num_lists + m*ksub rows), shared by the per-query Dataset reader
    and the pinned serving pool."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, "quantizers.parquet"))
    # the quantizer table is KBs — a driver-side pylist decode is fine
    # here, unlike the hot maps
    kind = np.asarray(t["kind"].to_pylist())
    ii = t["i"].to_numpy()
    jj = t["j"].to_numpy()
    vecs = t["vec"].to_pylist()
    cm = kind == "centroids"
    cidx = np.flatnonzero(cm)[np.argsort(ii[cm])]
    centroids = np.stack([np.asarray(vecs[i], np.float64) for i in cidx])
    m, ksub = meta["m"], meta["ksub"]
    cb = np.empty((m, ksub, meta["dim"] // m), np.float64)
    for r in np.flatnonzero(~cm):
        cb[ii[r], jj[r]] = np.asarray(vecs[r], np.float64)
    return centroids, cb


class AnnIndex:
    """Reader over a built ANN index dir: tiny quantizer state in
    memory, codes read per query with list_id partition pruning."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.centroids, self.codebooks = _load_quantizers(index_dir,
                                                          self.meta)

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
        if top.empty:
            from ..functions.similarity import _empty_knn_frame
            return _empty_knn_frame()
        cand_ids = _rerank_candidate_ids(top)
        vecs = (rd.read_parquet(meta["source"],
                                columns=[id_col, meta["vec_col"]])
                .filter(expr=f"{id_col} in {cand_ids}")
                .to_pandas())
        return _exact_rerank(top, vecs, q, k, id_col, meta["vec_col"])


@ray.remote
class _AnnListOwner:
    """One IVF-list-range owner of the ANN serving tier: pins its lists'
    code table AND the corresponding raw vectors in memory once, answers
    batched ADC scans without touching storage.

    The vector analog of pool.py's ``_RangeScorer`` (the reference's
    long-lived SearchHitItems servers with their warm CHitItemBlock
    cache, /root/reference/FileStorage.h:2105-2170): ``AnnIndex.query``
    plans a fresh partition-pruned Ray Dataset job per query (~1.6 s of
    scheduling overhead at any corpus size); an owner answers from RAM.

    Memory per owner: codes are m bytes/vector, pinned raw vectors are
    dim x 8 bytes/vector, each over 1/num_owners of the corpus —
    num_owners scales with nodes while the on-disk layout stays fixed.
    Init reads the codes via a hive-pruned read of ONLY the owned list
    partitions; the raw-vector pinning is one filtered scan of the
    source table (at 100-TB scale, write a vectors/list_id=<i> copy at
    build time to make this read partition-pruned too)."""

    def __init__(self, index_dir: str, list_ids: list[int]):
        import pyarrow.dataset as pads

        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = json.load(f)
        self.m = int(meta["m"])
        id_col = meta["id_col"]
        owned = sorted(int(x) for x in list_ids)
        parts = [os.path.join(index_dir, "codes", f"list_id={i}")
                 for i in owned]
        # drop empty lists from BOTH sequences in lockstep — filtering
        # only `parts` would shift the zip and mislabel every code
        # after an empty IVF list
        pairs = [(li, p) for li, p in zip(owned, parts) if os.path.isdir(p)]
        if pairs:
            owned, parts = zip(*pairs)
            tbls = [pads.dataset(p).to_table() for p in parts]
            ids, codes, lists = [], [], []
            for li, t in zip(owned, tbls):
                n = t.num_rows
                ids.append(t[id_col].to_numpy(zero_copy_only=False)
                           .astype(np.int64))
                codes.append(t["code"].combine_chunks().flatten()
                             .to_numpy(zero_copy_only=False)
                             .reshape(n, self.m).astype(np.int64))
                lists.append(np.full(n, li, np.int64))
            self.ids = np.concatenate(ids)
            self.codes = np.ascontiguousarray(np.concatenate(codes))
            self.lists = np.concatenate(lists)
        else:
            self.ids = np.empty(0, np.int64)
            self.codes = np.empty((0, self.m), np.int64)
            self.lists = np.empty(0, np.int64)
        # pin RAW vectors (float64) for the owned ids: _exact_rerank
        # normalizes them itself, so the driver-side rerank arithmetic
        # is bit-identical to the Dataset path's source-table fetch
        self.vecs = np.empty((0, int(meta["dim"])), np.float64)
        if len(self.ids):
            src = pads.dataset(meta["source"]).to_table(
                columns=[id_col, meta["vec_col"]],
                filter=pads.field(id_col).isin(self.ids.tolist()))
            sid = src[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            from ..functions.similarity import _vec_matrix
            sv = _vec_matrix(src[meta["vec_col"]])
            # align pinned rows to self.ids order (every coded id exists
            # in the source — codes were built from it)
            order = np.argsort(sid)
            self.vecs = np.ascontiguousarray(
                sv[order][np.searchsorted(sid[order], self.ids)])
        self._jj = np.arange(self.m)

    def query_many(self, luts: np.ndarray, probe: np.ndarray, r_cand: int):
        """Per query: (ids, adc_sims, raw candidate vectors) for the
        owner-local top ``r_cand`` by (sim DESC, id ASC) — a superset of
        this owner's members of the global top, so the driver's merged
        _top_candidates selection is exact."""
        out = []
        for qi in range(luts.shape[0]):
            mask = np.isin(self.lists, probe[qi])
            if not mask.any():
                out.append((np.empty(0, np.int64), np.empty(0, np.float64),
                            np.empty((0, self.vecs.shape[1]), np.float64)))
                continue
            # identical gather+sum expression to _adc_scan_fn so the ADC
            # candidate ordering matches the Dataset path bit-for-bit
            sim = luts[qi][self._jj[None, :], self.codes[mask]].sum(axis=1)
            sel = np.flatnonzero(mask)
            order = np.lexsort((self.ids[sel], -sim))[:r_cand]
            pick = sel[order]
            out.append((self.ids[pick], sim[order], self.vecs[pick]))
        return out


class AnnPool:
    """Pinned ANN serving pool: N list-owner actors + the same
    _top_candidates/_exact_rerank merge as AnnIndex.query — rank-
    identical to the per-query-Dataset path (asserted in
    tests/test_operators.py::test_ann_pool_rank_identical_to_dataset_path
    / test_ann_pool_with_empty_ivf_lists and the ann_index driver query), at
    in-memory latency (no per-query Ray Dataset job)."""

    def __init__(self, index_dir: str, num_owners: int = 4):
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.centroids, self.codebooks = _load_quantizers(index_dir,
                                                          self.meta)
        nl = int(self.meta["num_lists"])
        num_owners = max(1, min(num_owners, nl))
        # round-robin list assignment spreads hot lists across owners
        slices = [[li for li in range(nl) if li % num_owners == o]
                  for o in range(num_owners)]
        self.owners = [_AnnListOwner.remote(index_dir, s)
                       for s in slices if s]

    def query(self, queries: np.ndarray, k: int = 10, nprobe: int = 12,
              rerank: int = 8) -> pd.DataFrame:
        meta = self.meta
        m = int(meta["m"])
        dsub = int(meta["dim"]) // m
        q = _norm_rows(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        luts = np.einsum("qjd,jcd->qjc", q.reshape(len(q), m, dsub),
                         self.codebooks)
        r_cand = max(k, rerank * k)
        per_owner = ray.get([o.query_many.remote(luts, probe, r_cand)
                             for o in self.owners])
        id_col, vec_col = meta["id_col"], meta["vec_col"]
        qids, ids, sims, vrows = [], [], [], []
        for owner_out in per_owner:
            for qi, (oid, osim, ovec) in enumerate(owner_out):
                qids.append(np.full(len(oid), qi, np.int64))
                ids.append(oid)
                sims.append(osim)
                vrows.append(ovec)
        cand = pd.DataFrame({
            "qid": np.concatenate(qids) if qids else np.empty(0, np.int64),
            "vec_id": np.concatenate(ids) if ids else np.empty(0, np.int64),
            "sim": np.concatenate(sims) if sims else np.empty(0, np.float64),
        })
        top = _top_candidates(cand, r_cand)
        if top.empty:
            from ..functions.similarity import _empty_knn_frame
            return _empty_knn_frame()
        # candidate raw vectors came back with the RPC (each vec owned by
        # exactly one owner, so ids are unique across owners); dedupe
        # rows repeated across queries for the _exact_rerank fetch frame
        allv = np.concatenate(vrows) if vrows else np.empty((0, 0))
        allid = cand["vec_id"].to_numpy()
        uniq, first = np.unique(allid, return_index=True)
        vecs = pd.DataFrame({id_col: uniq.astype(np.int64),
                             vec_col: list(allv[first])})
        return _exact_rerank(top, vecs, q, k, id_col, vec_col)

    def shutdown(self):
        for o in self.owners:
            ray.kill(o)
        self.owners = []
