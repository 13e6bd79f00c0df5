"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exact baseline: the query matrix is
broadcast once (``ray.put``), every batch computes a numpy matmul and
emits only its local top-k candidates per query (map-side combine), and a
final small sort picks the global top-k.  The LSH-bucketed variant is the
scale path: random-hyperplane signatures bucket vectors so each query
probes only its bucket (+ multiprobe neighbors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _vec_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix view of a list<float> / fixed_size_list
    vector column — flatten + reshape, no per-row Python objects (the
    round-2 ``to_pylist()`` sites churned every vector through Python
    lists in the hot map stages)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(n, dim).astype(np.float64, copy=False)
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    widths = np.diff(offs)
    if n == 0:
        return np.empty((0, 0), np.float64)
    dim = int(widths[0])
    if not (widths == dim).all():
        raise ValueError("ragged vector column (rows of unequal dim)")
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, dim).astype(np.float64, copy=False)


def knn_cosine(embeddings: rd.Dataset, queries: np.ndarray, k: int = 10,
               vec_col: str = "embedding", id_col: str = "vec_id") -> pd.DataFrame:
    """Exact cosine top-k: returns (qid, rank, vec_id) int64 columns.

    Ties broken by ascending vec_id; scores float64 internally only (kept
    out of the comparable output)."""
    q = _norm_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def _local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _norm_rows(_vec_matrix(batch[vec_col]))
        sims = m @ qm.T                       # (batch, nq)
        kk = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            s = sims[:, qi]
            if len(s) > kk:
                # keep ALL rows tied with the local k-th score so the
                # global (sim desc, vec_id asc) sort stays deterministic
                # when duplicate embeddings straddle the boundary
                kth = np.partition(s, len(s) - kk)[len(s) - kk]
                part = np.flatnonzero(s >= kth)
            else:
                part = np.arange(len(s))
            out_q.append(np.full(len(part), qi, np.int64))
            out_id.append(ids[part])
            out_s.append(s[part])
        return pa.table({
            "qid": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    cand = embeddings.map_batches(_local_topk, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
    rows = []
    for qi, g in cand.groupby("qid"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        for rank, vid in enumerate(g["vec_id"], start=1):
            rows.append((int(qi), rank, int(vid)))
    return pd.DataFrame(rows, columns=["qid", "rank", "vec_id"])


def mmr_topk(embeddings: rd.Dataset, query: np.ndarray, k: int = 10,
             k_prime: int = 100, lam: float = 0.7,
             vec_col: str = "embedding", id_col: str = "vec_id") -> pd.DataFrame:
    """Maximal-Marginal-Relevance diversified retrieval: exact cosine
    top-``k_prime`` candidates (distributed local-topk, same shape as
    knn_cosine), then the greedy MMR selection
    ``argmax lam*sim(q,d) - (1-lam)*max_{s in selected} sim(d,s)``
    (ties: higher sim(q,d), then lower vec_id) over the BOUNDED
    candidate set on the driver.  Returns (rank, vec_id) int64.

    The candidate vectors ride the local-topk output (k_prime rows per
    block, not the corpus), so the driver never holds more than
    ~k_prime * blocks rows."""
    q = _norm_rows(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    q_ref = ray.put(q)

    def _local(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _norm_rows(_vec_matrix(batch[vec_col]))
        s = m @ qv
        kk = min(k_prime, len(ids))
        if len(s) > kk:
            kth = np.partition(s, len(s) - kk)[len(s) - kk]
            part = np.flatnonzero(s >= kth)
        else:
            part = np.arange(len(s))
        flat = m[part].reshape(-1)
        return pa.table({
            id_col: pa.array(ids[part], pa.int64()),
            "sim": pa.array(s[part], pa.float64()),
            "nvec": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.float64()), m.shape[1]),
        })

    cand = embeddings.map_batches(_local, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
    cand = cand.sort_values(["sim", id_col],
                            ascending=[False, True]).head(k_prime)
    ids = cand[id_col].to_numpy(dtype=np.int64)
    sims = cand["sim"].to_numpy(dtype=np.float64)
    mat = np.asarray([np.asarray(v, np.float64) for v in cand["nvec"]])
    n = len(ids)
    picked: list[int] = []
    max_sel = np.full(n, -np.inf)
    active = np.ones(n, bool)
    for _ in range(min(k, n)):
        pen = np.where(np.isfinite(max_sel), max_sel, 0.0)
        score = lam * sims - (1.0 - lam) * pen
        score[~active] = -np.inf
        # deterministic: best MMR score, then higher query-sim, then id
        best = np.lexsort((ids, -sims, -score))[0]
        picked.append(best)
        active[best] = False
        max_sel = np.maximum(max_sel, mat @ mat[best])
    return pd.DataFrame({
        "rank": pd.array(range(1, len(picked) + 1), dtype="int64"),
        "vec_id": pd.array(ids[picked], dtype="int64"),
    })


def lsh_buckets(embeddings: rd.Dataset, num_planes: int = 8, seed: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id",
                dim: int = 64) -> rd.Dataset:
    """Random-hyperplane LSH bucket id per vector (the IVF/LSH scale path:
    a query probes one bucket instead of the full set)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    p_ref = ray.put(planes)

    def _bucket(batch: pa.Table) -> pa.Table:
        pl = ray.get(p_ref)
        m = _vec_matrix(batch[vec_col])
        bits = (m @ pl.T) > 0
        bucket = bits @ (1 << np.arange(pl.shape[0]))
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
        })

    return embeddings.map_batches(_bucket, batch_format="pyarrow",
                                  zero_copy_batch=True)


def _verify_bucket_pairs(g: pa.Table, id_col: str, sim_threshold: float,
                         max_bucket: int) -> pa.Table:
    """All-pairs cosine verify inside one LSH bucket; oversized buckets
    skip LOUDLY (stderr) instead of dropping pairs silently."""
    empty = pa.table({"d1": pa.array([], pa.int64()),
                      "d2": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64())})
    if g.num_rows < 2 or id_col not in g.column_names:
        return empty
    ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) > max_bucket:
        import sys
        print(f"[embedding_near_dup] WARNING: bucket with {len(ids)} "
              f"vectors exceeds max_bucket={max_bucket} and was "
              "skipped (potential false negatives) — raise "
              "num_planes or max_bucket", file=sys.stderr)
        return empty
    m = _vec_matrix(g["vec"])
    sims = m @ m.T
    i, j = np.triu_indices(len(ids), k=1)
    keep = sims[i, j] >= sim_threshold
    return pa.table({
        "d1": pa.array(np.minimum(ids[i][keep], ids[j][keep]), pa.int64()),
        "d2": pa.array(np.maximum(ids[i][keep], ids[j][keep]), pa.int64()),
        "sim": pa.array(np.round(sims[i, j][keep], 4), pa.float64()),
    })


def embedding_near_dup(embeddings: rd.Dataset, sim_threshold: float = 0.98,
                       num_planes: int = 10, num_tables: int = 4, seed: int = 5,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id", dim: int = 64,
                       max_bucket: int = 1000) -> rd.Dataset:
    """Near-duplicate vector pairs by cosine >= threshold, LSH-bucketed:
    ``num_tables`` independent hyperplane signatures (union of buckets
    recovers pairs split by any single table's boundary), all-pairs
    verification inside buckets only.

    Buckets over ``max_bucket`` vectors are SKIPPED loudly (stderr, like
    dedup.shingle_overlap_pairs' df cap): an oversized bucket means a
    hot region whose quadratic verify would dominate — raise num_planes
    (finer buckets) or max_bucket for dup-heavy corpora.  The normalized
    vectors ride the shuffle as a fixed_size_list column (flatten /
    reshape on both ends, no per-row Python lists)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    p_ref = ray.put(planes)

    def _with_bucket(batch: pa.Table) -> pa.Table:
        pl = ray.get(p_ref)
        mn = _norm_rows(_vec_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = pl.shape[0]
        out_id, out_bucket = [], []
        for t in range(nt):
            bits = (mn @ pl[t].T) > 0
            bucket = bits @ (1 << np.arange(pl.shape[1]))
            out_id.append(ids)
            out_bucket.append(t * (1 << pl.shape[1]) + bucket.astype(np.int64))
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(mn.ravel(), nt), pa.float64()), mn.shape[1])
        return pa.table({
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "bucket": pa.array(np.concatenate(out_bucket), pa.int64()),
            "vec": vec,
        })

    def _pairs(g: pa.Table) -> pa.Table:
        return _verify_bucket_pairs(g, id_col, sim_threshold, max_bucket)

    from ray.data.aggregate import Max

    pairs = (embeddings.map_batches(_with_bucket, batch_format="pyarrow",
                                    zero_copy_batch=True)
             .groupby("bucket")
             .map_groups(_pairs, batch_format="pyarrow"))
    return pairs.groupby(["d1", "d2"]).aggregate(Max("sim", alias_name="sim"))


def kmeans_centroids(embeddings: rd.Dataset, k: int = 64, iters: int = 5,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     dim: int = 64) -> np.ndarray:
    """Deterministic mini k-means over the (normalized) vectors — the
    IVF coarse quantizer.  Init = every (n/k)-th vector by id order;
    each Lloyd iteration is one map_batches pass emitting per-centroid
    partial sums/counts (map-side combine; the k x dim reduce is tiny
    and happens on the driver — centroids are broadcast state, the same
    shape as PageRank's score vector)."""
    import pyarrow.compute as pc

    n = embeddings.count()
    if n == 0:
        raise ValueError("kmeans_centroids: empty embeddings dataset — "
                         "nothing to train the coarse quantizer on")
    stride = max(1, n // k)

    def _seed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ids % stride == 0) & (ids // stride < k)
        return batch.filter(pa.array(keep))

    seeds = (embeddings.map_batches(_seed, batch_format="pyarrow",
                                    batch_size=None).to_pandas()
             .sort_values(id_col))
    cents = _norm_rows(np.asarray(list(seeds[vec_col])[:k], dtype=np.float64))

    for _ in range(iters):
        c_ref = ray.put(cents)

        def _partial(batch: pa.Table, *, _c=c_ref) -> pa.Table:
            c = ray.get(_c)
            m = _norm_rows(_vec_matrix(batch[vec_col]))
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            cnt = np.bincount(assign, minlength=len(c))
            return pa.table({
                "cid": pa.array(np.arange(len(c)), pa.int64()),
                "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            })

        parts = embeddings.map_batches(_partial, batch_format="pyarrow",
                                       batch_size=None).to_pandas()
        sums = np.zeros_like(cents)
        cnts = np.zeros(len(cents), np.int64)
        for r in parts.itertuples():
            sums[r.cid] += np.asarray(r.vsum)
            cnts[r.cid] += r.cnt
        nz = cnts > 0
        cents[nz] = _norm_rows(sums[nz] / cnts[nz, None])
    return cents


def ivf_assign(embeddings: rd.Dataset, centroids: np.ndarray,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> rd.Dataset:
    """Attach the IVF list id (nearest centroid by cosine) per vector."""
    c_ref = ray.put(centroids)

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _norm_rows(_vec_matrix(batch[vec_col]))
        return batch.append_column(
            "list_id", pa.array(np.argmax(m @ c.T, axis=1), pa.int64()))

    return embeddings.map_batches(_assign, batch_format="pyarrow",
                                  zero_copy_batch=True)


def ivf_knn(embeddings: rd.Dataset, queries: np.ndarray, k: int = 10,
            nprobe: int = 8, num_lists: int = 64, iters: int = 5,
            vec_col: str = "embedding", id_col: str = "vec_id",
            dim: int = 64) -> pd.DataFrame:
    """Approximate cosine top-k via IVF: train the coarse quantizer,
    assign vectors to inverted lists, then scan ONLY the ``nprobe``
    closest lists per query (the scale path: work ~ nprobe/num_lists of
    brute force).  Returns (qid, rank, vec_id) like knn_cosine; recall
    depends on nprobe (self-checked in the driver query)."""
    cents = kmeans_centroids(embeddings, num_lists, iters, vec_col,
                             id_col, dim)
    assigned = ivf_assign(embeddings, cents, vec_col, id_col).materialize()
    q = _norm_rows(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]   # (nq, nprobe)
    probe_union = np.unique(probe)
    q_ref = ray.put((q, probe))

    def _scan(batch: pa.Table) -> pa.Table:
        qm, pr = ray.get(q_ref)
        lists = batch["list_id"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _norm_rows(_vec_matrix(batch[vec_col]))
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(lists, pr[qi])
            if not mask.any():
                continue
            s = m[mask] @ qm[qi]
            sel_ids = ids[mask]
            kk = min(k, len(s))
            if len(s) > kk:
                kth = np.partition(s, len(s) - kk)[len(s) - kk]
                part = np.flatnonzero(s >= kth)
            else:
                part = np.arange(len(s))
            out_q.append(np.full(len(part), qi, np.int64))
            out_id.append(sel_ids[part])
            out_s.append(s[part])
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "qid": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    # prune whole blocks whose lists don't intersect the probe set
    flt = assigned.filter(
        expr=f"list_id in {sorted(int(x) for x in probe_union)}")
    cand = flt.map_batches(_scan, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    rows = []
    for qi, g in cand.groupby("qid"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        for rank, vid in enumerate(g["vec_id"], start=1):
            rows.append((int(qi), rank, int(vid)))
    return pd.DataFrame(rows, columns=["qid", "rank", "vec_id"])


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized ANN (the memory-compression scale path)
# ---------------------------------------------------------------------------

def _lloyd(x: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic driver-side Lloyd k-means (init = every (n/k)-th
    row).  Used only on a bounded training SAMPLE — the scale story is
    that PQ codebooks, like FAISS's, are trained on a few thousand
    vectors regardless of corpus size."""
    n = len(x)
    k = min(k, n)
    cents = x[:: max(1, n // k)][:k].copy()
    for _ in range(iters):
        d = -2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, x)
        cnt = np.bincount(assign, minlength=len(cents))
        nz = cnt > 0
        cents[nz] = sums[nz] / cnt[nz, None]
    return cents


def pq_train(embeddings: rd.Dataset, m: int = 8, ksub: int = 256,
             sample: int = 4096, iters: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             dim: int = 64) -> np.ndarray:
    """Train product-quantizer codebooks, shape (m, ksub, dim//m).

    Vectors are L2-normalized, split into ``m`` subspaces, and each
    subspace gets its own ``ksub``-centroid k-means.  Training reads a
    deterministic id-strided SAMPLE of ``sample`` vectors (one pruned
    pass over the id column to size the stride, one filtered pass for
    the rows) — never the whole corpus; this is the standard bounded
    PQ training recipe, so the step is O(sample) at any corpus size."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if ksub > 256:
        raise ValueError(f"ksub {ksub} > 256: codes are uint8 "
                         f"(1 byte per subspace by design)")
    n = embeddings.count()
    if n == 0:
        raise ValueError("pq_train: empty embeddings dataset — nothing "
                         "to train the PQ codebooks on")
    stride = max(1, n // max(1, min(sample, n)))

    def _pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(ids % stride == 0))

    train = (embeddings.map_batches(_pick, batch_format="pyarrow",
                                    batch_size=None).to_pandas())
    if len(train) == 0:
        # id spaces sharing a factor with the stride (e.g. all-odd ids
        # after a re-key) can select nothing — fall back to the first
        # `sample` rows, loudly
        import sys

        print(f"pq_train: id-strided sample empty (stride {stride}); "
              f"falling back to limit({min(sample, n)})", file=sys.stderr)
        train = embeddings.limit(min(sample, n)).to_pandas()
    x = _norm_rows(np.stack([np.asarray(v, np.float64)
                             for v in train[vec_col]]))
    dsub = dim // m
    return np.stack([_lloyd(np.ascontiguousarray(x[:, j*dsub:(j+1)*dsub]),
                            ksub, iters) for j in range(m)])


def pq_encode(embeddings: rd.Dataset, codebooks: np.ndarray,
              list_centroids: np.ndarray | None = None,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> rd.Dataset:
    """(vec_id, code fixed_size_list<uint8>[, list_id]) — the compressed
    scan table.  The raw vector column is DROPPED: at dim=64 float32 the
    codes are 32x smaller, which is the entire point — the IVF-PQ scan
    streams this table, not the embeddings.  Codebooks (and the IVF
    coarse centroids, if given) ride as one broadcast ``ray.put`` ref."""
    m, ksub, dsub = codebooks.shape
    ref = ray.put((codebooks, list_centroids))

    def _encode(batch: pa.Table) -> pa.Table:
        cbs, cents = ray.get(ref)
        x = _norm_rows(_vec_matrix(batch[vec_col]))
        n = len(x)
        codes = np.empty((n, m), np.uint8)
        for j in range(m):
            xs = x[:, j*dsub:(j+1)*dsub]
            cb = cbs[j]
            d = -2.0 * (xs @ cb.T) + (cb * cb).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
        cols = {
            id_col: batch[id_col],
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m),
        }
        if cents is not None:
            cols["list_id"] = pa.array(
                np.argmax(x @ cents.T, axis=1), pa.int64())
        return pa.table(cols)

    return embeddings.map_batches(_encode, batch_format="pyarrow",
                                  zero_copy_batch=True)


def _adc_scan_fn(q_ref, m: int, r_cand: int, id_col: str):
    """Build the per-block ADC scan callable shared by ivfpq_knn and the
    persistent AnnIndex: gather each code's partial dot products from
    the per-query LUT and emit the block's top-``r_cand`` candidates per
    query.  ``q_ref`` is a ray.put of (luts, probe)."""
    jj = np.arange(m)

    def _scan(batch: pa.Table) -> pa.Table:
        lu, pr = ray.get(q_ref)
        # hive partition columns come back dictionary-encoded -> the
        # int64 cast decodes them (no-op for plain int64 columns)
        lists = (batch["list_id"].combine_chunks()
                 .cast(pa.int64()).to_numpy(zero_copy_only=False))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = (batch["code"].combine_chunks().flatten()
                 .to_numpy(zero_copy_only=False)
                 .reshape(len(ids), m).astype(np.int64, copy=False))
        out_q, out_id, out_s = [], [], []
        for qi in range(lu.shape[0]):
            mask = np.isin(lists, pr[qi])
            if not mask.any():
                continue
            sim = lu[qi][jj[None, :], codes[mask]].sum(axis=1)
            sel = ids[mask]
            kk = min(r_cand, len(sim))
            if len(sim) > kk:
                kth = np.partition(sim, len(sim) - kk)[len(sim) - kk]
                part = np.flatnonzero(sim >= kth)
            else:
                part = np.arange(len(sim))
            out_q.append(np.full(len(part), qi, np.int64))
            out_id.append(sel[part])
            out_s.append(sim[part])
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "qid": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    return _scan


def _top_candidates(cand: pd.DataFrame, r_cand: int) -> pd.DataFrame:
    """Each query's top-r_cand ADC rows by (sim DESC, vec_id) — computed
    ONCE and shared by the id-fetch and the exact rerank (the tie-break
    must not drift between them)."""
    return (cand.sort_values(["qid", "sim", "vec_id"],
                             ascending=[True, False, True])
            .groupby("qid").head(r_cand))


def _exact_rerank(top: pd.DataFrame, vecs: pd.DataFrame, q: np.ndarray,
                  k: int, id_col: str, vec_col: str) -> pd.DataFrame:
    """Exact re-rank of the pre-selected top candidates (from
    _top_candidates): score JUST those vectors exactly, return
    (qid, rank, vec_id) with the (-score, vec_id) tie-break."""
    vm = _norm_rows(np.stack([np.asarray(v, np.float64)
                              for v in vecs[vec_col]]))
    pos = {int(v): i for i, v in enumerate(vecs[id_col].to_numpy())}
    rows = []
    for qi, g in top.groupby("qid"):
        gid = g["vec_id"].to_numpy()
        idx = np.array([pos[int(v)] for v in gid], np.int64)
        exact = vm[idx] @ q[int(qi)]
        order = np.lexsort((gid, -exact))[:k]
        for rank, oi in enumerate(order, start=1):
            rows.append((int(qi), rank, int(gid[oi])))
    return pd.DataFrame(rows, columns=["qid", "rank", "vec_id"])


def _rerank_candidate_ids(top: pd.DataFrame) -> list[int]:
    """Distinct vec_ids in the pre-selected top candidates — the
    bounded exact-rerank fetch set."""
    return sorted(int(x) for x in top["vec_id"].unique())


def _empty_knn_frame() -> pd.DataFrame:
    """Typed empty (qid, rank, vec_id) result — the zero-candidate edge
    (empty corpus / all-empty probed lists) returns this instead of
    letting an `in []` filter + np.stack([]) die downstream."""
    return pd.DataFrame({"qid": pd.array([], dtype="int64"),
                         "rank": pd.array([], dtype="int64"),
                         "vec_id": pd.array([], dtype="int64")})



def ivfpq_knn(embeddings: rd.Dataset, queries: np.ndarray, k: int = 10,
              nprobe: int = 8, num_lists: int = 16, m: int = 8,
              ksub: int = 256, rerank: int = 4, iters: int = 5,
              vec_col: str = "embedding", id_col: str = "vec_id",
              dim: int = 64) -> pd.DataFrame:
    """IVF-PQ approximate cosine top-k with exact re-ranking.

    Pipeline: train the coarse quantizer (kmeans_centroids) and the PQ
    codebooks (bounded sample), build the compressed scan table
    (pq_encode — codes only, 32x smaller than the vectors), ADC-scan the
    ``nprobe`` probed lists (per-query LUT of subspace dot products, one
    fancy-indexed gather per block — no matmul against the corpus), then
    exactly re-rank the top ``rerank*k`` ADC candidates per query by
    fetching JUST those vectors.  Returns (qid, rank, vec_id) like
    knn_cosine.  Reference analog: the query-time candidate-then-rerank
    split of DyableRequest (SearchHitItems narrows, HitScore reranks);
    the PQ itself follows Jégou et al., 'Product Quantization for
    Nearest Neighbor Search' (public paper)."""
    cents = kmeans_centroids(embeddings, num_lists, iters, vec_col,
                             id_col, dim)
    cbs = pq_train(embeddings, m=m, ksub=ksub, vec_col=vec_col,
                   id_col=id_col, dim=dim)
    table = pq_encode(embeddings, cbs, cents, vec_col, id_col).materialize()

    q = _norm_rows(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    probe_union = np.unique(probe)
    dsub = dim // m
    # per-query ADC lookup tables: luts[qi, j, c] = q_sub(j) . codebook[j, c]
    luts = np.einsum("qjd,jcd->qjc",
                     q.reshape(len(q), m, dsub), cbs)
    q_ref = ray.put((luts, probe))
    r_cand = max(k, rerank * k)

    flt = table.filter(
        expr=f"list_id in {sorted(int(x) for x in probe_union)}")
    cand = flt.map_batches(_adc_scan_fn(q_ref, m, r_cand, id_col),
                           batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()

    # exact re-rank: fetch ONLY the candidate vectors (bounded: <= nq *
    # rerank*k rows) and score them against the true query vectors
    top = _top_candidates(cand, r_cand)
    if top.empty:
        return _empty_knn_frame()
    cand_ids = _rerank_candidate_ids(top)
    vecs = (embeddings.filter(expr=f"{id_col} in {cand_ids}")
            .to_pandas())
    return _exact_rerank(top, vecs, q, k, id_col, vec_col)
