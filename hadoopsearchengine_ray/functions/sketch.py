"""Mergeable sketches for corpus statistics at 100-TB scale.

Both operators avoid the vocabulary-cardinality shuffle that the exact
paths (``dictionary_table`` + top-k sort, A1/A8) pay: partials are
bounded-size summaries computed per batch and merged associatively, so
the exchange volume is O(partitions x capacity), independent of corpus
size.

* ``term_heavy_hitters`` — approximate top-k terms by collection
  frequency via truncated count partials (the Space-Saving / Misra-Gries
  merge scheme): each partial keeps its ``capacity`` heaviest terms, and
  merging sums survivors.  A merged count underestimates the true count
  by at most the sum of the per-partial truncation thresholds — with
  ``capacity`` >= the distinct-term count the result is EXACT (what the
  driver oracle checks); at scale, capacity ~ 100x k keeps the top-k
  stable for Zipfian term distributions.
* ``hll_distinct`` — HyperLogLog distinct counting with deterministic
  64-bit hashing: per-batch register partials (one uint8[m] blob each),
  elementwise-max merged on the driver (sketch merge is O(partials x m)
  bytes — this is the sketch's whole point), standard small/large-range
  corrections.  Deterministic given the input set, ~1.04/sqrt(m)
  relative error.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .text import _docs, token_table

# ---------------------------------------------------------------------------
# Space-Saving heavy hitters


def _topm_table(terms: pa.Array, cf: np.ndarray, m: int) -> pa.Table:
    """Keep the m heaviest (cf desc, term asc) rows — vectorized."""
    t = np.asarray(terms.cast(pa.string()).to_pandas(), dtype=object)
    order = np.lexsort((t, -cf))[:m]
    return pa.table({
        "term": pa.array(t[order], pa.string()),
        "cf": pa.array(cf[order].astype(np.int64)),
    })


def _combine_topm(m: int):
    def _c(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "cf": pa.array([], pa.int64())})
        d = batch["term"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cf = batch["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
        summed = np.bincount(codes, weights=cf,
                             minlength=len(d.dictionary)).astype(np.int64)
        return _topm_table(d.dictionary, summed, m)
    return _c


def term_heavy_hitters(docs, text_col: str = "text", k: int = 100,
                       capacity: int = 4096,
                       combine_blocks: int = 8) -> rd.Dataset:
    """Approximate top-``k`` (term, cf) WITHOUT a vocabulary shuffle.

    Shape: per-batch exact counts truncated to the ``capacity`` heaviest
    terms (one dictionary_encode + bincount + lexsort), a ``capacity``-
    bounded tree combine over ``combine_blocks`` blocks, and one final
    single-block merge that emits k rows.  Exchange volume is
    O(blocks x capacity) rows regardless of corpus size.

    Guarantee (Space-Saving merge): a term absent from a partial missed
    at most that partial's smallest kept count, so merged counts are
    within sum(per-partial thresholds) of truth; with ``capacity`` >=
    distinct terms the output is exact (the oracle-checked regime).
    Ties break (cf desc, term asc) to stay deterministic."""
    tok = token_table(_docs(docs, text_col), text_col)

    def _partial(batch: pa.Table) -> pa.Table:
        d = batch["term"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        cf = np.bincount(codes, weights=tf,
                         minlength=len(d.dictionary)).astype(np.int64)
        return _topm_table(d.dictionary, cf, capacity)

    partials = tok.map_batches(_partial, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)
    merged = (partials.repartition(combine_blocks)
              .map_batches(_combine_topm(capacity), batch_format="pyarrow",
                           batch_size=None))
    final = (merged.repartition(1)
             .map_batches(_combine_topm(k), batch_format="pyarrow",
                          batch_size=None))
    return final


# ---------------------------------------------------------------------------
# HyperLogLog distinct counting


def _hll_partial(col: str, p: int):
    m = 1 << p
    bits = 64 - p

    def _h(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as _pc
        # count(DISTINCT col) ignores NULLs — drop them before hashing
        # (a hashed NaN would register as one extra distinct value)
        batch = batch.filter(_pc.is_valid(batch[col]))
        if batch.num_rows == 0:
            return pa.table({"reg": pa.array([], pa.binary())})
        h = pd.util.hash_pandas_object(
            batch[col].to_pandas(), index=False).to_numpy().astype(np.uint64)
        idx = (h >> np.uint64(bits)).astype(np.int64)
        v = h & np.uint64((1 << bits) - 1)
        # rho = leading zeros of the low `bits` bits + 1; v < 2^52 for
        # p >= 12 so float64 log2 is exact
        rho = np.where(v > 0,
                       bits - np.floor(np.log2(
                           np.maximum(v, 1).astype(np.float64))).astype(np.int64),
                       bits + 1).astype(np.uint8)
        reg = np.zeros(m, np.uint8)
        np.maximum.at(reg, idx, rho)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})
    return _h


def hll_distinct(ds: rd.Dataset, col: str, p: int = 14) -> float:
    """Estimate the number of distinct values of ``ds[col]`` with a
    HyperLogLog sketch (2^p registers, ~1.04/sqrt(2^p) relative error,
    deterministic given the input set).

    Scale shape: one map emits a 2^p-byte register blob per BATCH; the
    driver merges blobs by elementwise max — O(partials x 2^p) bytes,
    never a row.  No shuffle, no distinct groupby."""
    return _hll_estimate(hll_registers(ds, col, p))


def hll_registers(ds: rd.Dataset, col: str, p: int = 14) -> np.ndarray:
    """The mergeable state behind ``hll_distinct``: the max-merged
    uint8[2^p] register array.  Two register arrays merge by elementwise
    max, so per-partition sketches can be persisted and unioned later
    (the delta-index pattern) without touching rows again."""
    if not 12 <= p <= 18:
        raise ValueError("p must be in [12, 18]")
    m = 1 << p
    parts = (ds.map_batches(_hll_partial(col, p), batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)
             .take_all())
    reg = np.zeros(m, np.uint8)
    for row in parts:
        reg = np.maximum(reg, np.frombuffer(row["reg"], np.uint8))
    return reg


def _hll_estimate(reg: np.ndarray) -> float:
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)          # linear counting
    elif est > (1 << 64) / 30.0:
        est = -(2.0 ** 64) * np.log1p(-est / 2.0 ** 64)
    return float(est)


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (MRL-style weighted equi-depth compaction)


def _compact_weighted(v: np.ndarray, w: np.ndarray,
                      capacity: int) -> tuple[np.ndarray, np.ndarray]:
    """Compact a weighted value multiset to <= capacity points.

    Sort by value; if the point count fits, pass through (the EXACT
    regime).  Else pick the values at ``capacity`` equally spaced
    cumulative-weight midpoints, each carrying weight W/capacity — one
    compaction adds <= W/capacity rank error (Munro–Paterson / MRL
    equi-depth step).  Deterministic: no randomization."""
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    if len(v) <= capacity:
        return v, w
    W = float(w.sum())
    cum = np.cumsum(w)
    targets = (np.arange(capacity) + 0.5) * (W / capacity)
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.minimum(idx, len(v) - 1)
    return v[idx], np.full(capacity, W / capacity)


def _quantile_partial(col: str, capacity: int):
    def _p(batch: pa.Table) -> pa.Table:
        x = batch[col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        x = x[~np.isnan(x)]
        v, w = _compact_weighted(x, np.ones(len(x)), capacity)
        return pa.table({"v": pa.array(v, pa.float64()),
                         "w": pa.array(w, pa.float64())})
    return _p


def _quantile_combine(capacity: int):
    def _c(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        v = batch["v"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        v, w = _compact_weighted(v, w, capacity)
        return pa.table({"v": pa.array(v, pa.float64()),
                         "w": pa.array(w, pa.float64())})
    return _c


def quantile_sketch(ds: rd.Dataset, col: str, qs: list[float],
                    capacity: int = 4096,
                    combine_blocks: int = 8) -> list[float]:
    """Approximate quantiles of ``ds[col]`` WITHOUT a value shuffle —
    the scale path for A9's k-th order statistic (the reference's
    external ``CKthOrderStat``, /root/reference/MapReduce.h:15-300,
    recurses over the full value file; ``kth_percentile`` shuffles per
    distinct value).

    Shape: per-batch sorted compaction to ``capacity`` weighted points,
    a tree combine over ``combine_blocks`` blocks, one final combine —
    exchange volume O(blocks x capacity) rows, independent of input
    size.  Each compaction of total weight W adds <= W/capacity rank
    error, so the end-to-end rank error is <= (levels)/capacity of N.
    With ``capacity`` >= the input size nothing is ever compacted and
    the result is EXACT quantile_disc semantics (the oracle-checked
    regime); determinism holds in both regimes.

    Returns the discrete quantile values (elements of the input) at each
    q in ``qs``: the first point whose cumulative weight reaches ceil(q*W)
    (float regime: >= q*W)."""
    if not qs or any(not 0 < q <= 1 for q in qs):
        raise ValueError("each q must be in (0, 1]")
    parts = ds.map_batches(_quantile_partial(col, capacity),
                           batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True)
    merged = (parts.repartition(combine_blocks)
              .map_batches(_quantile_combine(capacity),
                           batch_format="pyarrow", batch_size=None)
              .repartition(1)
              .map_batches(_quantile_combine(capacity),
                           batch_format="pyarrow", batch_size=None)
              .to_pandas())
    v = merged["v"].to_numpy()
    w = merged["w"].to_numpy()
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    if len(v) == 0:
        raise ValueError("quantile_sketch over an empty/all-null column")
    cum = np.cumsum(w)
    W = float(cum[-1])
    out = []
    for q in qs:
        # integer weights (exact regime): quantile_disc rank ceil(q*n);
        # fractional weights: the first point covering rank q*W
        target = np.ceil(q * W - 1e-9) if np.allclose(w, np.round(w)) \
            else q * W
        out.append(float(v[min(int(np.searchsorted(cum, target - 1e-9)),
                               len(v) - 1)]))
    return out


def hll_distinct_per_key(ds: rd.Dataset, key: str, col: str,
                         p: int = 12) -> rd.Dataset:
    """Approximate distinct ``col`` count PER ``key`` — per-batch
    per-key register blobs, ONE groupby whose groups max-merge blobs.
    The exchange is O(batches x keys-per-batch x 2^p) bytes, independent
    of the per-key row count (the exact path shuffles every distinct
    (key, value) pair).  Returns (key, n_distinct_est: float64)."""
    # p >= 12 keeps v < 2^52, where the shared float64-log2 rho kernel
    # is exact (same invariant hll_registers states); p in [8, 12) would
    # admit one-ulp rho off-by-ones near powers of two
    if not 12 <= p <= 16:
        raise ValueError("p must be in [12, 16] for the per-key form")
    m = 1 << p
    bits = 64 - p

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as _pc
        k = batch[key].to_pandas().to_numpy()
        # NULL col values don't count toward DISTINCT; NULL keys still
        # form a group (SQL GROUP BY semantics)
        valid = _pc.is_valid(batch[col]).to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(
            batch[col].to_pandas(), index=False).to_numpy().astype(np.uint64)
        idx = (h >> np.uint64(bits)).astype(np.int64)
        v = h & np.uint64((1 << bits) - 1)
        rho = np.where(v > 0,
                       bits - np.floor(np.log2(
                           np.maximum(v, 1).astype(np.float64))).astype(np.int64),
                       bits + 1).astype(np.uint8)
        ks, blobs = [], []
        for kv, gidx in pd.Series(np.arange(len(k))).groupby(k, dropna=False):
            gi = gidx.to_numpy()
            gi = gi[valid[gi]]
            reg = np.zeros(m, np.uint8)
            np.maximum.at(reg, idx[gi], rho[gi])
            if kv is None or (isinstance(kv, float) and np.isnan(kv)):
                kv = None
            ks.append(kv)
            blobs.append(reg.tobytes())
        return pa.table({key: pa.array(ks, batch[key].type),
                         "reg": pa.array(blobs, pa.binary())})

    def _merge(g: pa.Table) -> pa.Table:
        reg = np.zeros(m, np.uint8)
        for blob in g["reg"].to_pylist():
            reg = np.maximum(reg, np.frombuffer(blob, np.uint8))
        return pa.table({
            key: g[key].slice(0, 1),
            "n_distinct_est": pa.array([_hll_estimate(reg)], pa.float64()),
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    return parts.groupby(key).map_groups(_merge, batch_format="pyarrow")


def grouped_quantiles(ds: rd.Dataset, key: str, col: str, qs: list[float],
                      capacity: int = 4096) -> rd.Dataset:
    """Per-key quantiles via per-batch sketch partials merged in ONE
    groupby — the grouped form of A9 (the reference computes its
    occurrence threshold globally; per-division thresholds would rerun
    CKthOrderStat per division).

    Scale shape: each batch contributes <= capacity weighted points PER
    KEY PRESENT (not per key-universe), so the exchange is
    O(blocks x keys-per-block x capacity) — independent of the row
    count under each key.  Exact (quantile_disc parity) whenever no
    per-batch per-key group exceeds ``capacity``; same deterministic
    error bound as ``quantile_sketch`` otherwise.

    Returns one row per key: (key, q_<pct> ... ) float64 columns."""
    if not qs or any(not 0 < q <= 1 for q in qs):
        raise ValueError("each q must be in (0, 1]")
    qcols = [f"q_{str(q).replace('.', '_')}" for q in qs]

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        k = batch[key].to_pandas()
        x = batch[col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        ks, vs, ws = [], [], []
        for kv, idx in pd.Series(np.arange(len(k))).groupby(
                k.to_numpy(), dropna=False):
            if kv is None or (isinstance(kv, float) and np.isnan(kv)):
                kv = None
            xi = x[idx.to_numpy()]
            xi = xi[~np.isnan(xi)]
            if len(xi) == 0:
                # all-NULL key: a zero-weight NaN sentinel keeps the key
                # alive so _finish can emit its NULL-quantile row
                ks.append(np.full(1, kv, dtype=object))
                vs.append(np.array([np.nan]))
                ws.append(np.array([0.0]))
                continue
            v, w = _compact_weighted(xi, np.ones(len(xi)), capacity)
            ks.append(np.full(len(v), kv, dtype=object))
            vs.append(v)
            ws.append(w)
        if not ks:
            return pa.table({key: batch[key].slice(0, 0),
                             "v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        return pa.table({
            key: pa.array(np.concatenate(ks), batch[key].type),
            "v": pa.array(np.concatenate(vs), pa.float64()),
            "w": pa.array(np.concatenate(ws), pa.float64()),
        })

    def _finish(g: pa.Table) -> pa.Table:
        v = g["v"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        real = ~np.isnan(v)          # drop all-NULL-key sentinels
        v, w = v[real], w[real]
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cols = {key: g[key].slice(0, 1)}
        if len(v) == 0:              # key whose values were all null
            for name in qcols:
                cols[name] = pa.array([None], pa.float64())
            return pa.table(cols)
        cum = np.cumsum(w)
        W = float(cum[-1])
        exact_w = bool(np.allclose(w, np.round(w)))
        for q, name in zip(qs, qcols):
            target = np.ceil(q * W - 1e-9) if exact_w else q * W
            i = min(int(np.searchsorted(cum, target - 1e-9)), len(v) - 1)
            cols[name] = pa.array([float(v[i])], pa.float64())
        return pa.table(cols)

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    return parts.groupby(key).map_groups(_finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom filter (mergeable bitset) + semi-join pre-filter


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix)."""
    x = x.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bloom_positions(keys, num_bits: int, num_hashes: int) -> np.ndarray:
    """(n, num_hashes) bit positions via double hashing h1 + i*h2."""
    import pandas as pd
    h1 = pd.util.hash_pandas_object(
        pd.Series(keys), index=False).to_numpy().astype(np.uint64)
    h2 = _splitmix64(h1) | np.uint64(1)      # odd => full-period stride
    i = np.arange(num_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(num_bits)).astype(np.int64)


def bloom_build(ds: rd.Dataset, col: str, num_bits: int = 1 << 23,
                num_hashes: int = 7) -> np.ndarray:
    """Build a Bloom-filter bitset over ``ds[col]`` (packed uint8 array,
    num_bits/8 bytes).  Per-batch partial bitsets are OR-merged on the
    driver — O(partials x num_bits/8) bytes, no shuffle.  ~10 bits +
    7 hashes per expected key gives <1% false positives."""
    if num_bits % 8:
        raise ValueError("num_bits must be a multiple of 8")

    def _partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(num_bits // 8, np.uint8)
        if batch.num_rows:
            pos = _bloom_positions(batch[col].to_pandas(), num_bits,
                                   num_hashes).ravel()
            np.bitwise_or.at(bits, pos >> 3,
                             np.left_shift(1, pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True).take_all()
    bits = np.zeros(num_bits // 8, np.uint8)
    for row in parts:
        bits |= np.frombuffer(row["bits"], np.uint8)
    return bits


def bloom_filter_batches(ds: rd.Dataset, col: str, bits: np.ndarray,
                         num_hashes: int = 7) -> rd.Dataset:
    """Keep only rows whose ``col`` MAY be in the Bloom bitset (false
    positives possible, false negatives never).  The bitset ships once
    via ``ray.put`` and every task reads the same object-store copy."""
    import ray
    num_bits = len(bits) * 8
    ref = ray.put(bits)

    def _filt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        b = ray.get(ref)
        pos = _bloom_positions(batch[col].to_pandas(), num_bits, num_hashes)
        hit = (b[pos >> 3] & np.left_shift(1, pos & 7).astype(np.uint8)) != 0
        return batch.filter(pa.array(hit.all(axis=1)))

    return ds.map_batches(_filt, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
