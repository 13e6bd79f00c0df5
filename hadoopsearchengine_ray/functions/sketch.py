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
    if not 12 <= p <= 18:
        raise ValueError("p must be in [12, 18]")
    m = 1 << p
    parts = (ds.map_batches(_hll_partial(col, p), batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)
             .take_all())
    reg = np.zeros(m, np.uint8)
    for row in parts:
        reg = np.maximum(reg, np.frombuffer(row["reg"], np.uint8))

    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)          # linear counting
    elif est > (1 << 64) / 30.0:
        est = -(2.0 ** 64) * np.log1p(-est / 2.0 ** 64)
    return float(est)
