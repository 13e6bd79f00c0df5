"""Dictionary stage: token rows -> (term, term_id, df, cf).

Collapses the reference's stages 3-5 (per-division dictionaries +
occurrence maps + global prefix-sum ids,
/root/reference/DyableHitList/DyableLogFile/WordLogEntry.h:100-125,
DyableLexonWords/LexonWords.cpp:110-153) into ONE shuffle: a map-side
partial aggregation per batch followed by ``groupby('term').sum``.  Term
ids are deterministic blake2b-64 hashes (oracle.term_id64) instead of
sequential division offsets — no cross-partition ordering dependency.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum


def _term_ids(terms: pa.Array) -> np.ndarray:
    """blake2b-64 per term (cardinality = dictionary size, not corpus)."""
    out = np.empty(len(terms), dtype=np.uint64)
    blake = hashlib.blake2b
    for i, t in enumerate(terms.to_pylist()):
        out[i] = int.from_bytes(blake(t.encode(), digest_size=8).digest(), "big")
    return out


def dict_partials(tokens: rd.Dataset) -> rd.Dataset:
    """Per-batch partial (term, df, cf): df = #(doc,term) rows, cf = sum tf."""

    def _partial(batch: pa.Table) -> pa.Table:
        dict_arr = batch["term"].combine_chunks().dictionary_encode()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(dict_arr.dictionary)
        df = np.bincount(codes, minlength=n).astype(np.int64)
        cf = np.bincount(codes, weights=tf, minlength=n).astype(np.int64)
        return pa.table({
            "term": dict_arr.dictionary.cast(pa.string()),
            "df": pa.array(df, pa.int64()),
            "cf": pa.array(cf, pa.int64()),
        })

    return tokens.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)


def build_dictionary(tokens: rd.Dataset) -> rd.Dataset:
    """Token rows -> (term, term_id, df, cf)."""
    agg = (
        dict_partials(tokens)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
    )

    def _add_id(batch: pa.Table) -> pa.Table:
        tid = _term_ids(batch["term"].combine_chunks())
        return batch.append_column("term_id", pa.array(tid, pa.uint64()))

    return agg.map_batches(_add_id, batch_format="pyarrow", zero_copy_batch=True)
