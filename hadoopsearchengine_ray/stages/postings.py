"""Posting-list construction: token rows -> compressed per-term blobs.

The Ray rebuild of the reference's CompileHitList + SortHitItems +
CompileLookupIndex stages (postings binned by ``word_id % 256``,
/root/reference/DyableHitList/DyableHitList/CompileHitList.h:263-326;
external radix sort by word id, DyableSort/SortHitList/SortHitList.cpp:84-128;
fixed lookup blocks, DyableSort/CompileLookupIndex) as ONE
``groupby(shard).map_groups`` over the token table:

- each shard = ``term_id % P`` gathers all postings of its terms, sorts by
  (term, doc_id) with numpy, and encodes every posting list in one
  vectorized pass (codec.encode_term_partition);
- **skew**: terms whose global df exceeds ``hot_df_threshold`` are salted
  into ``S`` doc-range sub-shards — each sub-shard encodes an independent,
  doc-range-disjoint sub-list stored as its own index row
  (``salt`` column).  No single task ever holds a hot term's full posting
  list; the query reader concatenates sub-lists in salt order.  This is
  the lossless replacement for the reference's stopword amputation
  (Webpage.h:334-346).

Output schema (one row per (term, salt)):
    term, term_id, salt, df, cf, part,
    doc_blob, tf_blob, skip_docs, skip_doc_off, skip_tf_off, block_max_tf
where ``part = term_id % num_index_parts`` is the on-disk Parquet
partition key (query-time pruning).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..codec import encode_term_partition

DEFAULT_SHARDS = 64          # P — size so each shard is ~64-256 MB at scale
DEFAULT_SALTS = 8            # S — sub-shards per hot term
DEFAULT_INDEX_PARTS = 32     # on-disk partition dirs (reference: 256 hit divs)


class ShardAssigner:
    """Stateful actor: caches term -> (term_id, base shard) across batches
    (the reference's per-process dictionaries, WordLogEntry.h:100-125,
    reborn as an actor-pool cache).  Hot-term set is broadcast once via
    the actor args, not re-shipped per batch."""

    def __init__(self, hot_terms: dict[str, int], num_docs: int,
                 num_shards: int = DEFAULT_SHARDS, num_salts: int = DEFAULT_SALTS):
        self.hot = hot_terms
        self.num_docs = max(1, num_docs)
        self.P = num_shards
        self.S = num_salts
        self.cache: dict[str, tuple[int, int]] = {}

    def _lookup(self, term: str) -> tuple[int, int]:
        ent = self.cache.get(term)
        if ent is None:
            tid = int.from_bytes(
                hashlib.blake2b(term.encode(), digest_size=8).digest(), "big")
            hot_idx = self.hot.get(term, -1)
            ent = (tid, hot_idx)
            self.cache[term] = ent
        return ent

    def __call__(self, batch: pa.Table) -> pa.Table:
        dict_arr = batch["term"].combine_chunks().dictionary_encode()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_terms = dict_arr.dictionary.to_pylist()
        tids = np.empty(len(uniq_terms), dtype=np.uint64)
        hot_idx = np.empty(len(uniq_terms), dtype=np.int64)
        for i, t in enumerate(uniq_terms):
            tid, h = self._lookup(t)
            tids[i] = tid
            hot_idx[i] = h
        row_tid = tids[codes]
        row_hot = hot_idx[codes]
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        salt = (doc * np.uint64(self.S) // np.uint64(self.num_docs)).astype(np.int64)
        np.clip(salt, 0, self.S - 1, out=salt)
        shard = (row_tid % np.uint64(self.P)).astype(np.int64)
        is_hot = row_hot >= 0
        shard[is_hot] = self.P + row_hot[is_hot] * self.S + salt[is_hot]
        salt[~is_hot] = 0
        return pa.table({
            "term": batch["term"],
            "doc_id": batch["doc_id"],
            "tf": batch["tf"],
            "term_id": pa.array(row_tid, pa.uint64()),
            "shard": pa.array(shard, pa.int64()),
            "salt": pa.array(salt.astype(np.uint8), pa.uint8()),
        })


def _encode_group(group: pa.Table, num_index_parts: int) -> pa.Table:
    dict_arr = group["term"].combine_chunks().dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)
    tid = group["term_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    salt = group["salt"].to_numpy(zero_copy_only=False).astype(np.uint8)

    order = np.lexsort((doc, codes))
    codes, doc, tf = codes[order], doc[order], tf[order]
    n = len(codes)
    starts = np.flatnonzero(np.diff(codes)) + 1
    term_starts = np.concatenate(([0], starts, [n]))
    first = term_starts[:-1]

    cols = encode_term_partition(term_starts, doc, tf)
    terms = dict_arr.dictionary.take(pa.array(codes[first], pa.int64()))
    t_tid = tid[order][first]
    t_salt = salt[order][first]
    cf = np.add.reduceat(tf.astype(np.int64), first) if n else np.empty(0, np.int64)
    part = (t_tid % np.uint64(num_index_parts)).astype(np.int32)
    return pa.table({
        "term": terms.cast(pa.string()),
        "term_id": pa.array(t_tid, pa.uint64()),
        "salt": pa.array(t_salt, pa.uint8()),
        "cf": pa.array(cf, pa.int64()),
        "part": pa.array(part, pa.int32()),
        **cols,
    })


def build_postings(tokens: rd.Dataset, hot_terms: dict[str, int], num_docs: int,
                   num_shards: int = DEFAULT_SHARDS,
                   num_salts: int = DEFAULT_SALTS,
                   num_index_parts: int = DEFAULT_INDEX_PARTS,
                   concurrency: int | None = None) -> rd.Dataset:
    """Token rows -> encoded posting rows (see module docstring)."""
    sharded = tokens.map_batches(
        ShardAssigner,
        fn_constructor_args=(hot_terms, num_docs, num_shards, num_salts),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or (1, 8),
    )
    return sharded.groupby("shard").map_groups(
        lambda g: _encode_group(g, num_index_parts),
        batch_format="pyarrow",
    )
