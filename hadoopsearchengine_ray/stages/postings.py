"""Posting-list construction: token rows -> compressed per-term blobs.

The Ray rebuild of the reference's CompileHitList + SortHitItems +
CompileLookupIndex stages (postings binned by ``word_id % 256``,
/root/reference/DyableHitList/DyableHitList/CompileHitList.h:263-326;
external radix sort by word id, DyableSort/SortHitList/SortHitList.cpp:84-128;
fixed lookup blocks, DyableSort/CompileLookupIndex) as ONE
``groupby(shard).map_groups`` over the token table:

- the shard-assign map converts term strings to deterministic 64-bit ids
  ONCE (per-block dictionary encode + per-unique blake2b), so the big
  all-to-all exchange moves only fixed-width numerics
  (term_id, doc_id, tf, shard, salt) — no string sorting, ~35% fewer
  bytes than shuffling terms (term strings live only in the small vocab
  table, stages/dictionary.py);
- each shard = ``term_id % P`` gathers all postings of its terms, sorts by
  (term_id, doc_id) with numpy, and encodes every posting list in one
  vectorized pass (codec.encode_term_partition);
- **skew**: terms whose sampled global df exceeds the hot threshold are
  salted into ``S`` doc-range sub-shards — each sub-shard encodes an
  independent, doc-range-disjoint sub-list stored as its own index row
  (``salt`` column).  No single task ever holds a hot term's full posting
  list; the query reader concatenates sub-lists in salt order.  This is
  the lossless replacement for the reference's stopword amputation
  (Webpage.h:334-346).

Output schema (one row per (term_id, salt)):
    term_id, salt, df, cf, part,
    doc_blob, tf_blob, skip_docs, skip_doc_off, skip_tf_off, block_max_tf
where ``part = term_id % num_index_parts`` is the on-disk Parquet
partition key (query-time pruning).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

DEFAULT_SHARDS = 64          # P — size so each shard is ~64-256 MB at scale
DEFAULT_SALTS = 8            # S — sub-shards per hot term
DEFAULT_INDEX_PARTS = 32     # on-disk partition dirs (reference: 256 hit divs)


def term_ids_for(terms: list[str]) -> np.ndarray:
    """Signed blake2b-64 ids over a (block-local) unique-term list.

    Signed int64 (two's-complement of the hash bytes) because Arrow/Ray
    groupby keys must fit int64 — uint64 keys above 2^63 fall back to
    pickled-object columns."""
    out = np.empty(len(terms), dtype=np.int64)
    blake = hashlib.blake2b
    for i, t in enumerate(terms):
        out[i] = int.from_bytes(blake(t.encode(), digest_size=8).digest(), "big", signed=True)
    return out


def make_shard_assigner(hot_term_ids: dict[int, int], num_docs: int,
                        num_shards: int = DEFAULT_SHARDS,
                        num_salts: int = DEFAULT_SALTS):
    """Stateless shard-assign map (hot set broadcast once via ray.put).

    Per batch: dictionary-encode terms, hash the (few) uniques, then pure
    vectorized id/shard/salt arithmetic.  Hot terms route to dedicated
    (hot_idx, doc-range-salt) sub-shards."""
    hot_ref = ray.put(hot_term_ids)
    # salt = doc // ceil(space/S): monotonic in doc id and overflow-free
    # for ANY uint64 id.  (The previous doc*S//space multiply wrapped
    # past 2^64/S, making salt non-monotonic — the reader's salt-order
    # posting concatenation would silently go unsorted.)  Ids beyond
    # ``num_docs`` clip into the last salt: still monotonic; only hot
    # load balance degrades, so column-mode callers with a sparse id
    # space should pass the id-space ceiling, not the row count.
    salt_width = np.uint64(max(1, -(-max(1, num_docs) // num_salts)))
    _hot_cache: list = []            # one plasma get per worker, not per batch

    def _assign(batch: pa.Table) -> pa.Table:
        if not _hot_cache:
            _hot_cache.append(ray.get(hot_ref))
        hot = _hot_cache[0]
        dict_arr = batch["term"].combine_chunks().dictionary_encode()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = dict_arr.dictionary.to_pylist()
        tids = term_ids_for(uniq)
        hot_idx = np.fromiter((hot.get(int(t), -1) for t in tids),
                              dtype=np.int64, count=len(tids))
        row_tid = tids[codes]
        row_hot = hot_idx[codes]
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # clip in uint64 BEFORE the int64 cast: a quotient >= 2^63
        # (huge ids with a small declared space) would wrap negative
        # and clip to salt 0, breaking monotonicity
        salt = np.minimum(doc // salt_width,
                          np.uint64(num_salts - 1)).astype(np.int64)
        shard = row_tid % np.int64(num_shards)   # numpy %: sign of divisor
        is_hot = row_hot >= 0
        shard[is_hot] = num_shards + row_hot[is_hot] * num_salts + salt[is_hot]
        salt[~is_hot] = 0
        cols = {
            "term_id": pa.array(row_tid, pa.int64()),
            "doc_id": batch["doc_id"],
            "tf": batch["tf"],
            "shard": pa.array(shard, pa.int64()),
            "salt": pa.array(salt.astype(np.uint8), pa.uint8()),
        }
        if "pos" in batch.column_names:   # positional build: positions ride
            cols["pos"] = batch["pos"]    # the same numeric-only exchange
        if "atf" in batch.column_names:   # field-aware build: anchor tf
            cols["atf"] = batch["atf"]    # rides the exchange too
        return pa.table(cols)

    return _assign


def _encode_group(group: pa.Table, num_index_parts: int) -> pa.Table:
    tid = group["term_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)
    salt = group["salt"].to_numpy(zero_copy_only=False).astype(np.uint8)

    order = np.lexsort((doc, tid))
    tid_s, doc_s, tf_s, salt_s = tid[order], doc[order], tf[order], salt[order]
    n = len(tid_s)

    from ..codec import encode_term_partition

    positions = None
    if "pos" in group.column_names:
        plist = group["pos"]
        if isinstance(plist, pa.ChunkedArray):
            plist = plist.combine_chunks()
        plist = plist.take(pa.array(order))
        positions = plist.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)

    aux = None
    if "atf" in group.column_names:
        # field-aware build: a (term, doc) pair may arrive as one BODY
        # row (tf>0, positions) and one ANCHOR row (tf=0, atf>0) — merge
        # duplicates into ONE posting carrying both channels (the
        # reference folds every field's hits into a single posting
        # stream, CompileHitList.h:142-177).  Duplicates are adjacent
        # after the (term, doc) sort; positions are unaffected (only
        # body rows contribute position bytes).
        atf_s = group["atf"].to_numpy(zero_copy_only=False).astype(np.uint64)[order]
        if n:
            dup = (np.diff(tid_s) == 0) & (np.diff(doc_s) == 0)
            keep = np.concatenate(([0], np.flatnonzero(~dup) + 1))
            tf_s = np.add.reduceat(tf_s, keep)
            aux = np.add.reduceat(atf_s, keep)
            tid_s, doc_s, salt_s = tid_s[keep], doc_s[keep], salt_s[keep]
            n = len(tid_s)
        else:
            aux = atf_s

    starts = np.flatnonzero(np.diff(tid_s)) + 1
    term_starts = np.concatenate(([0], starts, [n]))
    first = term_starts[:-1]

    cols = encode_term_partition(term_starts, doc_s, tf_s,
                                 positions=positions, aux=aux)
    t_tid = tid_s[first]
    t_salt = salt_s[first]
    cf = np.add.reduceat(tf_s.astype(np.int64), first) if n else np.empty(0, np.int64)
    part = (t_tid % np.int64(num_index_parts)).astype(np.int32)
    out = {
        "term_id": pa.array(t_tid, pa.int64()),
        "salt": pa.array(t_salt, pa.uint8()),
        "cf": pa.array(cf, pa.int64()),
        "part": pa.array(part, pa.int32()),
        **cols,
    }
    if aux is not None:
        acf = np.add.reduceat(aux.astype(np.int64), first) if n \
            else np.empty(0, np.int64)
        out["acf"] = pa.array(acf, pa.int64())
    return pa.table(out)


def build_postings(tokens: rd.Dataset, hot_term_ids: dict[int, int],
                   num_docs: int,
                   num_shards: int = DEFAULT_SHARDS,
                   num_salts: int = DEFAULT_SALTS,
                   num_index_parts: int = DEFAULT_INDEX_PARTS,
                   coalesce_blocks: int = 32) -> rd.Dataset:
    """Token rows -> encoded posting rows (see module docstring).

    ``coalesce_blocks``: the sort-based groupby's cost scales with the
    number of INPUT blocks (measured: 248 blocks -> 18s, 32 -> 3.3s on
    18M rows), so the sharded rows are coalesced first.  At real scale
    pick ``total_token_bytes / ~256MB`` instead of 32 — the parameter
    exists for exactly that."""
    sharded = tokens.map_batches(
        make_shard_assigner(hot_term_ids, num_docs, num_shards, num_salts),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
    if coalesce_blocks:
        sharded = sharded.repartition(coalesce_blocks)
    return sharded.groupby("shard").map_groups(
        lambda g: _encode_group(g, num_index_parts),
        batch_format="pyarrow",
    )
