"""Deduplication operators: exact, shingle-overlap, MinHash-LSH, SimHash,
embedding-cosine near-dup.

Exact dedup generalizes the reference's base-URL dedup
(/root/reference/DyableHitList/DyableLogFile/IndexLogFile.h:46-53);
the near-dup family is the training-data-pipeline extension (the
reference's only near-dup is the query-time excerpt checksum,
CompileRankedList.h:203-242).

Scale notes: every operator is shuffle-by-key (hash of content / shingle /
band / simhash-prefix), never an all-pairs comparison; shingle groups are
frequency-capped so stopword-like shingles cannot create quadratic pair
blowup (the skew amputation idea, Webpage.h:334-346, applied to pairs).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..tokenizer import tokenize_column


def exact_dedup(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """(doc_id_keep = min doc_id, n_dups) per distinct content.

    Hash-partition by sha256(content) then per-group min — identical to
    ``GROUP BY text`` because sha256 collisions are negligible; the hash
    keeps the shuffle key small (64 hex chars vs arbitrary content)."""

    def _hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(t.encode()).hexdigest()
              for t in batch[text_col].to_pylist()]
        return pa.table({
            "h": pa.array(hs, pa.string()),
            "doc_id": batch["doc_id"].cast(pa.int64()),
        })

    agg = (docs.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("h")
           .aggregate(Min("doc_id", alias_name="doc_id"),
                      Count(alias_name="n_dups")))
    return agg.select_columns(["doc_id", "n_dups"])


def incremental_dedup(new_docs: rd.Dataset, existing_hashes: rd.Dataset,
                      text_col: str = "text", id_col: str = "doc_id",
                      hash_col: str = "sha256",
                      num_buckets: int = 64) -> rd.Dataset:
    """Continual-ingestion dedup: from an incoming batch, keep only docs
    whose content hash (a) does not already exist in the indexed corpus
    (anti-join against ``existing_hashes``, e.g. the index's ``sha256``
    stage output) and (b) is the FIRST occurrence within the batch
    (lowest ``id_col`` per hash).  Output: (doc_id, h) of the survivors.

    The reference dedups at crawl time against its base-URL/content maps
    (Webpage.h base-URL dedup; content checksum D4); this is the same
    gate expressed as ONE co-partitioned shuffle — both sides tagged and
    bucketed by hash (the hash_join pattern, relational.py:151), each
    bucket a vectorized set-difference.  Neither side is broadcast or
    driver-materialized, so the indexed corpus can be 10^12 docs."""

    def _hash_new(batch: pa.Table) -> pa.Table:
        from ..stages.ingest import sha256_hex_column

        return pa.table({
            "h": sha256_hex_column(batch[text_col], null_to_empty=True),
            id_col: batch[id_col].cast(pa.int64()),
        })

    def _tag(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            if side == 1:   # existing side arrives as (hash_col,) rows
                batch = pa.table({
                    "h": batch[hash_col].cast(pa.string()),
                    id_col: pa.nulls(batch.num_rows, pa.int64()),
                })
            b = pd.util.hash_pandas_object(
                batch.select(["h"]).to_pandas(), index=False).to_numpy()
            return batch.append_column(
                "__side", pa.array(np.full(batch.num_rows, side, np.int8))
            ).append_column(
                "__bucket", pa.array((b % num_buckets).astype(np.int64)))
        return _t

    nt = (new_docs.map_batches(_hash_new, batch_format="pyarrow",
                               zero_copy_batch=True)
          .map_batches(_tag(0), batch_format="pyarrow", batch_size=None))
    et = existing_hashes.select_columns([hash_col]).map_batches(
        _tag(1), batch_format="pyarrow", batch_size=None)

    def _anti(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if g.num_rows == 0 or "__side" not in g.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "h": pa.array([], pa.string())})
        side = g["__side"]
        new = g.filter(pc.equal(side, 0))
        seen = g.filter(pc.equal(side, 1))["h"].to_pandas()
        ids = new[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = new["h"].to_pandas()
        order = np.lexsort((ids, hs.to_numpy()))  # per hash, lowest id first
        hs_s = hs.to_numpy()[order]
        ids_s = ids[order]
        first = np.ones(len(hs_s), bool)
        if len(hs_s) > 1:
            first[1:] = hs_s[1:] != hs_s[:-1]
        # vectorized hashtable membership (no per-row Python `in`)
        keep = first & ~pd.Series(hs_s).isin(seen).to_numpy()
        return pa.table({id_col: pa.array(ids_s[keep], pa.int64()),
                         "h": pa.array(list(hs_s[keep]), pa.string())})

    from ..pipelines.relational import _coalesce_for_buckets

    return (_coalesce_for_buckets(nt.union(et), num_buckets)
            .groupby("__bucket")
            .map_groups(_anti, batch_format="pyarrow"))


_SH_P = np.uint64(0x100000001B3)


def _doc_shingle_flat(toks, n: int) -> tuple[np.ndarray, np.ndarray, int]:
    """DISTINCT (doc_idx, shingle_hash) pairs for a batch, vectorized.

    Shingle hash = polynomial combine (base P mod 2^64) of the blake2b-64
    hashes of the n consecutive tokens.  Each distinct TOKEN is hashed
    once per batch; windows are built with shifted flat views and doc
    boundaries masked — no per-doc or per-shingle Python loop (round-2
    fix).  Equality relation identical to hashing the joined string
    (injective up to 64-bit collisions), which is what the pair oracle
    compares."""
    from .._tokflat import flat_token_view, hashed_uniques

    counts, d, codes, doc_idx = flat_token_view(toks)
    ndoc = len(counts)
    uhash = hashed_uniques(d.dictionary)
    th = uhash[codes] if len(codes) else np.empty(0, np.uint64)
    L = len(th)
    if L < n:
        e = np.empty(0, np.int64)
        return e, np.empty(0, np.uint64), ndoc
    W = L - n + 1
    acc = th[:W].copy()
    for k in range(1, n):
        acc = acc * _SH_P + th[k:W + k]
    valid = doc_idx[:W] == doc_idx[n - 1:]
    dsel = doc_idx[:W][valid]
    hsel = acc[valid]
    # distinct (doc, shingle): lexsort + adjacent dedup
    order = np.lexsort((hsel, dsel))
    dsel, hsel = dsel[order], hsel[order]
    if len(dsel):
        keep = np.ones(len(dsel), bool)
        keep[1:] = (np.diff(dsel) != 0) | (np.diff(hsel) != 0)
        dsel, hsel = dsel[keep], hsel[keep]
    return dsel, hsel, ndoc


def shingle_table(docs: rd.Dataset, text_col: str = "text",
                  n: int = 3) -> rd.Dataset:
    """(shingle: uint64, doc_id) distinct rows."""

    def _emit(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        dsel, hsel, _ = _doc_shingle_flat(toks, n)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "shingle": pa.array(hsel, pa.uint64()),
            "doc_id": pa.array(ids[dsel], pa.int64()),
        })

    return docs.map_batches(_emit, batch_format="pyarrow", zero_copy_batch=True)


def _pairs_from_grouped(keys: np.ndarray, doc_ids: np.ndarray,
                        max_df: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (d1 < d2) pairs per key group + LOCAL pair counts.

    Input sorted by key; emits partial (d1, d2, count) aggregated within
    the bucket — the map-side combine for the final (d1, d2) groupby."""
    starts = np.flatnonzero(np.diff(keys)) + 1
    bounds = np.concatenate(([0], starts, [len(keys)]))
    return _pairs_from_bounds(bounds, doc_ids, max_df)


def _pairs_from_bounds(bounds: np.ndarray, doc_ids: np.ndarray,
                       max_df: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pair emission given precomputed group boundaries (for multi-column
    group keys where a single diff-able key array doesn't exist)."""
    p1, p2 = [], []
    skipped = 0
    for a, b in zip(bounds[:-1], bounds[1:]):
        m = b - a
        if m < 2:
            continue
        if m > max_df:
            skipped += 1  # oversize bucket amputated (skew cap)
            continue
        ids = np.sort(doc_ids[a:b])
        i, j = np.triu_indices(m, k=1)
        p1.append(ids[i])
        p2.append(ids[j])
    if skipped:
        import sys
        print(f"[dedup] {skipped} candidate bucket(s) exceeded max_df={max_df} "
              "and were skipped (potential false negatives)", file=sys.stderr)
    if not p1:
        e = np.empty(0, np.int64)
        return e, e, e
    d1 = np.concatenate(p1).astype(np.int64)
    d2 = np.concatenate(p2).astype(np.int64)
    # local combine: pack (d1, d2) into one key, unique-count.
    # Packing needs doc ids < 2^32; beyond that, shard the corpus by doc
    # range before pairing (ids are per-shard) — fail loudly, not wrongly.
    if len(d2) and int(d2.max()) >= 1 << 32:
        raise ValueError("pair packing requires doc ids < 2^32; "
                         "run near-dup pairing per doc-id range shard")
    packed = (d1.astype(np.uint64) << np.uint64(32)) | d2.astype(np.uint64)
    uniq, cnt = np.unique(packed, return_counts=True)
    return ((uniq >> np.uint64(32)).astype(np.int64),
            (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
            cnt.astype(np.int64))


def _bucketed_shingles(docs: rd.Dataset, text_col: str, n: int,
                       num_buckets: int) -> rd.Dataset:
    """Hash-bucketed shingle rows, coalesced to ``num_buckets`` blocks:
    the sort shuffle behind the downstream groupby makes ~B output
    ranges for B input blocks, so with only num_buckets distinct bucket
    keys the coalesce removes pure scheduling overhead (the
    relational._coalesce_for_buckets finding)."""
    sh = shingle_table(docs, text_col, n)

    def _bucket(batch: pa.Table) -> pa.Table:
        s = batch["shingle"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "bucket", pa.array((s % np.uint64(num_buckets)).astype(np.int64)))

    return (sh.map_batches(_bucket, batch_format="pyarrow", batch_size=None)
            .repartition(num_buckets))


def shingle_overlap_pairs(docs: rd.Dataset, text_col: str = "text", n: int = 3,
                          min_common: int = 5, max_df: int = 50,
                          num_buckets: int = 32,
                          sh_bucketed: rd.Dataset | None = None) -> rd.Dataset:
    """n-gram-overlap candidate pairs: (d1 < d2, common shingle count).

    Shingles shared by more than ``max_df`` docs are excluded on BOTH the
    engine and oracle side (skew cap — a keyword-only shingle would
    otherwise pair half the corpus quadratically).

    Shuffle shape: shingles are hash-bucketed so the groupby sees
    ``num_buckets`` groups, not one per shingle — per-shingle pair
    emission happens vectorized inside each bucket task with local
    (d1, d2) pre-aggregation (thousands of tiny map_groups calls cost
    more than the pairs themselves; see BASELINE.md).

    ``sh_bucketed``: optional pre-built ``_bucketed_shingles`` dataset
    (ngram_jaccard_pairs shares ONE materialized table between the pair
    and the size side instead of shingling the corpus twice)."""
    if sh_bucketed is None:
        sh_bucketed = _bucketed_shingles(docs, text_col, n, num_buckets)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["shingle"].to_numpy(), kind="stable")
        keys = g["shingle"].to_numpy()[order]
        ids = g["doc_id"].to_numpy()[order]
        d1, d2, cnt = _pairs_from_grouped(keys, ids, max_df)
        packed = (d1.astype(np.uint64) << np.uint64(32)) | d2.astype(np.uint64)
        return pd.DataFrame({
            "pair": packed.astype(np.int64),
            "pbucket": (packed % np.uint64(num_buckets)).astype(np.int64),
            "c": cnt,
        })

    # second bucketed combine: a plain groupby over ~1M distinct pairs is
    # dominated by per-group overhead (measured 200s for 3s of compute);
    # 32 pair-buckets with a vectorized in-bucket reduction instead
    def _combine_pairs(g: pd.DataFrame) -> pd.DataFrame:
        pair = g["pair"].to_numpy().astype(np.uint64)
        c = g["c"].to_numpy().astype(np.int64)
        uniq, inv = np.unique(pair, return_inverse=True)
        tot = np.bincount(inv, weights=c).astype(np.int64)
        keep = tot >= min_common
        uniq = uniq[keep]
        return pd.DataFrame({
            "d1": (uniq >> np.uint64(32)).astype(np.int64),
            "d2": (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
            "common": tot[keep],
        })

    return (sh_bucketed
            .groupby("bucket")
            .map_groups(_pairs, batch_format="pandas")
            .groupby("pbucket")
            .map_groups(_combine_pairs, batch_format="pandas"))


def ngram_jaccard_pairs(docs: rd.Dataset, text_col: str = "text", n: int = 3,
                        threshold: float = 0.5, min_common: int = 3,
                        max_df: int = 50, num_buckets: int = 32,
                        broadcast_max_docs: int = 5_000_000) -> rd.Dataset:
    """EXACT n-gram Jaccard near-dup pairs: (d1 < d2, jaccard: double).

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) over each doc's DISTINCT
    n-gram shingle set, restricted to shingles with global df <=
    ``max_df`` (boilerplate shingles are excluded from BOTH the
    intersection and the set sizes, so the cap changes the universe, not
    just the candidate recall — same skew amputation as
    ``shingle_overlap_pairs``).  No sketching: this is the exact
    counterpart the MinHash estimate converges to.

    Shuffle shape: the pair side reuses ``shingle_overlap_pairs``
    (bucketed double-combine); the size side is one pass over the same
    hash-bucketed shingle table (df per shingle is exact within a bucket
    because bucketing is by shingle hash) with a second bucketed
    bincount combine — NOT a doc-cardinality ``groupby().sum()``, whose
    per-group overhead was measured at 11.7s for 117k partial rows.
    Size attach is size-dispatched like minhash verification: corpora
    <= ``broadcast_max_docs`` broadcast one (doc_id, sz) lookup via
    ``ray.put`` (read zero-copy in every pair task); bigger corpora go
    through two co-partitioned hash joins — never a driver-side pair
    loop.  Both paths produce identical rows (pytest-checked)."""
    import ray

    from ..pipelines.relational import hash_join

    # shingle the corpus ONCE: the pair side and the size side consume
    # the same materialized bucketed table (two separate shingle_table
    # chains would tokenize+hash the whole corpus twice)
    sh_bucketed = _bucketed_shingles(docs, text_col, n,
                                     num_buckets).materialize()
    pairs = shingle_overlap_pairs(docs, text_col, n, min_common, max_df,
                                  num_buckets, sh_bucketed=sh_bucketed)

    def _sizes(g: pd.DataFrame) -> pd.DataFrame:
        s = g["shingle"].to_numpy().astype(np.uint64)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        uniq, inv, cnt = np.unique(s, return_inverse=True, return_counts=True)
        keep = cnt[inv] <= max_df
        ud, c = np.unique(ids[keep], return_counts=True)
        out = pd.DataFrame({"doc_id": ud, "psz": c.astype(np.int64)})
        out["dbucket"] = ud % num_buckets
        return out

    def _sum_sizes(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy().astype(np.int64)
        psz = g["psz"].to_numpy().astype(np.int64)
        uniq, inv = np.unique(ids, return_inverse=True)
        tot = np.bincount(inv, weights=psz).astype(np.int64)
        return pd.DataFrame({"doc_id": uniq, "sz": tot})

    sizes = (sh_bucketed
             .groupby("bucket")
             .map_groups(_sizes, batch_format="pandas")
             .groupby("dbucket")
             .map_groups(_sum_sizes, batch_format="pandas")
             .select_columns(["doc_id", "sz"]))

    def _jac_cols(common, sz1, sz2, d1, d2):
        jac = common / (sz1 + sz2 - common)
        keep = jac >= threshold
        return pa.table({
            "d1": pa.array(d1[keep], pa.int64()),
            "d2": pa.array(d2[keep], pa.int64()),
            "jaccard": pa.array(jac[keep], pa.float64()),
        })

    n_docs = docs.count()   # parquet metadata — no execution
    if n_docs <= broadcast_max_docs:
        stbl = [ray.get(r) for r in sizes.to_arrow_refs()]
        stbl = [t for t in stbl if t.num_rows]
        if stbl:
            sz_tbl = pa.concat_tables(stbl)
            lut_ids = sz_tbl.column("doc_id").to_numpy().astype(np.int64)
            order = np.argsort(lut_ids)
            lut = (lut_ids[order],
                   sz_tbl.column("sz").to_numpy().astype(np.int64)[order])
        else:
            lut = (np.empty(0, np.int64), np.empty(0, np.int64))
        lut_ref = ray.put(lut)

        def _attach(batch: pa.Table) -> pa.Table:
            ids_s, szs = ray.get(lut_ref)
            d1 = batch["d1"].to_numpy(zero_copy_only=False).astype(np.int64)
            d2 = batch["d2"].to_numpy(zero_copy_only=False).astype(np.int64)
            common = batch["common"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            sz1 = szs[np.searchsorted(ids_s, d1)]
            sz2 = szs[np.searchsorted(ids_s, d2)]
            return _jac_cols(common, sz1, sz2, d1, d2)

        return pairs.map_batches(_attach, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def _as_side(col: str, out: str):
        def _r(batch: pa.Table) -> pa.Table:
            return pa.table({
                col: batch["doc_id"].cast(pa.int64()),
                out: batch["sz"].cast(pa.int64()),
            })
        return _r

    sizes = sizes.materialize()   # consumed by both joins — execute once
    j = hash_join(pairs,
                  sizes.map_batches(_as_side("d1", "sz1"),
                                    batch_format="pyarrow"), on="d1")
    j = hash_join(j,
                  sizes.map_batches(_as_side("d2", "sz2"),
                                    batch_format="pyarrow"), on="d2")

    def _jac(batch: pa.Table) -> pa.Table:
        return _jac_cols(
            batch["common"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["sz1"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["sz2"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["d1"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["d2"].to_numpy(zero_copy_only=False).astype(np.int64))

    return j.map_batches(_jac, batch_format="pyarrow", zero_copy_batch=True)


def minhash_signatures(docs: rd.Dataset, text_col: str = "text", n: int = 3,
                       num_perm: int = 64, seed: int = 13) -> rd.Dataset:
    """Per-doc MinHash signature over n-gram shingles (list<uint64>)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**61 - 1, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**61 - 1, num_perm, dtype=np.uint64)

    def _sig(batch: pa.Table) -> pa.Table:
        # vectorized across docs: per-segment minimum.reduceat over the
        # (shingles, num_perm) permutation matrix, chunked to bound the
        # temp to ~32 MB; docs with no shingles keep the max signature
        toks = tokenize_column(batch[text_col])
        dsel, hsel, ndoc = _doc_shingle_flat(toks, n)
        sigm = np.full((ndoc, num_perm), np.iinfo(np.uint64).max, np.uint64)
        if len(dsel):
            starts = np.flatnonzero(np.diff(dsel)) + 1
            bounds = np.concatenate(([0], starts))
            seg_docs = dsel[bounds]
            seg_ends = np.concatenate((starts, [len(dsel)]))
            CH = 1 << 16
            i = 0
            while i < len(bounds):
                j = i + 1
                while j < len(bounds) and seg_ends[j - 1] - bounds[i] <= CH:
                    j += 1
                lo, hi = bounds[i], seg_ends[j - 1]
                v = hsel[lo:hi, None] * a + b   # uint64 wraparound is the mod
                mins = np.minimum.reduceat(v, bounds[i:j] - lo, axis=0)
                sigm[seg_docs[i:j]] = mins
                i = j
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "sig": pa.ListArray.from_arrays(
                pa.array(np.arange(ndoc + 1, dtype=np.int32) * num_perm),
                pa.array(sigm.ravel(), pa.uint64())),
        })

    return docs.map_batches(_sig, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_pairs(docs: rd.Dataset, text_col: str = "text", n: int = 3,
                      num_perm: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.8,
                      seed: int = 13) -> rd.Dataset:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    shingle -> minhash -> band buckets (groupby) -> candidate pairs ->
    verify estimated Jaccard (signature agreement) >= threshold.
    Returns (d1, d2, jaccard_est: double rounded to 4dp)."""
    rows_per_band = num_perm // bands
    # materialize: the signature pipeline (tokenize + shingle + minhash,
    # the dominant cost) is consumed by BOTH banding and verification —
    # without this it would execute twice
    sigs = minhash_signatures(docs, text_col, n, num_perm, seed).materialize()

    def _bands(batch: pa.Table) -> pa.Table:
        # vectorized band hashing (round-2 fix of the per-doc-per-band
        # hashlib loop): the (n, num_perm) signature matrix is mixed per
        # band with an FNV-over-words chain + murmur-style finalizer —
        # rows_per_band numpy ops per band, no Python per row
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["sig"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sig = (col.flatten().to_numpy(zero_copy_only=False)
               .astype(np.uint64).reshape(len(ids), num_perm))
        # docs with NO shingles carry the all-max sentinel signature:
        # banding them would pair every short doc with every other short
        # doc at est 1.0 (true Jaccard 0) — exclude them up front
        real = sig[:, 0] != np.iinfo(np.uint64).max
        ids, sig = ids[real], sig[real]
        n = len(ids)
        bh = np.empty((n, bands), np.uint64)
        P = np.uint64(0x100000001B3)
        for bi in range(bands):
            h = np.full(n, np.uint64(0xCBF29CE484222325), np.uint64)
            for c in range(rows_per_band):
                h = (h ^ sig[:, bi * rows_per_band + c]) * P
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
            bh[:, bi] = h
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                             pa.int32()),
            "bhash": pa.array(bh.ravel(), pa.uint64()),
        })

    banded = sigs.map_batches(_bands, batch_format="pyarrow")

    # hash-bucketed candidate generation: 32 groups instead of one per
    # (band, bhash) — per-bucket tasks emit pairs vectorized over their
    # many band groups with local pre-aggregation (BASELINE.md pattern)
    def _bucket(batch: pa.Table) -> pa.Table:
        b = batch["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = batch["bhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "bucket", pa.array(((b * np.uint64(0x9E3779B9) ^ h)
                                % np.uint64(32)).astype(np.int64)))

    def _cands(g: pd.DataFrame) -> pd.DataFrame:
        # group on the FULL (band, bhash) pair via lexsort + two-column
        # boundary detection (a packed single key would discard hash bits
        # and merge distinct LSH buckets — round-2 advice fix)
        b = g["band"].to_numpy().astype(np.uint64)
        h = g["bhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((h, b))
        bs, hs = b[order], h[order]
        starts = np.flatnonzero((np.diff(bs) != 0) | (np.diff(hs) != 0)) + 1
        bounds = np.concatenate(([0], starts, [len(bs)]))
        d1, d2, cnt = _pairs_from_bounds(
            bounds, g["doc_id"].to_numpy()[order], max_df=200)
        return pd.DataFrame({"d1": d1, "d2": d2, "c": cnt})

    from ray.data.aggregate import Sum

    cands = (banded.map_batches(_bucket, batch_format="pyarrow", batch_size=None)
             .groupby("bucket")
             .map_groups(_cands, batch_format="pandas")
             .groupby(["d1", "d2"])
             .aggregate(Sum("c", alias_name="nbands"))).materialize()
    if cands.count() == 0:
        # no candidates: an empty aggregate loses its schema, which the
        # verify joins can't consume — return the typed empty result
        return rd.from_pandas(pd.DataFrame(
            {"d1": pd.Series(dtype="int64"), "d2": pd.Series(dtype="int64"),
             "jaccard_est": pd.Series(dtype="float64")}))

    # verify candidates against full signatures.  Two plans, dispatched
    # by candidate count (the join-dispatch pattern):
    # - small candidate sets: collect pairs + only the needed signatures
    #   to the driver (two cheap passes — the joins' shuffle overhead
    #   dominates at this size);
    # - big / dup-heavy: two co-partitioned hash joins attach each
    #   side's signature and a vectorized per-batch estimate filters —
    #   the driver never sees pairs or signatures.
    n_cands = cands.count()
    if n_cands <= 100_000:
        cand_pdf = cands.to_pandas()
        needed = set(cand_pdf["d1"]) | set(cand_pdf["d2"])

        def _only_needed(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["doc_id"].isin(needed)]

        sig_pdf = (sigs.map_batches(_only_needed, batch_format="pandas",
                                    batch_size=None)
                   .to_pandas().set_index("doc_id")["sig"])
        lut = {int(k): np.asarray(v, np.uint64) for k, v in sig_pdf.items()}
        est = np.round([float((lut[a] == lut[b]).mean())
                        for a, b in zip(cand_pdf["d1"], cand_pdf["d2"])], 4)
        out = cand_pdf.assign(jaccard_est=est)
        out = out[out["jaccard_est"] >= jaccard_threshold][
            ["d1", "d2", "jaccard_est"]].reset_index(drop=True)
        return rd.from_pandas(out)

    from ..pipelines.relational import hash_join

    from ..codec import _binary_from_offsets

    def _sig_as(dcol: str, scol: str):
        # signatures travel as fixed-width BINARY blobs: plain bytes
        # survive the pandas merge hops without tensor-extension types
        def _r(batch: pa.Table) -> pa.Table:
            col = batch["sig"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n = len(col)
            flat = col.flatten().to_numpy(zero_copy_only=False).astype("<u8")
            offs = (np.arange(n + 1, dtype=np.int64) * num_perm * 8)
            blob = _binary_from_offsets(
                np.frombuffer(flat.tobytes(), np.uint8), offs)
            return pa.table({dcol: batch["doc_id"].cast(pa.int64()),
                             scol: blob})
        return _r

    sig1 = sigs.map_batches(_sig_as("d1", "sig1"), batch_format="pyarrow",
                            batch_size=None)
    sig2 = sigs.map_batches(_sig_as("d2", "sig2"), batch_format="pyarrow",
                            batch_size=None)
    # arrow round-trip between the joins: the pandas join blocks report
    # object dtypes, which would type the second join's null padding as
    # string and mix binary/string blocks into the shuffle
    j1 = hash_join(cands, sig1, on="d1").map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=None)
    joined = hash_join(j1, sig2, on="d2")

    def _estimate(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"d1": pd.Series(dtype="int64"),
                                 "d2": pd.Series(dtype="int64"),
                                 "jaccard_est": pd.Series(dtype="float64")})
        s1 = np.frombuffer(b"".join(batch["sig1"]), np.uint64).reshape(len(batch), -1)
        s2 = np.frombuffer(b"".join(batch["sig2"]), np.uint64).reshape(len(batch), -1)
        est = np.round((s1 == s2).mean(axis=1), 4)
        keep = est >= jaccard_threshold
        return pd.DataFrame({
            "d1": batch["d1"].to_numpy()[keep].astype("int64"),
            "d2": batch["d2"].to_numpy()[keep].astype("int64"),
            "jaccard_est": est[keep],
        })

    return joined.map_batches(_estimate, batch_format="pandas",
                              batch_size=None)


def dedup_clusters(pairs: rd.Dataset, num_docs: int,
                   max_rounds: int = 10_000) -> np.ndarray:
    """Connected components over near-dup pairs: min-label propagation
    with pointer-jumping (each doc's cluster id = smallest doc id
    reachable through pair edges).  Same pinned-edge-blocks +
    dense-partial iteration shape as PageRank; the driver-side pointer
    jumps (label = label[label]) compress paths so long duplicate chains
    converge in O(log n) rounds, not O(diameter).  Runs to convergence
    (max_rounds is a runaway backstop, not a precision cap).  Returns an
    array mapping doc_id -> cluster representative (min doc id)."""
    import ray

    from .._block import column_np, nonempty_block_refs

    block_refs = nonempty_block_refs(pairs.materialize())

    @ray.remote
    def _minprop(block, label: np.ndarray, n: int) -> np.ndarray:
        d1 = column_np(block, "d1", np.int64)
        d2 = column_np(block, "d2", np.int64)
        out = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(out, d1, label[d2])
        np.minimum.at(out, d2, label[d1])
        return out

    label = np.arange(num_docs, dtype=np.int64)
    for _ in range(max_rounds):
        ref = ray.put(label)
        parts = ray.get([_minprop.remote(b, ref, num_docs) for b in block_refs])
        if not parts:
            break
        nxt = np.minimum.reduce(parts + [label])
        # pointer jumping: follow representative chains to their fixpoint
        # (cheap dense driver step; turns path graphs from O(n) rounds
        # into O(log n))
        while True:
            jumped = np.minimum(nxt, nxt[nxt])
            if np.array_equal(jumped, nxt):
                break
            nxt = jumped
        if np.array_equal(nxt, label):
            break
        label = nxt
    return label


def _star_round(edges: rd.Dataset, kind: str,
                num_buckets: int = 32) -> rd.Dataset:
    """One large-star or small-star round of the MapReduce connected-
    components algorithm (Kiveris et al., "Connected Components in
    MapReduce and Beyond" — public).  Edges are (u, v) int64; each round
    is one bucketed shuffle + a vectorized per-node min."""

    def _orient(batch: pa.Table) -> pa.Table:
        a = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        if kind == "large":
            # symmetrize: gather the FULL neighborhood at every node
            u = np.concatenate([a, b])
            v = np.concatenate([b, a])
        else:
            # orient high -> low: each node gathers smaller neighbors
            u = np.maximum(a, b)
            v = np.minimum(a, b)
        return pa.table({
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "b": pa.array((u % num_buckets).astype(np.int64)),
        })

    def _star(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "u" not in g.columns:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        u = g["u"].to_numpy().astype(np.int64)
        v = g["v"].to_numpy().astype(np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.diff(u)) + 1
        bounds = np.concatenate(([0], starts))
        uu = u[bounds]
        vmin = np.minimum.reduceat(v, bounds)
        m = np.minimum(vmin, uu)                    # min(Γ(u) ∪ {u})
        m_row = np.repeat(m, np.diff(np.concatenate((bounds, [len(u)]))))
        if kind == "large":
            keep = v > u                            # emit (v, m) for v > u
            ou, ov = v[keep], m_row[keep]
        else:
            keep = v != m_row                       # emit (v, m) for v != m
            ou = np.concatenate([v[keep], uu])      # plus (u, m) per node
            ov = np.concatenate([m_row[keep], m])
        keep2 = ou != ov
        out = pd.DataFrame({"u": ou[keep2], "v": ov[keep2]})
        return out.drop_duplicates()

    return (edges.map_batches(_orient, batch_format="pyarrow",
                              batch_size=None)
            .groupby("b")
            .map_groups(_star, batch_format="pandas"))


def _edge_fingerprint(edges: rd.Dataset) -> tuple[int, int]:
    """(row_count, order-independent 64-bit content hash) of an edge
    set — the O(1)-driver convergence check.  Each block reduces to ONE
    wrapped-uint64 partial row (a Ray Sum over raw int64 hashes would
    overflow into Python bignums and fail Arrow conversion)."""

    def _partial(batch) -> "pd.DataFrame":
        u = np.asarray(batch["u"], dtype=np.int64).astype(np.uint64)
        v = np.asarray(batch["v"], dtype=np.int64).astype(np.uint64)
        h = (u * np.uint64(0x9E3779B97F4A7C15)) ^ (v + np.uint64(0x1234567))
        h ^= h >> np.uint64(33)
        return pd.DataFrame({
            "hs": [np.int64(np.sum(h, dtype=np.uint64).astype(np.int64))],
            "n": [np.int64(len(u))],
        })

    parts = edges.map_batches(_partial, batch_format="pandas",
                              batch_size=None).take_all()
    n = sum(int(p["n"]) for p in parts)
    hs = 0
    for p in parts:
        hs = (hs + int(p["hs"])) & 0xFFFFFFFFFFFFFFFF
    return n, hs


def connected_components(pairs: rd.Dataset, num_buckets: int = 32,
                         max_rounds: int = 64) -> rd.Dataset:
    """Distributed connected components over (d1, d2) pair edges:
    alternating large-star/small-star rounds until the edge set is
    stable (O(log n) rounds), returning a ``(node, root)`` Dataset where
    root = the component's smallest node id.

    The 100-TB path for ``dedup_clusters``: the driver holds only an
    O(1) fingerprint per round — labels never materialize as a dense
    driver array (that dense path remains for small doc spaces).  Nodes
    that never appear in a pair are absent (identity labels — join
    against the doc table at read time)."""

    def _as_edges(batch: pa.Table) -> pa.Table:
        return pa.table({
            "u": batch["d1"].cast(pa.int64()),
            "v": batch["d2"].cast(pa.int64()),
        })

    edges = pairs.map_batches(_as_edges, batch_format="pyarrow",
                              batch_size=None).materialize()
    if edges.count() == 0:
        # schema-less empty blocks would flow through the star rounds and
        # fail the final groupby/Min on missing columns — mirror the
        # minhash empty-candidates guard with a typed empty result
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "root": pa.array([], pa.int64()),
        }))
    prev = _edge_fingerprint(edges)
    for _ in range(max_rounds):
        edges = _star_round(edges, "large", num_buckets)
        edges = _star_round(edges, "small", num_buckets).materialize()
        cur = _edge_fingerprint(edges)
        if cur == prev:
            break
        prev = cur

    # normalize to arrow blocks (star rounds emit pandas) so the union
    # below mixes same-type blocks
    edges = edges.map_batches(
        lambda b: pa.table({"u": b["u"].cast(pa.int64()),
                            "v": b["v"].cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()

    # stable star edges: (child, root); roots themselves get a self row
    def _self_rows(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        roots = np.unique(v)
        return pa.table({"u": pa.array(roots, pa.int64()),
                         "v": pa.array(roots, pa.int64())})

    from ray.data.aggregate import Min

    labels = (edges.union(
        edges.map_batches(_self_rows, batch_format="pyarrow",
                          batch_size=None))
        .groupby("u").aggregate(Min("v", alias_name="root")))

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["u"], "root": batch["root"]})

    return labels.map_batches(_shape, batch_format="pyarrow",
                              batch_size=None)


def simhash_table(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """64-bit SimHash per doc over term hashes weighted by tf.

    Vectorized (round-2 fix of the per-doc-per-term Python loop): each
    DISTINCT term in the batch is blake2b-hashed once, its 64 sign bits
    expanded once, and all per-doc bit accumulators update through a
    single ``np.add.at`` over per-(doc, term) tf counts.  Output values
    identical to the round-1 per-row implementation."""

    def _simhash(batch: pa.Table) -> pa.Table:
        from .._tokflat import doc_term_counts, flat_token_view, hashed_uniques

        counts, d, codes, doc_idx = flat_token_view(tokenize_column(batch[text_col]))
        ndoc = len(counts)
        uhash = hashed_uniques(d.dictionary)
        # (U, 64) sign matrix: +1 where bit set, -1 where clear
        signs = (((uhash[:, None] >> np.arange(64, dtype=np.uint64)) & 1)
                 .astype(np.int64) * 2 - 1)
        # combine to per-(doc, code) tf so the scatter touches far fewer rows
        u_doc, u_code, tf = doc_term_counts(codes, doc_idx)
        acc = np.zeros((ndoc, 64), dtype=np.int64)
        np.add.at(acc, u_doc, signs[u_code] * tf[:, None])
        pows = np.uint64(1) << np.arange(64, dtype=np.uint64)
        sim = np.sum(np.where(acc > 0, pows, np.uint64(0)), axis=1,
                     dtype=np.uint64)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "simhash": pa.array(
                (sim & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64),
                pa.int64()),
        })

    return docs.map_batches(_simhash, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dup_pairs(docs: rd.Dataset, text_col: str = "text",
                      max_hamming: int = 3,
                      max_group: int = 4000) -> rd.Dataset:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming, found by
    the 4-block pigeonhole trick (any pair within distance 3 agrees on at
    least one of 4 16-bit blocks -> groupby block value, verify in-group).

    ``max_group``: groups over this size are SKIPPED (loudly — stderr) to
    cap quadratic verify cost; skipped groups are potential false
    negatives, so size it to the corpus's largest near-identical cluster
    (the round-1 cap of 500 silently dropped 33 real pairs at sf0.1 —
    caught by the driver self-check)."""
    sh = simhash_table(docs, text_col)

    def _blocks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc, blk, val, full = [], [], [], []
        for b in range(4):
            doc.append(ids)
            blk.append(np.full(len(ids), b, np.int32))
            val.append((h >> np.uint64(16 * b)) & np.uint64(0xFFFF))
            full.append(h)
        return pa.table({
            "doc_id": pa.array(np.concatenate(doc), pa.int64()),
            "block": pa.array(np.concatenate(blk), pa.int32()),
            "bval": pa.array(np.concatenate(val), pa.uint64()),
            "simhash": pa.array(np.concatenate(full), pa.uint64()),
        })

    # hash-bucketed verification: 32 groups instead of one per 16-bit
    # block value (BASELINE.md pattern)
    def _bucket(batch: pa.Table) -> pa.Table:
        b = batch["block"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["bval"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "bucket", pa.array((((b << np.uint64(16)) | v)
                                % np.uint64(32)).astype(np.int64)))

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        key = (g["block"].to_numpy().astype(np.uint64) << np.uint64(16)) \
            | g["bval"].to_numpy().astype(np.uint64)
        order = np.argsort(key, kind="stable")
        key = key[order]
        ids = g["doc_id"].to_numpy()[order]
        hs = g["simhash"].to_numpy().astype(np.uint64)[order]
        starts = np.flatnonzero(np.diff(key)) + 1
        bounds = np.concatenate(([0], starts, [len(key)]))
        o1, o2, oh = [], [], []
        skipped = 0
        for a, b in zip(bounds[:-1], bounds[1:]):
            m = b - a
            if m < 2:
                continue
            if m > max_group:
                skipped += 1
                continue
            gi = np.argsort(ids[a:b])
            gid, ghs = ids[a:b][gi], hs[a:b][gi]
            i, j = np.triu_indices(m, k=1)
            x = ghs[i] ^ ghs[j]
            ham = np.zeros(len(x), dtype=np.int64)
            while x.any():
                ham += (x & 1).astype(np.int64)
                x >>= np.uint64(1)
            keep = ham <= max_hamming
            o1.append(gid[i][keep])
            o2.append(gid[j][keep])
            oh.append(ham[keep])
        if skipped:
            import sys
            print(f"[simhash] {skipped} block group(s) exceeded "
                  f"max_group={max_group} and were skipped "
                  "(potential false negatives)", file=sys.stderr)
        if not o1:
            e = np.empty(0, np.int64)
            return pd.DataFrame({"d1": e, "d2": e, "hamming": e})
        return pd.DataFrame({"d1": np.concatenate(o1).astype(np.int64),
                             "d2": np.concatenate(o2).astype(np.int64),
                             "hamming": np.concatenate(oh)})

    pairs = (sh.map_batches(_blocks, batch_format="pyarrow")
             .map_batches(_bucket, batch_format="pyarrow", batch_size=None)
             .groupby("bucket")
             .map_groups(_pairs, batch_format="pandas"))
    # a pair can match in multiple blocks -> dedup with min
    return pairs.groupby(["d1", "d2"]).aggregate(Min("hamming", alias_name="hamming"))


def dup_span_stats(docs: rd.Dataset, text_col: str = "text", n: int = 8,
                   num_buckets: int = 32) -> rd.Dataset:
    """Exact-substring duplication stats (Lee et al., 'Deduplicating
    Training Data Makes Language Models Better' — public paper — scoped
    to fixed-width spans): for every doc, the number of DISTINCT
    ``n``-token grams that also occur in at least one OTHER doc.
    Returns (doc_id, dup_grams) for docs with >= 1 duplicated gram,
    sorted by doc_id.

    Shape: the distinct (gram, doc_id) table rides the existing shingle
    kernel (one vectorized rolling-hash pass per batch, no Python
    loops); grams are hash-bucketed so the groupby sees ``num_buckets``
    groups, and each bucket reduces to per-doc PARTIAL counts (one
    sort + group-size scan + np.unique per bucket) before the final
    tiny per-doc sum — the pair-explosion-free analog of
    shingle_overlap_pairs.  Reference analog: the duplicate-excerpt
    checksum walk of CompileRankedList.h:203-242 applied corpus-wide.

    Caveat: grams compare by 64-bit rolling hash, so hash collisions
    count as real duplicates — unlike shingle_overlap_pairs (where a
    collision only adds a verified-later candidate pair), a collision
    here flows straight into ``dup_grams``.  Expected overcount is
    ~distinct_grams^2 / 2^65 spread over the corpus — negligible below
    ~2^32 distinct grams; past that (the 10^12-doc regime), carry the
    gram STRING through the bucketed exchange instead (the shape the
    contamination pipeline already uses) when exact counts matter."""
    from ray.data.aggregate import Sum

    sh = _bucketed_shingles(docs, text_col, n, num_buckets)

    def _partial(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["shingle"].to_numpy()
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        ids = g["doc_id"].to_numpy()[order]
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        sizes = np.diff(bounds)
        # rows whose gram has >= 2 distinct docs (rows are distinct per
        # (gram, doc) by construction, so group size == distinct docs)
        dup = np.repeat(sizes >= 2, sizes)
        d, c = np.unique(ids[dup], return_counts=True)
        return pd.DataFrame({"doc_id": d.astype(np.int64),
                             "dup_grams": c.astype(np.int64)})

    partials = sh.groupby("bucket").map_groups(_partial)
    out = (partials.groupby("doc_id").aggregate(Sum("dup_grams"))
           .sort("doc_id"))

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "dup_grams": batch["sum(dup_grams)"].cast(pa.int64()),
        })

    return out.map_batches(_rename, batch_format="pyarrow", batch_size=None)
