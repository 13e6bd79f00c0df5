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


def _shingle_hashes(token_lists: list[list[str]], n: int) -> list[np.ndarray]:
    """Per-doc array of distinct n-gram shingle hashes (uint64)."""
    out = []
    for toks in token_lists:
        if len(toks) < n:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        sh = set()
        for i in range(len(toks) - n + 1):
            s = " ".join(toks[i:i + n])
            sh.add(int.from_bytes(
                hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"))
        out.append(np.fromiter(sh, dtype=np.uint64, count=len(sh)))
    return out


def shingle_table(docs: rd.Dataset, text_col: str = "text",
                  n: int = 3) -> rd.Dataset:
    """(shingle: uint64, doc_id) distinct rows."""

    def _emit(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col]).to_pylist()
        hs = _shingle_hashes(toks, n)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(ids, [len(h) for h in hs])
        return pa.table({
            "shingle": pa.array(np.concatenate(hs) if hs else
                                np.empty(0, np.uint64), pa.uint64()),
            "doc_id": pa.array(doc, pa.int64()),
        })

    return docs.map_batches(_emit, batch_format="pyarrow", zero_copy_batch=True)


def shingle_overlap_pairs(docs: rd.Dataset, text_col: str = "text", n: int = 3,
                          min_common: int = 5, max_df: int = 50) -> rd.Dataset:
    """n-gram-overlap candidate pairs: (d1 < d2, common shingle count).

    Shingles shared by more than ``max_df`` docs are excluded on BOTH the
    engine and oracle side (skew cap — a keyword-only shingle would
    otherwise pair half the corpus quadratically)."""
    sh = shingle_table(docs, text_col, n)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > max_df:
            return pd.DataFrame({"d1": [], "d2": []}, dtype=np.int64)
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"d1": ids[i], "d2": ids[j]})

    pairs = sh.groupby("shingle").map_groups(_pairs, batch_format="pandas")
    agg = pairs.groupby(["d1", "d2"]).aggregate(Count(alias_name="common"))
    return agg.filter(expr=f"common >= {min_common}")


def minhash_signatures(docs: rd.Dataset, text_col: str = "text", n: int = 3,
                       num_perm: int = 64, seed: int = 13) -> rd.Dataset:
    """Per-doc MinHash signature over n-gram shingles (list<uint64>)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**61 - 1, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**61 - 1, num_perm, dtype=np.uint64)

    def _sig(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col]).to_pylist()
        hs = _shingle_hashes(toks, n)
        sigs = []
        for h in hs:
            if len(h) == 0:
                sigs.append(np.full(num_perm, np.iinfo(np.uint64).max, np.uint64))
                continue
            # (a*x + b) universal hashing, min per permutation — vectorized
            v = (np.outer(h, a) + b)  # uint64 wraparound is fine
            sigs.append(v.min(axis=0))
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.uint64())),
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
    sigs = minhash_signatures(docs, text_col, n, num_perm, seed)

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_doc, out_band, out_hash = [], [], []
        for did, sig in zip(ids, batch["sig"].to_pylist()):
            s = np.asarray(sig, dtype=np.uint64)
            for bi in range(bands):
                chunk = s[bi * rows_per_band:(bi + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                out_doc.append(int(did))
                out_band.append(bi)
                out_hash.append(int.from_bytes(h, "big"))
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "bhash": pa.array(out_hash, pa.uint64()),
        })

    banded = sigs.map_batches(_bands, batch_format="pyarrow")

    def _cands(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(np.unique(g["doc_id"].to_numpy()))
        if len(ids) < 2 or len(ids) > 200:
            return pd.DataFrame({"d1": [], "d2": []}, dtype=np.int64)
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"d1": ids[i], "d2": ids[j]})

    cands = (banded.groupby(["band", "bhash"])
             .map_groups(_cands, batch_format="pandas")
             .groupby(["d1", "d2"])
             .aggregate(Count(alias_name="nbands")))

    # verify candidates against full signatures (broadcast: signatures of
    # candidate docs only — small side)
    sig_pdf = sigs.to_pandas().set_index("doc_id")["sig"]
    import ray
    sig_ref = ray.put({int(k): np.asarray(v, np.uint64)
                       for k, v in sig_pdf.items()})

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(sig_ref)
        est = [float((lut[d1] == lut[d2]).mean())
               for d1, d2 in zip(batch["d1"], batch["d2"])]
        batch = batch.assign(jaccard_est=np.round(est, 4))
        return batch[batch["jaccard_est"] >= jaccard_threshold][
            ["d1", "d2", "jaccard_est"]]

    return cands.map_batches(_verify, batch_format="pandas")


def simhash_table(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """64-bit SimHash per doc over term hashes weighted by tf."""

    def _simhash(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col]).to_pylist()
        out = []
        for tl in toks:
            if not tl:
                out.append(0)
                continue
            acc = np.zeros(64, dtype=np.int64)
            terms, counts = np.unique(tl, return_counts=True)
            for t, c in zip(terms, counts):
                h = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
                bits = (h >> np.arange(64, dtype=np.uint64)) & 1
                acc += np.where(bits == 1, c, -c)
            out.append(int((acc > 0).astype(np.uint64)
                           @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))
                       & 0x7FFFFFFFFFFFFFFF)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "simhash": pa.array(out, pa.int64()),
        })

    return docs.map_batches(_simhash, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dup_pairs(docs: rd.Dataset, text_col: str = "text",
                      max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming, found by
    the 4-block pigeonhole trick (any pair within distance 3 agrees on at
    least one of 4 16-bit blocks -> groupby block value, verify in-group)."""
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

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2 or len(ids) > 500:
            return pd.DataFrame({"d1": [], "d2": [], "hamming": []}, dtype=np.int64)
        i, j = np.triu_indices(len(ids), k=1)
        x = hs[i] ^ hs[j]
        ham = np.zeros(len(x), dtype=np.int64)
        while x.any():
            ham += (x & 1).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"d1": ids[i][keep], "d2": ids[j][keep],
                             "hamming": ham[keep]})

    pairs = (sh.map_batches(_blocks, batch_format="pyarrow")
             .groupby(["block", "bval"])
             .map_groups(_pairs, batch_format="pandas"))
    # a pair can match in multiple blocks -> dedup with min
    return pairs.groupby(["d1", "d2"]).aggregate(Min("hamming", alias_name="hamming"))
