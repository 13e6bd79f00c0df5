"""Internal: shared flat-token kernel for batch operators.

Five operators (shingles, simhash, fingerprints, stemmed tokens, anchor
titles) need the same view of a tokenized ``list<string>`` column:
per-doc counts, a dictionary-encoded flat token array, int codes, the
owning-doc index per token, and blake2b-64 hashes of the distinct
tokens.  Centralized here so the stanza can't drift between copies
(round-2 review finding)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def flat_token_view(toks, flat: pa.Array | None = None):
    """(counts, dict_array, codes, doc_idx) for a list<string> column.

    ``flat``: optional replacement flat values (e.g. stemmed tokens) —
    must align 1:1 with ``toks.flatten()``."""
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = np.diff(toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    if flat is None:
        flat = toks.flatten()
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return counts, d, codes, doc_idx


def hashed_uniques(dictionary: pa.Array) -> np.ndarray:
    """blake2b-64 (uint64, big-endian) per distinct token — hashed once
    per batch dictionary, never per occurrence."""
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                        "big") for t in dictionary.to_pylist()),
        np.uint64, len(dictionary))


def md5_low64(s: str) -> int:
    """md5 low-64 of a string: digest bytes [8:16], little-endian — the
    single source of the DuckDB ``md5_number_lower`` parity definition.
    Every operator that sorts or hashes by this value (doc fingerprint,
    stratified sampling) must call this (or ``md5_low64_uniques``) so a
    future tweak cannot silently break one oracle and not the others."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def md5_low64_uniques(dictionary: pa.Array) -> np.ndarray:
    """``md5_low64`` per distinct token, hashed once per batch
    dictionary, never per occurrence."""
    return np.fromiter((md5_low64(t) for t in dictionary.to_pylist()),
                       np.uint64, len(dictionary))


def doc_term_counts(codes: np.ndarray, doc_idx: np.ndarray):
    """Distinct (doc_idx, code) pairs + occurrence counts via one packed
    np.unique — the per-(doc, term) tf combine."""
    keys = (doc_idx.astype(np.uint64) << np.uint64(32)) | codes.astype(np.uint64)
    uniq, cnt = np.unique(keys, return_counts=True)
    return ((uniq >> np.uint64(32)).astype(np.int64),
            (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
            cnt.astype(np.int64))
