"""Incremental (delta) indexing: add documents without a full rebuild.

The reference rebuilds from scratch (stage toggling is its only
"resume"); real users of an index need to append documents.  Design:
new docs build a normal SMALL index (same stages, same codec) into a
delta directory; serving merges main + deltas logically:

- doc ids are disjoint by contract (delta ids must be >= the main
  index's doc_id_space — validated loudly);
- BM25 stats merge exactly: N and total_tokens add, df(term) adds, so
  idf/avgdl over the merged reader equal a full rebuild's — merged
  top-k is RANK-IDENTICAL to rebuilding from scratch (tested, and the
  bm25_delta_topk driver query shares the full-corpus SQL oracle);
- posting lists concatenate in reader order = ascending doc ranges, so
  the doc-ordered invariants (delta-gap decode, MaxScore skip blocks)
  hold without re-encoding.

Compaction (folding deltas into the main index) is a rebuild over the
union — the manifest/lineage machinery already covers it.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .build_index import build_index
from .query import BM25Scorer, IndexReader


class MergedIndexReader:
    """IndexReader-compatible view over a main index + delta indexes."""

    def __init__(self, index_dirs: list[str]):
        self.readers = [IndexReader(d) for d in index_dirs]
        metas = [r.meta for r in self.readers]
        self.N = sum(m["num_docs"] for m in metas)
        total = sum(m["total_tokens"] for m in metas)
        self.avgdl = total / self.N if self.N else 0.0
        self.k1 = metas[0]["k1"]
        self.b = metas[0]["b"]
        self.doc_space = max(r.doc_space for r in self.readers)
        self.dl = np.zeros(self.doc_space, dtype=np.float64)
        for r in self.readers:
            self.dl[: len(r.dl)] += r.dl   # disjoint id ranges by contract

    def lookup(self, term: str):
        tid, df = None, 0
        for r in self.readers:
            ent = r.lookup(term)
            if ent:
                tid = ent[0]
                df += ent[1]
        return (tid, df) if tid is not None else None

    def idf(self, df: int) -> float:
        return float(np.log((self.N - df + 0.5) / (df + 0.5) + 1.0))

    def posting_rows(self, term: str) -> list[dict]:
        out = []
        for r in self.readers:   # reader order == ascending doc ranges
            out.extend(r.posting_rows(term))
        return out

    def decoded_postings(self, term: str):
        parts = [r.decoded_postings(term) for r in self.readers]
        docs = [p[0] for p in parts if len(p[0])]
        tfs = [p[1] for p in parts if len(p[1])]
        if not docs:
            e = np.empty(0, np.uint64)
            return e, e
        return np.concatenate(docs), np.concatenate(tfs)

    def decoded_positions(self, term: str):
        parts = [r.decoded_positions(term) for r in self.readers]
        docs = [p[0] for p in parts if len(p[0])]
        if not docs:
            e = np.empty(0, np.uint64)
            return e, e, e, np.zeros(1, np.int64)
        tf_all = np.concatenate([p[1] for p in parts if len(p[0])])
        flat = np.concatenate([p[2] for p in parts if len(p[0])])
        offs = np.concatenate(([0], np.cumsum(tf_all))).astype(np.int64)
        return np.concatenate(docs), tf_all, flat, offs


def add_documents(main_index_dir: str, corpus_path: str,
                  text_col: str = "text", id_col: str = "doc_id",
                  **build_kwargs) -> str:
    """Build (or resume) a delta index for ``corpus_path`` under
    ``main_index_dir/deltas/<fingerprint>``; returns the delta dir.

    The new corpus must carry EXPLICIT doc ids disjoint from the main
    index (>= its doc_id_space) — overlapping ids would corrupt merged
    doc lengths and postings, so they fail loudly."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    with open(os.path.join(main_index_dir, "meta.json")) as f:
        main_meta = json.load(f)
    lo = pads.dataset(corpus_path).to_table(columns=[id_col])
    min_id = pc.min(lo[id_col]).as_py() if lo.num_rows else None
    if min_id is not None and min_id < main_meta["doc_id_space"]:
        raise ValueError(
            f"delta doc ids must be >= main doc_id_space "
            f"({main_meta['doc_id_space']}); got min id {min_id} — "
            "renumber the new docs before indexing")
    import hashlib

    key = hashlib.sha256(corpus_path.encode()).hexdigest()[:12]
    delta_dir = os.path.join(main_index_dir, "deltas", key)
    build_index(corpus_path, delta_dir, id_mode="column", id_col=id_col,
                text_col=text_col,
                with_positions=main_meta.get("with_positions", True),
                **build_kwargs)
    return delta_dir


def merged_scorer(main_index_dir: str,
                  delta_dirs: list[str] | None = None) -> BM25Scorer:
    """BM25Scorer over main + deltas (deltas auto-discovered when not
    given), rank-identical to a scorer over a full rebuild."""
    if delta_dirs is None:
        droot = os.path.join(main_index_dir, "deltas")
        delta_dirs = sorted(
            os.path.join(droot, d) for d in os.listdir(droot)
        ) if os.path.isdir(droot) else []
    reader = MergedIndexReader([main_index_dir] + list(delta_dirs))
    return BM25Scorer(main_index_dir, reader=reader)
