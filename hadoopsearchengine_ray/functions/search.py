"""Driver-facing full-text search over an arbitrary (doc_id, text) table.

Builds (or reuses via the manifest) an on-disk index under /tmp for the
given table, then serves BM25 top-k through the scorer — the glue between
the generic documents table and the index/query pipelines.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd

from ..pipelines.build_index import build_index
from ..pipelines.query import BM25Scorer

CACHE_ROOT = "/tmp/hse_index_cache"


def index_for(parquet_path: str, text_col: str = "text",
              id_col: str = "doc_id") -> str:
    """Build-or-reuse an index for a documents parquet; returns index dir.

    The manifest's lineage fingerprint makes this a no-op when the input
    is unchanged (resume path exercised on every driver run)."""
    key = hashlib.sha256(parquet_path.encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, key)
    build_index(
        parquet_path, index_dir,
        id_mode="column", id_col=id_col, text_col=text_col,
        hot_df_frac=0.25,
    )
    return index_dir


def bm25_topk_table(parquet_path: str, terms: list[str], k: int = 10,
                    text_col: str = "text") -> pd.DataFrame:
    """(rank, doc_id) int64 — rank-identical contract with the SQL oracle."""
    index_dir = index_for(parquet_path, text_col=text_col)
    scorer = BM25Scorer(index_dir)
    d, _ = scorer.score(terms, k)
    return pd.DataFrame({
        "rank": pd.array(range(1, len(d) + 1), dtype="int64"),
        "doc_id": pd.array([int(x) for x in d], dtype="int64"),
    })
