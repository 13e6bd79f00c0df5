"""Anchor-text indexing (J4): link anchor terms indexed into the TARGET
document's posting lists.

The reference logs every link's anchor text into the target doc's hit
stream (/root/reference/DyableHitList/DyableLogFile/IndexLogFile.h:70-102)
and unions anchor hit files with base hits before the posting sort
(DyableSort/SortHitList/SortHitList.cpp:96-120) — anchor terms are a
first-class relevance signal scored from separate lists.

Ray-native rebuild over the generic documents table:

- the link set is a DETERMINISTIC formula over doc ids (each doc links to
  ``(i*31+7) % N`` and ``(i*17+3) % N``) so the whole pipeline stays
  SQL-expressible for the driver oracle;
- a link's anchor text = the first ``title_len`` valid tokens of the
  SOURCE doc (its title — the reference takes anchor text from the link
  markup; the synthetic corpus has none, titles are the stand-in);
- title rows join links with the co-partitioned ``hash_join`` (both
  sides are corpus-sized — the J1 shuffle join, not a broadcast), then
  aggregate to (target doc_id, term, tf);
- the anchor postings reuse the SAME posting/codec/dictionary machinery
  as the body index (build_postings), written in the standard index
  layout so ``BM25Scorer`` serves anchor-BM25 unchanged.  BM25 stats
  (N, avgdl, df) are computed over the anchor pseudo-docs.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import ray.data as rd

from ..state.manifest import Manifest, lineage_fingerprint
from ..stages.dictionary import dictionary_from_postings, vocab_table
from ..stages.postings import build_postings
from ..tokenizer import tokenize_column

TITLE_LEN = 8
ANCHOR_FORMAT_VERSION = 1


def anchor_links(num_docs: int) -> pa.Table:
    """Deterministic two-out-links-per-doc link set (SQL-mirrorable)."""
    i = np.arange(num_docs, dtype=np.int64)
    src = np.concatenate([i, i])
    dst = np.concatenate([(i * 31 + 7) % num_docs, (i * 17 + 3) % num_docs])
    keep = src != dst
    return pa.table({
        "src": pa.array(src[keep], pa.int64()),
        "dst": pa.array(dst[keep], pa.int64()),
    })


def title_token_table(docs: rd.Dataset, text_col: str = "text",
                      id_col: str = "doc_id",
                      title_len: int = TITLE_LEN) -> rd.Dataset:
    """(src, term, tf) over each doc's first ``title_len`` valid tokens."""
    import pyarrow.compute as pc

    def _titles(batch: pa.Table) -> pa.Table:
        from .._tokflat import doc_term_counts, flat_token_view

        toks = pc.list_slice(tokenize_column(batch[text_col]), 0, title_len)
        _, d, codes, doc_idx = flat_token_view(toks)
        u_doc, u_code, cnt = doc_term_counts(codes, doc_idx)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(ids[u_doc], pa.int64()),
            "term": d.dictionary.take(
                pa.array(u_code.astype(np.int32))).cast(pa.string()),
            "tf": pa.array(cnt, pa.int64()),
        })

    return docs.map_batches(_titles, batch_format="pyarrow", zero_copy_batch=True)


def anchor_token_table(docs: rd.Dataset, links: rd.Dataset,
                       text_col: str = "text", id_col: str = "doc_id",
                       title_len: int = TITLE_LEN) -> rd.Dataset:
    """(doc_id=target, term, tf) anchor token rows: titles ⋈ links summed
    per (target, term) — the IndexLogFile anchor-hit emission."""
    from ray.data.aggregate import Sum

    from .relational import hash_join

    titles = title_token_table(docs, text_col, id_col, title_len)
    joined = hash_join(titles, links, on="src")

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["dst"].cast(pa.uint64()),
            "term": batch["term"],
            "tf": batch["tf"],
        })

    return (joined.map_batches(_shape, batch_format="pyarrow", batch_size=None)
            .groupby(["doc_id", "term"])
            .aggregate(Sum("tf", alias_name="tf")))


def build_anchor_index(docs_path: str, index_dir: str,
                       text_col: str = "text", id_col: str = "doc_id",
                       title_len: int = TITLE_LEN,
                       num_shards: int = 16, num_index_parts: int = 8) -> dict:
    """Build (or resume) the anchor index in the standard layout
    (postings/ doclen/ dictionary/ meta.json) so BM25Scorer serves it."""
    os.makedirs(index_dir, exist_ok=True)
    man = Manifest.load(os.path.join(index_dir, "manifest.json"))
    lineage = (f"anchor-v{ANCHOR_FORMAT_VERSION}:t{title_len}:"
               f"{lineage_fingerprint([docs_path])}")
    meta_path = os.path.join(index_dir, "meta.json")
    if man.is_done("anchor", lineage, meta_path):
        with open(meta_path) as f:
            return json.load(f)
    man.start("anchor", lineage, meta_path)

    num_docs = pads.dataset(docs_path).count_rows()
    docs = rd.read_parquet(docs_path, columns=[id_col, text_col])
    links = rd.from_arrow(anchor_links(num_docs))
    tok = anchor_token_table(docs, links, text_col, id_col,
                             title_len).materialize()

    post_dir = os.path.join(index_dir, "postings")
    doclen_dir = os.path.join(index_dir, "doclen")
    dict_dir = os.path.join(index_dir, "dictionary")
    vocab_dir = os.path.join(index_dir, "vocab")
    for d in (post_dir, doclen_dir, dict_dir, vocab_dir):
        shutil.rmtree(d, ignore_errors=True)

    def _cast_tf(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "term": batch["term"],
            "tf": batch["tf"].cast(pa.uint32()),
        })

    tok32 = tok.map_batches(_cast_tf, batch_format="pyarrow", batch_size=None)
    post = build_postings(tok32, hot_term_ids={}, num_docs=num_docs,
                          num_shards=num_shards, num_salts=1,
                          num_index_parts=num_index_parts,
                          coalesce_blocks=16)
    post.sort("term_id").write_parquet(post_dir, partition_cols=["part"],
                                       row_group_size=2048)

    from ray.data.aggregate import Sum

    tok.groupby("doc_id").aggregate(Sum("tf", alias_name="dl")) \
        .write_parquet(doclen_dir)
    vocab_table(tok).write_parquet(vocab_dir)
    dictionary_from_postings(
        rd.read_parquet(post_dir, columns=["term_id", "df", "cf"]),
        rd.read_parquet(vocab_dir),
    ).write_parquet(dict_dir)

    dl_tbl = pads.dataset(doclen_dir).to_table()
    n_anchor_docs = dl_tbl.num_rows
    total = int(dl_tbl.column("dl").combine_chunks().cast("int64").sum().as_py() or 0)
    meta = {
        "num_docs": n_anchor_docs,
        "doc_id_space": num_docs,
        "total_tokens": total,
        "avgdl": total / n_anchor_docs if n_anchor_docs else 0.0,
        "k1": 1.2, "b": 0.75,
        "hot_df_frac": 1.0, "hot_term_ids": {},
        "num_shards": num_shards, "num_salts": 1,
        "num_index_parts": num_index_parts,
        "id_col": id_col, "with_positions": False,
        "title_len": title_len,
    }
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(meta_path + ".tmp", meta_path)
    man.finish("anchor", anchor_docs=n_anchor_docs)
    return meta


def anchor_bm25_topk(docs_path: str, terms: list[str], k: int = 10,
                     cache_root: str = "/tmp/hse_anchor_cache"):
    """BM25 top-k over the ANCHOR field only — (rank, doc_id) int64."""
    import hashlib

    import pandas as pd

    from .query import BM25Scorer

    key = hashlib.sha256(docs_path.encode()).hexdigest()[:16]
    index_dir = os.path.join(cache_root, key)
    build_anchor_index(docs_path, index_dir)
    d, _ = BM25Scorer(index_dir).score(terms, k)
    return pd.DataFrame({
        "rank": pd.array(range(1, len(d) + 1), dtype="int64"),
        "doc_id": pd.array([int(x) for x in d], dtype="int64"),
    })
