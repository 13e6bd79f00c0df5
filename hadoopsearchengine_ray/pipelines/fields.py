"""Unified multi-field index + BM25F serving (M8's hit-type bits, done).

The reference folds TITLE/EXCERPT/LINK flags into every posting
(``enc=(pos<<3)|type_bits``, /root/reference/FileStorage.h:317-465;
routing /root/reference/DyableHitList/DyableHitList/CompileHitList.h:142-177)
so ONE posting read scores all fields together.  This module is the Ray
rebuild: one build produces one index whose posting rows carry

- ``tf_blob``   body term frequency,
- ``pos_blob``  body positions (title tf derives from positions < title_len
  — the title region replaces the TITLE type bit),
- ``aux_blob``  anchor-field term frequency (links' anchor text attributed
  to the TARGET doc — the LINK type bit),

and the scorer reads all three channels in a single pass per query term
(one dictionary, one posting partition, one decode).  Compare round-2,
where title boost and anchor BM25 needed two separate index dirs and two
readers.

BM25F semantics (mirrored exactly by the driver's SQL oracle):

    tfc(d,t)  = tf + (title_boost-1) * tf_title + anchor_w * tf_anchor
    dlc(d)    = dl_body + anchor_w * dl_anchor
    avgdlc    = (total_body_tokens + anchor_w * total_anchor_tokens) / N
    idf from UNION df (docs where any field matches)
    score     = sum_t idf * tfc * (k1+1) / (tfc + k1*(1-b+b*dlc/avgdlc))
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
from ..stages.dictionary import hot_terms_from_vocab, vocab_table
from ..stages.postings import build_postings
from .anchor import TITLE_LEN, anchor_links, anchor_token_table

UNIFIED_FORMAT_VERSION = 1
K1 = 1.2
B = 0.75


def _body_token_rows(docs: rd.Dataset, text_col: str,
                     id_col: str) -> rd.Dataset:
    """(doc_id u64, term, tf u32, pos list<u32>, atf u32=0) body rows."""
    from ..stages.tokenize import tokenize_batch

    def _tok(batch: pa.Table) -> pa.Table:
        t = tokenize_batch(batch, text_col=text_col, id_col=id_col,
                           with_positions=True)
        n = t.num_rows
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.uint64()),
            "term": t["term"],
            "tf": t["tf"].cast(pa.uint32()),
            "pos": t["pos"],
            "atf": pa.array(np.zeros(n, np.uint32), pa.uint32()),
        })

    return docs.map_batches(_tok, batch_format="pyarrow", zero_copy_batch=True)


def _anchor_token_rows(docs: rd.Dataset, links: rd.Dataset, text_col: str,
                       id_col: str, title_len: int) -> rd.Dataset:
    """(doc_id u64, term, tf=0, pos=[], atf u32) anchor rows."""
    tok = anchor_token_table(docs, links, text_col, id_col, title_len)

    def _shape(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty_pos = pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, np.int32), pa.int32()),
            pa.array([], pa.uint32()))
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.uint64()),
            "term": batch["term"],
            "tf": pa.array(np.zeros(n, np.uint32), pa.uint32()),
            "pos": empty_pos,
            "atf": batch["tf"].cast(pa.uint32()),
        })

    return tok.map_batches(_shape, batch_format="pyarrow", batch_size=None)


def build_unified_index(docs_path: str, index_dir: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        title_len: int = TITLE_LEN,
                        hot_df_frac: float = 0.25,
                        num_shards: int = 32, num_salts: int = 4,
                        num_index_parts: int = 16) -> dict:
    """Build (or resume) the unified body+anchor index: ONE build, ONE
    on-disk layout, served by one reader.  Anchor text = source-doc
    titles over the deterministic link set (anchor.anchor_links)."""
    os.makedirs(index_dir, exist_ok=True)
    man = Manifest.load(os.path.join(index_dir, "manifest.json"))
    lineage = (f"unified-v{UNIFIED_FORMAT_VERSION}:t{title_len}:"
               f"{lineage_fingerprint([docs_path])}")
    meta_path = os.path.join(index_dir, "meta.json")
    if man.is_done("unified", lineage, meta_path):
        with open(meta_path) as f:
            return json.load(f)
    man.start("unified", lineage, meta_path)

    num_docs = pads.dataset(docs_path).count_rows()
    docs = rd.read_parquet(docs_path, columns=[id_col, text_col])
    links = rd.from_arrow(anchor_links(num_docs))

    body = _body_token_rows(docs, text_col, id_col)
    anchor = _anchor_token_rows(
        rd.read_parquet(docs_path, columns=[id_col, text_col]),
        links, text_col, id_col, title_len)
    rows = body.union(anchor).materialize()

    post_dir = os.path.join(index_dir, "postings")
    doclen_dir = os.path.join(index_dir, "doclen")
    dict_dir = os.path.join(index_dir, "dictionary")
    for d in (post_dir, doclen_dir, dict_dir):
        shutil.rmtree(d, ignore_errors=True)

    # hot-term detection over the union rows (body + anchor df combined)
    vocab = vocab_table(rows.select_columns(["doc_id", "term"])).materialize()
    hot_ids = hot_terms_from_vocab(vocab, num_docs, hot_df_frac)

    post = build_postings(rows, hot_term_ids=hot_ids, num_docs=num_docs,
                          num_shards=num_shards, num_salts=num_salts,
                          num_index_parts=num_index_parts,
                          coalesce_blocks=16)
    post.sort("term_id").write_parquet(post_dir, partition_cols=["part"],
                                       row_group_size=2048)

    # per-doc lengths for BOTH fields in one aggregate pass
    from ray.data.aggregate import Sum

    dl = (rows.select_columns(["doc_id", "tf", "atf"])
          .groupby("doc_id")
          .aggregate(Sum("tf", alias_name="dl"),
                     Sum("atf", alias_name="adl")))
    dl.write_parquet(doclen_dir)

    from ..stages.dictionary import dictionary_from_postings

    dictionary_from_postings(
        rd.read_parquet(post_dir, columns=["term_id", "df", "cf"]),
        vocab,
    ).write_parquet(dict_dir)

    dl_tbl = pads.dataset(doclen_dir).to_table()
    total_body = int(dl_tbl.column("dl").combine_chunks()
                     .cast("int64").sum().as_py() or 0)
    total_anchor = int(dl_tbl.column("adl").combine_chunks()
                       .cast("int64").sum().as_py() or 0)
    meta = {
        "num_docs": num_docs,
        "doc_id_space": num_docs,
        "total_tokens": total_body,
        "total_anchor_tokens": total_anchor,
        "avgdl": total_body / num_docs if num_docs else 0.0,
        "k1": K1, "b": B,
        "hot_df_frac": hot_df_frac,
        "hot_term_ids": {str(k): v for k, v in hot_ids.items()},
        "num_shards": num_shards, "num_salts": num_salts,
        "num_index_parts": num_index_parts,
        "id_col": id_col, "with_positions": True,
        "with_fields": True, "title_len": title_len,
    }
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(meta_path + ".tmp", meta_path)
    man.finish("unified", num_docs=num_docs)
    return meta


class BM25FScorer:
    """One-reader-pass BM25F over the unified index: body tf, title tf
    (positions < title_len) and anchor tf decoded from ONE posting row
    per term; a single dictionary and doc-length table serve all fields.
    Exact dense TAAT (sorted-term accumulation, (-score, doc_id) ties) —
    rank-identical to the SQL oracle."""

    def __init__(self, index_dir: str):
        from .query import IndexReader, _topk_from_scores

        self.rd = IndexReader(index_dir)
        self._topk = _topk_from_scores
        if not self.rd.meta.get("with_fields"):
            raise ValueError("not a unified field-aware index; build with "
                             "fields.build_unified_index")
        self.title_len = int(self.rd.meta["title_len"])
        self.total_anchor = int(self.rd.meta["total_anchor_tokens"])
        # adl array (anchor doc length), parallel to rd.dl
        dl_tbl = pads.dataset(os.path.join(index_dir, "doclen")).to_table()
        self.adl = np.zeros(self.rd.doc_space, dtype=np.float64)
        ids = dl_tbl.column("doc_id").to_numpy().astype(np.int64)
        self.adl[ids] = dl_tbl.column("adl").to_numpy().astype(np.float64)
        self._aux_cache: dict[str, np.ndarray] = {}
        # reusable dense scratch, O(touched)-reset per query (same
        # pattern as query.BM25Scorer._scratch)
        self._scores = np.zeros(self.rd.doc_space, dtype=np.float64)
        self._touched = np.zeros(self.rd.doc_space, dtype=bool)
        self._prev: np.ndarray | None = None
        self._dirty = False

    def decoded_aux(self, term: str) -> np.ndarray:
        hit = self._aux_cache.get(term)
        if hit is not None:
            return hit
        from ..codec import decode_aux

        rows = self.rd.posting_rows(term)
        if not rows:
            return np.empty(0, np.uint64)
        out = np.concatenate([
            decode_aux(r["aux_blob"], r["df"]) for r in rows])
        if len(self._aux_cache) > 8192:
            self._aux_cache.clear()
        self._aux_cache[term] = out
        return out

    def score(self, terms: list[str], k: int,
              title_boost: float = 2.0, anchor_w: float = 1.5):
        r = self.rd
        avgdlc = ((r.meta["total_tokens"] + anchor_w * self.total_anchor)
                  / r.N) if r.N else 0.0
        if self._dirty:
            self._scores = np.zeros(r.doc_space, dtype=np.float64)
            self._touched = np.zeros(r.doc_space, dtype=bool)
        elif self._prev is not None and len(self._prev):
            self._scores[self._prev] = 0.0
            self._touched[self._prev] = False
        self._dirty, self._prev = True, None
        scores, touched = self._scores, self._touched
        parts: list[np.ndarray] = []
        for t in sorted(set(terms)):
            ent = r.lookup(t)
            if not ent:
                continue
            _, df = ent
            w = r.idf(df)
            d, f, flat, offs = r.decoded_positions(t)
            if len(d) == 0:
                continue
            atf = self.decoded_aux(t).astype(np.float64)
            d = d.astype(np.int64)
            tf = f.astype(np.float64)
            # title tf: positions < title_len, bincount per posting row
            # (np.add.reduceat mis-handles the empty segments of
            # anchor-only postings, so scatter instead)
            fi = f.astype(np.int64)
            row_of_pos = np.repeat(np.arange(len(d)), fi)
            tft = np.bincount(
                row_of_pos[flat < np.uint64(self.title_len)],
                minlength=len(d)).astype(np.float64)
            tfc = tf + (title_boost - 1.0) * tft + anchor_w * atf
            dlc = r.dl[d] + anchor_w * self.adl[d]
            denom = tfc + r.k1 * (1.0 - r.b + r.b * dlc / avgdlc)
            nz = tfc > 0
            new = d[~touched[d]]
            if len(new):
                parts.append(new)
            scores[d[nz]] += w * tfc[nz] * (r.k1 + 1.0) / denom[nz]
            touched[d] = True
        docs = np.concatenate(parts) if parts else np.empty(0, np.int64)
        self._prev, self._dirty = docs, False
        return self._topk(docs, scores[docs], k)


def bm25f_topk(docs_path: str, terms: list[str], k: int = 10,
               title_boost: float = 2.0, anchor_w: float = 1.5,
               cache_root: str = "/tmp/hse_unified_cache"):
    """Driver-facing BM25F top-k over the unified index — (rank, doc_id)."""
    import hashlib

    import pandas as pd

    key = hashlib.sha256(docs_path.encode()).hexdigest()[:16]
    index_dir = os.path.join(cache_root, key)
    build_unified_index(docs_path, index_dir)
    d, _ = BM25FScorer(index_dir).score(terms, k, title_boost, anchor_w)
    return pd.DataFrame({
        "rank": pd.array(range(1, len(d) + 1), dtype="int64"),
        "doc_id": pd.array([int(x) for x in d], dtype="int64"),
    })
