"""PageRank-blended ranking and proximity re-rank."""

import numpy as np
import ray.data as rd

from hadoopsearchengine_ray import corpus, oracle
from hadoopsearchengine_ray.pipelines.docstore import (
    proximity_rerank,
    proximity_score,
    write_docstore,
)
from hadoopsearchengine_ray.pipelines.pagerank import pagerank_dataset
from hadoopsearchengine_ray.pipelines.query import BM25Scorer
from tests.conftest import T1_DOCS


def test_pagerank_blended_ranking(tmp_path, t1_corpus_dir, t1_index_dir, t1_oracle):
    idx, _ = t1_oracle
    links = rd.from_arrow(corpus.links_table(T1_DOCS))
    pr_dir = str(tmp_path / "pr")
    pagerank_dataset(links, T1_DOCS).write_parquet(pr_dir)

    w = 0.1
    sc = BM25Scorer(t1_index_dir, pagerank_dir=pr_dir, pr_weight=w)
    gold_pr = oracle.pagerank_oracle(
        *(corpus.links_table(T1_DOCS)[c].to_numpy() for c in ("src", "dst", "weight")),
        T1_DOCS)
    for terms in (["def"], ["tadelode"], ["def", "return", "class"]):
        d, s = sc.score(terms, 10)
        # oracle blend: bm25 over ALL candidates + w*pr, ties by doc_id
        cand = {}
        for t in sorted(set(terms)):
            for doc_id, tf in idx.postings.get(t, ()):
                wq = idx.idf(t)
                dl = idx.doclen[doc_id]
                cand[doc_id] = cand.get(doc_id, 0.0) + wq * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * dl / idx.avgdl))
        blended = sorted(((-(v + w * gold_pr[doc]), doc) for doc, v in cand.items()))
        exp = [doc for _, doc in blended[:10]]
        assert list(d) == exp, terms
        assert np.allclose(s, [-x for x, _ in blended[:10]], atol=1e-6)
    # weight 0 behaves exactly like plain BM25
    sc0 = BM25Scorer(t1_index_dir, pagerank_dir=pr_dir, pr_weight=0.0)
    d0, s0 = sc0.score(["def"], 5)
    db, sb = BM25Scorer(t1_index_dir).score(["def"], 5)
    assert list(d0) == list(db) and np.allclose(s0, sb)


def test_proximity_score():
    text = "aa xx xx bb yy aa bb"
    m, w = proximity_score(text, ["aa", "bb"])
    assert m == 2 and w == 2  # "aa bb" at positions 5,6
    m, w = proximity_score(text, ["aa", "zz"])
    assert m == 1 and w == 10**9
    m, w = proximity_score("", ["aa"])
    assert m == 0


def test_proximity_rerank_prefers_tight_windows(tmp_path, t1_corpus_dir,
                                                t1_index_dir):
    from hadoopsearchengine_ray.stages.ingest import load_corpus, zip_with_index

    store = str(tmp_path / "store")
    ds = zip_with_index(load_corpus(t1_corpus_dir),
                        sort_keys=["repo", "path", "commit"])
    write_docstore(ds, store)
    out = proximity_rerank(t1_index_dir, store, ["def", "return"], k=10)
    rows = out.to_pylist()
    assert len(rows) == 10
    keys = [(-r["matched_terms"],
             r["min_window"] if r["min_window"] >= 0 else 10**9,
             -r["bm25"]) for r in rows]
    assert keys == sorted(keys)
    assert rows[0]["matched_terms"] == 2
