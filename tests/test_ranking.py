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


def test_score_with_prior_matches_manual_blend(t1_index_dir):
    import numpy as np

    from hadoopsearchengine_ray.pipelines.query import BM25Scorer

    sc = BM25Scorer(t1_index_dir)
    space = sc.rd.doc_space
    prior = np.linspace(0.0, 2.0, space)
    terms = ["data", "spark", "return"]
    d0, s0 = sc.score_exact(terms, space)  # ALL candidates
    blend = {int(d): float(s) + 0.4 * prior[int(d)] for d, s in zip(d0, s0)}
    exp = sorted(blend.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    d1, s1 = sc.score_with_prior(terms, 10, prior, 0.4)
    assert [int(x) for x in d1] == [k for k, _ in exp]
    assert np.allclose(s1, [v for _, v in exp])


def test_expected_reward_deterministic_and_shaped(ray_session):
    import numpy as np
    import ray.data as rd

    from hadoopsearchengine_ray.corpus import links_table
    from hadoopsearchengine_ray.oracle import pagerank_oracle
    from hadoopsearchengine_ray.pipelines.wavepass import expected_reward

    n = 300
    lt = links_table(n)
    er1, pr1, lab1 = expected_reward(rd.from_arrow(lt), n)
    er2, pr2, lab2 = expected_reward(rd.from_arrow(lt), n)
    assert np.array_equal(lab1, lab2) and np.allclose(er1, er2)
    exp_pr = pagerank_oracle(lt["src"].to_numpy(), lt["dst"].to_numpy(),
                             lt["weight"].to_numpy(), n)
    assert np.allclose(pr1, exp_pr, rtol=1e-9, atol=1e-12)
    # members of one cluster share the authority value
    for c in np.unique(lab1)[:5]:
        vals = er1[lab1 == c]
        assert np.allclose(vals, vals[0])
    # hierarchy actually coarsened
    assert len(np.unique(lab1)) < n


# ---- LM-Dirichlet ranking (Zhai & Lafferty 2001) -----------------------

LM_QUERIES = [["merge"], ["spark", "window"],
              ["merge", "window", "stream"], ["zzqqxxnotaterm0"]]


def test_lm_dirichlet_matches_oracle(t1_index_dir, t1_oracle):
    idx, _ = t1_oracle
    sc = BM25Scorer(t1_index_dir)
    for terms in LM_QUERIES:
        d, s = sc.score_lm(terms, 10)
        gold = idx.lm_topk(terms, 10)
        assert [int(x) for x in d] == [g[0] for g in gold], terms
        assert np.allclose(s, [g[1] for g in gold], atol=1e-9), terms


def test_lm_dirichlet_pool_parity(t1_index_dir):
    from hadoopsearchengine_ray.pipelines.pool import RangePartitionedPool

    single = BM25Scorer(t1_index_dir)
    pool = RangePartitionedPool(t1_index_dir, num_ranges=3)
    try:
        for terms in LM_QUERIES:
            d1, s1 = single.score_lm(terms, 10)
            d2, s2 = pool.score_lm(terms, 10)
            assert [int(x) for x in d1] == [int(x) for x in d2], terms
            np.testing.assert_array_equal(s1, s2)  # bit-identical: one
            # owner fully scores each doc with the same op order
    finally:
        pool.shutdown()


def test_lm_dirichlet_reader_without_cf_stats_raises(t1_index_dir):
    import pytest

    sc = BM25Scorer(t1_index_dir)

    class NoCf:   # delta/tombstone wrappers don't expose cf corrections
        pass

    sc.rd = NoCf()
    with pytest.raises(NotImplementedError):
        sc.score_lm(["merge"], 5)


def test_ltr_features_matches_bruteforce(tmp_path, t1_oracle):
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.functions.search import ltr_features
    from tests.conftest import T1_DOCS, doc_id_table

    idx, _ = t1_oracle
    docs_path = str(tmp_path / "docs.parquet")
    pq.write_table(doc_id_table(0, T1_DOCS), docs_path)
    terms = ["merge", "window", "stream"]
    got = ltr_features(docs_path, terms)
    # brute force from the oracle's positional shadow
    want: dict[int, list[int]] = {}
    for t in sorted(set(terms)):
        for doc_id, poss in idx.positions.get(t, {}).items():
            f = want.setdefault(doc_id, [0, 0, 0, 1 << 60])
            f[0] += 1                      # n_matched
            f[1] += len(poss)              # tf_sum
            f[2] = max(f[2], len(poss))    # tf_max
            f[3] = min(f[3], poss[0] + 1)  # min_pos (1-based)
    assert sorted(got["doc_id"]) == sorted(want)
    g = got.set_index("doc_id")
    for doc_id, (nm, ts, tm, mp) in want.items():
        row = g.loc[doc_id]
        assert (int(row["n_matched"]), int(row["tf_sum"]),
                int(row["tf_max"]), int(row["min_pos"])) == (nm, ts, tm, mp)
        assert int(row["dl"]) == idx.doclen[doc_id]


def test_cli_query_lm_ranker(t1_index_dir, t1_oracle, capsys):
    import json

    from hadoopsearchengine_ray.__main__ import main

    idx, _ = t1_oracle
    assert main(["query", "--index", t1_index_dir, "--ranker", "lm",
                 "-k", "5", "merge window"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    gold = idx.lm_topk(["merge", "window"], 5)
    assert [h["doc_id"] for h in out["hits"]] == [g[0] for g in gold]
