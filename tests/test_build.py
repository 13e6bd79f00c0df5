"""t1 end-to-end build vs the golden oracle (FIXTURES.md §4.2).

Checks every golden table: dictionary (term, term_id, df, cf) exact;
doclen exact; postings decode to identical (doc_id, tf) sequences
(including salted hot terms); per-row sha256 equality; dense doc ids =
rank over sorted (repo, path, commit).
"""

import collections
import json

import numpy as np
import pyarrow.dataset as pads

from hadoopsearchengine_ray import oracle
from hadoopsearchengine_ray.codec import decode_postings


def test_dictionary_matches_oracle(t1_index_dir, t1_oracle):
    idx, _ = t1_oracle
    eng = (
        pads.dataset(f"{t1_index_dir}/dictionary")
        .to_table()
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    gold = idx.dictionary()
    assert len(eng) == len(gold)
    for (t, tid, df, cf), row in zip(gold, eng.itertuples()):
        assert (row.term, row.term_id, row.df, row.cf) == (t, tid, df, cf)


def test_doclen_and_meta_match_oracle(t1_index_dir, t1_oracle):
    idx, _ = t1_oracle
    dl = (
        pads.dataset(f"{t1_index_dir}/doclen")
        .to_table()
        .to_pandas()
        .set_index("doc_id")["dl"]
        .to_dict()
    )
    assert dl == idx.doclen
    meta = json.load(open(f"{t1_index_dir}/meta.json"))
    assert meta["num_docs"] == idx.N
    assert abs(meta["avgdl"] - idx.avgdl) < 1e-12


def test_postings_decode_identical(t1_index_dir, t1_oracle):
    idx, _ = t1_oracle
    post = (
        pads.dataset(f"{t1_index_dir}/postings", partitioning="hive")
        .to_table()
        .to_pandas()
    )
    # postings store only term_id (no strings in the shuffle); join the
    # dictionary to recover terms
    d = pads.dataset(f"{t1_index_dir}/dictionary").to_table().to_pandas()
    tid2term = dict(zip(d.term_id, d.term))
    byterm = collections.defaultdict(list)
    for r in post.itertuples():
        byterm[tid2term[r.term_id]].append(r)
    assert set(byterm) == set(idx.postings)
    meta = json.load(open(f"{t1_index_dir}/meta.json"))
    n_salted_terms = 0
    for term, rows in byterm.items():
        rows.sort(key=lambda r: r.salt)
        if len(rows) > 1:
            n_salted_terms += 1
        docs, tfs = [], []
        for r in rows:
            d, f = decode_postings(r.doc_blob, r.tf_blob, r.df)
            docs.append(d)
            tfs.append(f)
        d = np.concatenate(docs)
        f = np.concatenate(tfs)
        exp = idx.postings[term]
        assert np.array_equal(d, np.array([x for x, _ in exp], dtype=np.uint64)), term
        assert np.array_equal(f, np.array([y for _, y in exp], dtype=np.uint64)), term
    # the skew fixture must actually exercise the salted path
    assert n_salted_terms > 0
    assert len(meta["hot_term_ids"]) > 0


def test_sha256_per_row(t1_index_dir, t1_oracle):
    _, tbl = t1_oracle
    sha = (
        pads.dataset(f"{t1_index_dir}/sha256")
        .to_table()
        .to_pandas()
        .set_index("doc_id")["sha256"]
        .to_dict()
    )
    for i in range(tbl.num_rows):
        assert sha[i] == oracle.sha256_hex(tbl["content"][i].as_py())


def test_duplicate_content_rows_index_independently(t1_index_dir, t1_oracle):
    """Rows i%100==99 duplicate i-1's content (FIXTURES §1.2) — both must
    be indexed as distinct docs with identical sha."""
    _, tbl = t1_oracle
    sha = (
        pads.dataset(f"{t1_index_dir}/sha256")
        .to_table()
        .to_pandas()
        .set_index("doc_id")["sha256"]
        .to_dict()
    )
    dups = [i for i in range(tbl.num_rows) if i % 100 == 99 and i > 0]
    assert dups
    for i in dups:
        assert sha[i] == sha[i - 1]


def test_exclude_terms_amputation(t1_corpus_dir, tmp_path):
    """M3 stopword amputation (opt-in): build with an exclude list ->
    excluded terms absent from dictionary, dl/df/BM25 computed over the
    kept token sequence, exactly like the oracle with the same list."""
    from hadoopsearchengine_ray import corpus, oracle
    from hadoopsearchengine_ray.pipelines.build_index import build_index
    from hadoopsearchengine_ray.pipelines.query import BM25Scorer

    excl = ("def", "return", "the", "and")
    idx_dir = str(tmp_path / "excl_index")
    meta = build_index(t1_corpus_dir, idx_dir, exclude_terms=excl)
    assert meta["exclude_terms"] == sorted(excl)

    tbl = corpus.gen_rows(np.arange(600))
    gold = oracle.OracleIndex(
        [(i, tbl["content"][i].as_py()) for i in range(600)],
        exclude_terms=excl)
    assert meta["num_docs"] == gold.N
    assert abs(meta["avgdl"] - gold.avgdl) < 1e-9

    eng = (pads.dataset(f"{idx_dir}/dictionary").to_table().to_pandas()
           .sort_values("term").reset_index(drop=True))
    gdict = gold.dictionary()
    assert set(eng.term) == {t for t, _, _, _ in gdict}
    assert not (set(excl) & set(eng.term))
    for (t, tid, df, cf), row in zip(gdict, eng.itertuples()):
        assert (row.term, row.term_id, row.df, row.cf) == (t, tid, df, cf)

    sc = BM25Scorer(idx_dir)
    for q in oracle.make_queries(gold, 20):
        ids, _ = sc.score(q["terms"], q["k"])
        assert list(ids) == [d for d, s in gold.bm25_topk(q["terms"], q["k"])]
    # excluded term queries return nothing (reference: unsearchable)
    ids, _ = sc.score(["def"], 5)
    assert len(ids) == 0
