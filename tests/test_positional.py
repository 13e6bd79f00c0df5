"""Positional-posting checks: codec roundtrip, index parity vs oracle,
phrase search, index-driven proximity, title-boost BM25."""

import numpy as np
import pytest

from hadoopsearchengine_ray import corpus, oracle
from hadoopsearchengine_ray.codec import (
    decode_blocks,
    decode_positions,
    decode_positions_blocks,
    decode_postings,
    encode_term_partition,
)


@pytest.fixture(scope="module")
def t1_oracle():
    from tests.conftest import T1_DOCS

    tbl = corpus.gen_rows(np.arange(T1_DOCS))
    return oracle.OracleIndex(
        [(i, tbl["content"][i].as_py()) for i in range(T1_DOCS)])


def test_positional_codec_roundtrip():
    rng = np.random.default_rng(3)
    term_starts = np.array([0, 4, 4, 300])
    doc_ids = np.concatenate([
        np.sort(rng.choice(1000, 4, replace=False)),
        np.sort(rng.choice(50000, 296, replace=False)),
    ]).astype(np.uint64)
    tfs = rng.integers(1, 5, 300).astype(np.uint64)
    pos = np.concatenate(
        [np.sort(rng.choice(400, int(t), replace=False)) for t in tfs]
    ).astype(np.uint64)
    cols = encode_term_partition(term_starts, doc_ids, tfs, positions=pos)
    rows_flat = np.concatenate(([0], np.cumsum(tfs))).astype(np.int64)
    for ti, (a, b) in enumerate(zip(term_starts[:-1], term_starts[1:])):
        a, b = int(a), int(b)
        flat, offs = decode_positions(cols["pos_blob"][ti].as_py(), tfs[a:b])
        assert (flat == pos[int(rows_flat[a]):int(rows_flat[b])]).all()
        d, f = decode_postings(cols["doc_blob"][ti].as_py(),
                               cols["tf_blob"][ti].as_py(), b - a)
        assert (d == doc_ids[a:b]).all() and (f == tfs[a:b]).all()
    # block-sliced positions (term 2 spans 3 skip blocks)
    a, b = 4, 300
    blocks = np.array([1])
    block_tfs = [tfs[a + 128:a + 256]]
    pp = decode_positions_blocks(cols["pos_blob"][2].as_py(), blocks,
                                 cols["skip_pos_off"][2].as_py(), block_tfs)
    assert (pp[0][0] == pos[int(rows_flat[a + 128]):int(rows_flat[a + 256])]).all()


def test_index_positions_match_oracle(t1_index_dir, t1_oracle):
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    reader = IndexReader(t1_index_dir)
    idx = t1_oracle
    import random

    random.seed(7)
    sample = random.sample(sorted(idx.postings), 25)
    hot = [t for t in sorted(idx.postings)
           if len(idx.postings[t]) > 0.25 * idx.N][:4]
    for t in sample + hot:
        d, f, flat, offs = reader.decoded_positions(t)
        exp = idx.positions.get(t, {})
        assert len(d) == len(exp), t
        for i, doc in enumerate(d.astype(np.int64)):
            got = flat[int(offs[i]):int(offs[i + 1])].astype(np.int64).tolist()
            assert got == exp[int(doc)], (t, doc)


def test_phrase_counts_match_oracle(t1_index_dir, t1_oracle):
    from hadoopsearchengine_ray.pipelines.positional import phrase_counts
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    reader = IndexReader(t1_index_dir)
    idx = t1_oracle
    tbl = corpus.gen_rows(np.arange(4))
    for doc in range(4):
        toks = oracle.tokenize_py(tbl["content"][doc].as_py())
        for ph in (toks[0:2], toks[5:8]):
            docs, cnt = phrase_counts(reader, list(ph))
            assert dict(zip(docs.tolist(), cnt.tolist())) == idx.phrase_counts(list(ph))


def test_proximity_rerank_indexed_matches_oracle(t1_index_dir, t1_oracle):
    from hadoopsearchengine_ray.pipelines.positional import (
        proximity_rerank_indexed,
    )

    idx = t1_oracle
    out = proximity_rerank_indexed(t1_index_dir, ["def", "return"], k=10)
    assert len(out) == 10
    for _, r in out.iterrows():
        m, w = idx.min_window(["def", "return"], int(r.doc_id))
        assert m == r.matched_terms
        assert (w if w < 10**9 else -1) == r.min_window


def test_title_boost_matches_python_shadow(t1_index_dir, t1_oracle):
    from hadoopsearchengine_ray.pipelines.query import BM25Scorer

    idx = t1_oracle
    scorer = BM25Scorer(t1_index_dir)
    terms = ["def", "return"]
    d, s = scorer.score_title_boost(terms, 10, title_len=8, boost=2.0)
    # python shadow with boosted tf
    scores = {}
    for t in sorted(set(terms)):
        pl = idx.postings.get(t, [])
        w = idx.idf(t)
        for doc, tf in pl:
            tft = sum(1 for p in idx.positions[t][doc] if p < 8)
            tfe = tf + 1.0 * tft
            dl = idx.doclen[doc]
            scores[doc] = scores.get(doc, 0.0) + \
                w * tfe * 2.2 / (tfe + 1.2 * (0.25 + 0.75 * dl / idx.avgdl))
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [int(x) for x in d] == [e[0] for e in exp]


def test_nonpositional_index_still_builds(tmp_path, ray_session):
    from hadoopsearchengine_ray.pipelines.build_index import build_index
    from hadoopsearchengine_ray.pipelines.query import BM25Scorer, IndexReader

    cdir = str(tmp_path / "c")
    corpus.write_corpus(cdir, 120)
    meta = build_index(cdir, str(tmp_path / "i"), with_positions=False)
    assert meta["with_positions"] is False
    reader = IndexReader(str(tmp_path / "i"))
    with pytest.raises(ValueError, match="positional"):
        reader.decoded_positions("def")
    d, s = BM25Scorer(str(tmp_path / "i")).score(["def"], 5)
    assert len(d) > 0


def test_anchor_token_table_matches_shadow(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from hadoopsearchengine_ray.pipelines.anchor import (
        anchor_links,
        anchor_token_table,
    )
    from hadoopsearchengine_ray.tokenizer import tokenize_py

    texts = [f"title{i} common word{i % 3} body filler text here more" for i in range(20)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array(texts),
    }))
    links_tbl = anchor_links(20)
    out = anchor_token_table(docs, rd.from_arrow(links_tbl)).to_pandas()
    # shadow
    shadow = {}
    titles = {i: tokenize_py(t)[:8] for i, t in enumerate(texts)}
    for s, d in zip(links_tbl["src"].to_pylist(), links_tbl["dst"].to_pylist()):
        for term in titles[s]:
            shadow[(d, term)] = shadow.get((d, term), 0) + 1
    got = {(int(r.doc_id), r.term): int(r.tf) for r in out.itertuples()}
    assert got == shadow


def test_near_counts_match_oracle(t1_index_dir, t1_oracle):
    """NEAR predicate (ordered + unordered, several slops) vs a pure-
    Python pair count over the oracle's position maps; includes hot x
    rare, hot x hot, and same-term pairs."""
    import random

    from hadoopsearchengine_ray.pipelines.positional import near_counts
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    reader = IndexReader(t1_index_dir)
    idx = t1_oracle

    def brute(a, b, slop, ordered):
        pa, pb = idx.positions.get(a, {}), idx.positions.get(b, {})
        out = {}
        for doc in set(pa) & set(pb):
            n = sum(1 for x in pa[doc] for y in pb[doc]
                    if (1 <= y - x <= slop) or
                       (not ordered and 1 <= x - y <= slop))
            if n:
                out[doc] = n
        return out

    random.seed(11)
    terms = sorted(idx.postings)
    hot = [t for t in terms if len(idx.postings[t]) > 0.25 * idx.N][:2]
    pool = random.sample(terms, 8)
    pairs = list(zip(pool[0::2], pool[1::2]))
    pairs += [(hot[0], pool[0]), (hot[0], hot[1]), (hot[0], hot[0])]
    for a, b in pairs:
        for slop in (1, 3):
            for ordered in (False, True):
                docs, cnt = near_counts(reader, a, b, slop=slop,
                                        ordered=ordered)
                assert dict(zip(docs.tolist(), cnt.tolist())) == \
                    brute(a, b, slop, ordered), (a, b, slop, ordered)
    # slop=1 ordered degenerates to the 2-term phrase count
    from hadoopsearchengine_ray.pipelines.positional import phrase_counts
    d1, c1 = near_counts(reader, hot[0], hot[1], slop=1, ordered=True)
    d2, c2 = phrase_counts(reader, [hot[0], hot[1]])
    assert d1.tolist() == d2.tolist() and c1.tolist() == c2.tolist()


def test_near_counts_slop_bounds(t1_index_dir, t1_oracle):
    """slop < 1 returns empty (SQL BETWEEN 1 AND slop), never a
    wrapped uint64 window."""
    from hadoopsearchengine_ray.pipelines.positional import near_counts
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    reader = IndexReader(t1_index_dir)
    idx = t1_oracle
    hot = [t for t in sorted(idx.postings)
           if len(idx.postings[t]) > 0.25 * idx.N][:2]
    for slop in (0, -2):
        d, c = near_counts(reader, hot[0], hot[1], slop=slop)
        assert len(d) == 0 and len(c) == 0
