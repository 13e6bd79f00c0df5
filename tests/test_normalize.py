"""Stemmer (M4) / HTML stripper (M1) / keyword sets (M9) / word stats (A7)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from hadoopsearchengine_ray.functions import text
from hadoopsearchengine_ray.functions.normalize import (
    stem_column,
    stem_py,
    stemmed_token_table,
    strip_html_column,
    strip_html_py,
)
from hadoopsearchengine_ray.tokenizer import tokenize_py


def test_stem_arrow_matches_python():
    words = ["running", "nations", "classes", "apples", "cats", "weakly",
             "statement", "visible", "things", "happiness", "tion", "ed",
             "x", "abcdefg", "cars", "cares", "caring"]
    got = stem_column(pa.array(words)).to_pylist()
    assert got == [stem_py(w) for w in words]


def test_strip_html_arrow_matches_python():
    docs = ["<html><title>T</title><body>a  b <b>c</b></body></html>",
            "no tags here", "<p>x</p><p>y</p>", ""]
    got = strip_html_column(pa.array(docs)).to_pylist()
    assert got == [strip_html_py(d) for d in docs]


def test_stemmed_token_table(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["running runs runner", "cats and cat"]),
    }))
    out = stemmed_token_table(docs).to_pandas()
    got = {(int(r.doc_id), r.stem): int(r.tf) for r in out.itertuples()}
    exp = {}
    for i, t in enumerate(["running runs runner", "cats and cat"]):
        for tok in tokenize_py(t):
            k = (i, stem_py(tok))
            exp[k] = exp.get(k, 0) + 1
    assert got == exp


def test_keyword_table_and_stats(ray_session):
    # 40 distinct singleton terms put p95 well below 'common' (cf=120)
    texts = [
        "common common common rare1 rare2 "
        + " ".join(f"unique{i}x{j}" for j in range(1))
        for i in range(40)
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts),
    }))
    kws = text.keyword_table(docs, top_m=3, pct=0.95).to_pandas()
    # 'common' (cf=120) is above the p95 threshold -> culled everywhere
    assert "common" not in set(kws["keyword"])
    # every doc keeps at most 3 keywords
    assert kws.groupby("doc_id").size().max() <= 3

    stats = text.word_stats(docs)
    assert int(stats["max_cf"][0]) == 120          # 'common'
    total_tokens = sum(len(tokenize_py(t)) for t in texts)
    assert int(stats["net_cf"][0]) == total_tokens


def test_keyword_pagerank_matches_numpy(ray_session):
    texts = ["alpha beta gamma", "beta gamma delta", "alpha delta epsilon"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts),
    }))
    out = text.keyword_pagerank(docs, top_m=3, cycles=20)
    from hadoopsearchengine_ray.functions.text import keyword_links, keyword_table
    from hadoopsearchengine_ray.oracle import pagerank_oracle

    kws = keyword_table(docs, top_m=3).to_pandas()
    vocab, links = keyword_links(kws)
    exp = pagerank_oracle(links["src"].to_numpy(), links["dst"].to_numpy(),
                          links["weight"].to_numpy(), len(vocab))
    got = out.set_index("keyword")["kw_score"]
    assert np.allclose([got[v] for v in vocab], np.round(exp, 9), atol=1e-8)
