"""Property tests for the delta-gap + varint codec (FIXTURES.md §4.1)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoopsearchengine_ray import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=100, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.decode_varints(codec.encode_varints(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=500,
             unique=True),
    st.data(),
)
@settings(max_examples=50, deadline=None)
def test_postings_roundtrip(doc_ids, data):
    docs = np.sort(np.array(doc_ids, dtype=np.uint64))
    tfs = np.array(
        data.draw(st.lists(st.integers(1, 10**6), min_size=len(docs),
                           max_size=len(docs))),
        dtype=np.uint64,
    )
    enc = codec.encode_postings(docs, tfs)
    d, f = codec.decode_postings(enc["doc_blob"], enc["tf_blob"], len(docs))
    assert np.array_equal(d, docs)
    assert np.array_equal(f, tfs)


def test_block_decode_and_blockmax():
    rng = np.random.default_rng(7)
    docs = np.sort(rng.choice(10**7, 1000, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 100, 1000).astype(np.uint64)
    enc = codec.encode_postings(docs, tfs)
    sd = np.array(enc["skip_docs"], dtype=np.uint64)
    nb = len(sd)
    assert nb == (1000 + codec.SKIP_BLOCK - 1) // codec.SKIP_BLOCK
    for b in range(nb):
        lo, hi = b * codec.SKIP_BLOCK, min((b + 1) * codec.SKIP_BLOCK, 1000)
        d, f = codec.decode_blocks(
            enc["doc_blob"], enc["tf_blob"], 1000, np.array([b]),
            sd, enc["skip_doc_off"], enc["skip_tf_off"],
        )
        assert np.array_equal(d, docs[lo:hi])
        assert np.array_equal(f, tfs[lo:hi])
        assert enc["block_max_tf"][b] == tfs[lo:hi].max()
        assert sd[b] == docs[hi - 1]


def test_multi_term_partition_encode():
    rng = np.random.default_rng(11)
    starts = [0]
    doc_all, tf_all = [], []
    for _ in range(40):
        df = int(rng.integers(1, 400))
        doc_all.append(np.sort(rng.choice(10**6, df, replace=False)).astype(np.uint64))
        tf_all.append(rng.integers(1, 50, df).astype(np.uint64))
        starts.append(starts[-1] + df)
    cols = codec.encode_term_partition(
        np.array(starts), np.concatenate(doc_all), np.concatenate(tf_all)
    )
    for t in range(40):
        d, f = codec.decode_postings(
            cols["doc_blob"][t].as_py(), cols["tf_blob"][t].as_py(),
            int(cols["df"][t].as_py()),
        )
        assert np.array_equal(d, doc_all[t])
        assert np.array_equal(f, tf_all[t])
