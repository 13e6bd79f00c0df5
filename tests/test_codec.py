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


def test_empty_and_zero_df_terms_encode():
    """Empty input and df==0 terms must encode to valid (empty) blobs
    instead of IndexError-ing (review regression)."""
    e = np.empty(0, np.uint64)
    enc = codec.encode_postings(e, e)
    assert enc["df"] == 0 and enc["doc_blob"] == b""
    d, t = codec.decode_postings(enc["doc_blob"], enc["tf_blob"], 0)
    assert len(d) == 0 and len(t) == 0
    # a df==0 term BETWEEN non-empty terms, and one trailing
    docs = np.array([3, 9, 5], np.uint64)     # term0: [3,9], term2: [5]
    tfs = np.array([1, 2, 7], np.uint64)
    cols = codec.encode_term_partition(
        np.array([0, 2, 2, 3, 3]), docs, tfs)  # term1 and term3 empty
    assert cols["df"].to_pylist() == [2, 0, 1, 0]
    d0, t0 = codec.decode_postings(cols["doc_blob"][0].as_py(),
                                   cols["tf_blob"][0].as_py(), 2)
    assert list(d0) == [3, 9] and list(t0) == [1, 2]
    d2, t2 = codec.decode_postings(cols["doc_blob"][2].as_py(),
                                   cols["tf_blob"][2].as_py(), 1)
    assert list(d2) == [5] and list(t2) == [7]
    assert cols["doc_blob"][1].as_py() == b""


def test_truncated_blob_raises_value_error():
    """Corrupt blobs must raise ValueError (works under python -O too,
    unlike the old bare assert)."""
    import pytest

    enc = codec.encode_postings(np.array([1, 2, 3], np.uint64),
                                np.array([1, 1, 1], np.uint64))
    with pytest.raises(ValueError, match="corrupt or truncated"):
        codec.decode_postings(enc["doc_blob"][:-1], enc["tf_blob"], 3)
    with pytest.raises(ValueError, match="corrupt or truncated"):
        codec.decode_aux(enc["tf_blob"][:-1], 3)


def test_salt_monotonic_for_sparse_and_huge_ids():
    """Salt bucketing must be MONOTONIC in doc id for any uint64 id
    (the old doc*S//N multiply wrapped past 2^64/S) and spread a
    delta-style id range (starting at the main's space) across salts."""
    import pyarrow as pa

    from hadoopsearchengine_ray.stages.postings import (
        make_shard_assigner,
        term_ids_for,
    )

    tid = int(term_ids_for(["hot"])[0])
    S = 8
    # ids far above num_docs AND near the uint64 ceiling
    ids = np.array([100, 999, 2**61, 2**63 + 5, 2**64 - 2], np.uint64)
    assign = make_shard_assigner({tid: 0}, num_docs=2**64 - 1,
                                 num_salts=S)
    out = assign(pa.table({
        "term": pa.array(["hot"] * len(ids)),
        "doc_id": pa.array(ids, pa.uint64()),
        "tf": pa.array([1] * len(ids), pa.uint32()),
    }))
    salts = out["salt"].to_pylist()
    assert salts == sorted(salts), "salt must be monotonic in doc id"
    assert all(0 <= s < S for s in salts)
    # delta regime: 1000 rows with ids in [50_000, 51_000), space 51_000
    ids2 = np.arange(50_000, 51_000, dtype=np.uint64)
    assign2 = make_shard_assigner({tid: 0}, num_docs=51_000, num_salts=S)
    out2 = assign2(pa.table({
        "term": pa.array(["hot"] * len(ids2)),
        "doc_id": pa.array(ids2, pa.uint64()),
        "tf": pa.array([1] * len(ids2), pa.uint32()),
    }))
    s2 = np.asarray(out2["salt"].to_pylist())
    assert (np.diff(s2) >= 0).all()
    # the whole delta range no longer collapses into ONE salt bucket —
    # it may span few buckets (range/width), but must not be constant
    # when it crosses a width boundary; with width ceil(51000/8)=6375
    # the range [50000,51000) fits inside one bucket — use a wider range
    ids3 = np.arange(20_000, 51_000, 31, dtype=np.uint64)
    out3 = assign2(pa.table({
        "term": pa.array(["hot"] * len(ids3)),
        "doc_id": pa.array(ids3, pa.uint64()),
        "tf": pa.array([1] * len(ids3), pa.uint32()),
    }))
    assert len(set(out3["salt"].to_pylist())) >= 4
    # tiny declared space + huge real ids: the quotient itself exceeds
    # 2^63 (salt_width 1), which must clip in uint64, not wrap negative
    assign3 = make_shard_assigner({tid: 0}, num_docs=S, num_salts=S)
    ids4 = np.array([0, 3, 100, 2**63 + 5, 2**64 - 2], np.uint64)
    out4 = assign3(pa.table({
        "term": pa.array(["hot"] * len(ids4)),
        "doc_id": pa.array(ids4, pa.uint64()),
        "tf": pa.array([1] * len(ids4), pa.uint32()),
    }))
    s4 = out4["salt"].to_pylist()
    assert s4 == sorted(s4) and all(0 <= s < S for s in s4)
    assert s4 == [0, 3, 7, 7, 7]
