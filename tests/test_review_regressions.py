"""Regressions for code-review findings (round 1 review pass)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from hadoopsearchengine_ray.functions import dedup
from hadoopsearchengine_ray.pipelines.build_index import build_index
from hadoopsearchengine_ray.pipelines.docstore import make_snippet
from hadoopsearchengine_ray.pipelines.query import BM25Scorer
from hadoopsearchengine_ray.stages.ingest import load_corpus, zip_with_index


def _corpus_table(rows):
    return pa.table({
        "repo": [r[0] for r in rows], "path": [r[1] for r in rows],
        "commit": ["c"] * len(rows), "lang": ["py"] * len(rows),
        "content": [r[2] for r in rows],
    })


def test_rebuild_over_stale_dir_with_empty_corpus(tmp_path):
    """A now-empty corpus must clear the previous build's files, not
    leave a corrupt mix (review finding 1)."""
    c = str(tmp_path / "c.parquet")
    idx = str(tmp_path / "idx")
    pq.write_table(_corpus_table(
        [(f"r/{i:03d}", f"p{i:03d}", f"alpha beta doc{i}") for i in range(50)]), c)
    build_index(c, idx)
    pq.write_table(_corpus_table([]), c)
    meta = build_index(c, idx)
    assert meta["num_docs"] == 0
    sc = BM25Scorer(idx)
    d, s = sc.score(["alpha"], 5)
    assert len(d) == 0


def test_dedup_clusters_long_chain():
    """A 120-doc duplicate chain is ONE component (review finding 2:
    the old round cap silently split long chains)."""
    pairs = rd.from_arrow(pa.table({
        "d1": pa.array(list(range(119)), pa.int64()),
        "d2": pa.array(list(range(1, 120)), pa.int64()),
    }))
    lab = dedup.dedup_clusters(pairs, 120)
    assert (lab == 0).all()


def test_zip_with_index_rejects_duplicate_keys(tmp_path):
    c = str(tmp_path / "dup.parquet")
    pq.write_table(_corpus_table(
        [("r/a", "same", "one"), ("r/a", "same", "two")]), c)
    with pytest.raises(ValueError, match="not unique"):
        zip_with_index(load_corpus(c),
                       sort_keys=["repo", "path", "commit"]).count()


def test_make_snippet_offsets_survive_case_length_changes():
    s = make_snippet("İİİİ needle in the haystack İ", ["needle"], window=60)
    assert "**needle**" in s
    # marks wrap exactly the word, not a shifted span
    assert "need**le" not in s


def test_lineage_detects_same_size_content_change(tmp_path):
    """Same-byte-size rewrite must invalidate the manifest (mtime in the
    fingerprint — review finding 7)."""
    from hadoopsearchengine_ray.state.manifest import lineage_fingerprint

    p = tmp_path / "f.bin"
    p.write_bytes(b"a" * 100)
    f1 = lineage_fingerprint([str(p)])
    os.utime(p, ns=(1, 1))  # same size, different mtime
    f2 = lineage_fingerprint([str(p)])
    assert f1 != f2


def test_minhash_single_pass_and_candidate_only_lut():
    texts = ["common words shared here fully"] * 3 + ["totally different junk"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts),
    }))
    out = dedup.minhash_lsh_pairs(docs, n=2, jaccard_threshold=0.9).to_pandas()
    pairs = set(zip(out.d1, out.d2))
    assert {(0, 1), (0, 2), (1, 2)} <= pairs
    assert not any(3 in p for p in pairs)


def test_dedup_clusters_with_pairs_fewer_than_buckets():
    """Round-1 driver failure: shingle_overlap_pairs ends in a 32-bucket
    map_groups; with ~2 pairs most buckets emit schema-less EMPTY pandas
    blocks, and dedup_clusters' per-block tasks crashed on block["d1"].
    nonempty_block_refs must skip those blocks."""
    texts = (["alpha beta gamma delta epsilon zeta eta theta"] * 2
             + [f"unique{i} solo{i} text{i} words{i} here{i} only{i}"
                for i in range(6)])
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    pairs = dedup.shingle_overlap_pairs(docs, n=3, min_common=2, max_df=50)
    labels = dedup.dedup_clusters(pairs.select_columns(["d1", "d2"]),
                                  num_docs=len(texts))
    assert labels[1] == labels[0] == 0
    assert all(labels[i] == i for i in range(2, len(texts)))


def test_nonempty_block_refs_filters_empty_pandas_blocks():
    import pandas as pd

    from hadoopsearchengine_ray._block import nonempty_block_refs

    ds = rd.from_items([{"bucket": 0, "v": 1}, {"bucket": 0, "v": 2}])

    def _grp(g: pd.DataFrame) -> pd.DataFrame:
        return g

    # groupby with a single real group but high output parallelism can
    # produce empty blocks; simulate directly with union of an empty ds
    empty = rd.from_pandas(pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                         "v": pd.Series(dtype="int64")}))
    refs = nonempty_block_refs(ds.union(empty).materialize())
    import ray as _ray
    total = sum(len(b) for b in _ray.get(refs))
    assert total == 2


def test_minhash_no_candidates_returns_typed_empty():
    """Round-2 review: empty candidate aggregate loses its schema and
    crashed the distributed verify joins."""
    words = ["apple banana cherry dog elephant fox",
             "grape horse igloo jaguar kiwi lemon",
             "mango nectar orange panda quartz rose"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(words),
    }))
    out = dedup.minhash_lsh_pairs(docs, n=3, jaccard_threshold=0.5).to_pandas()
    assert len(out) == 0


def test_minhash_short_docs_not_paired():
    """Round-2 review: docs with <n tokens carry the all-max sentinel
    signature and were banded together as est-1.0 'duplicates'."""
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(["alpha beta", "gamma delta", "one two",
                          "alpha beta gamma delta epsilon zeta"]),
    }))
    out = dedup.minhash_lsh_pairs(docs, n=3, jaccard_threshold=0.5).to_pandas()
    assert len(out) == 0


# ---- round-3 advice fixes -------------------------------------------------

def test_hash_join_preserves_large_int64_keys():
    """ADVICE r3: int64 keys >= 2^53 must survive the bucketed join —
    the tagged union's null padding used to promote them through
    float64 in pandas group blocks."""
    from hadoopsearchengine_ray.pipelines.relational import hash_join

    big = [2**62 + 1, 2**62 + 2, -(2**62) - 3, 9007199254740993]  # 2^53+1
    left = rd.from_arrow(pa.table({
        "k": pa.array(big, pa.int64()),
        "lv": pa.array([10, 20, 30, 40], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(big[:3] + [12345], pa.int64()),
        "rv": pa.array([1, 2, 3, 4], pa.int64()),
    }))
    out = hash_join(left, right, on="k", num_buckets=4).to_pandas()
    assert len(out) == 3
    got = dict(zip(out["k"], out["rv"]))
    assert got == {big[0]: 1, big[1]: 2, big[2]: 3}


def test_hopping_window_normalizes_timestamp_ns():
    """ADVICE r3: timestamp[ns] input must window identically to the
    same instants in timestamp[us]."""
    from hadoopsearchengine_ray.pipelines.relational import hopping_window_agg

    us_vals = [1_000_000, 3_500_000, 7_200_000, 11_000_000]
    t_us = pa.array(us_vals, pa.timestamp("us"))
    t_ns = t_us.cast(pa.timestamp("ns"))
    keys = pa.array([1, 1, 2, 2], pa.int64())
    vals = pa.array([1.0, 2.0, 3.0, 4.0], pa.float64())

    def run(ts_arr):
        ds = rd.from_arrow(pa.table({"ts": ts_arr, "k": keys, "v": vals}))
        return (hopping_window_agg(ds, "ts", "k", "v", size_s=10, hop_s=5)
                .to_pandas().sort_values(["window_start", "k"])
                .reset_index(drop=True))

    a, b = run(t_us), run(t_ns)
    assert a.equals(b)
    assert set(a["window_start"]) <= {-5, 0, 5, 10}


def test_connected_components_empty_pairs():
    """ADVICE r3: zero edges must return a typed empty (node, root)
    dataset instead of crashing the star rounds."""
    pairs = rd.from_arrow(pa.table({
        "d1": pa.array([], pa.int64()),
        "d2": pa.array([], pa.int64()),
    }))
    out = dedup.connected_components(pairs)
    assert out.count() == 0
    assert out.schema().names == ["node", "root"]


def test_tombstone_post_cache_byte_budget(tmp_path):
    """ADVICE r3: TombstoneReader's filtered-decode cache evicts on a
    byte budget, not just entry count."""
    from hadoopsearchengine_ray.pipelines.delta import TombstoneReader
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    c = str(tmp_path / "c.parquet")
    idx = str(tmp_path / "idx")
    pq.write_table(_corpus_table(
        [(f"r/{i:03d}", f"p{i:03d}", f"alpha beta doc{i}") for i in range(20)]), c)
    build_index(c, idx)
    tr = TombstoneReader(IndexReader(idx), {1, 2})
    tr._post_budget = 64  # tiny budget forces epoch eviction
    for t in ("alpha", "beta"):
        tr.lookup(t)
    assert tr._post_bytes <= 64 or len(tr._post_cache) <= 1
    d, _ = tr.decoded_postings("alpha")
    assert 1 not in d.astype(np.int64) and 2 not in d.astype(np.int64)


def test_blocks_for_bytes_scaling():
    """Round-3: partition counts derive from bytes (floor at the
    measured 16-block sweet spot, ~256MB per block beyond, capped)."""
    from hadoopsearchengine_ray._block import blocks_for_bytes

    mb = 1 << 20
    assert blocks_for_bytes(0) == 16
    assert blocks_for_bytes(None) == 16
    assert blocks_for_bytes(100 * mb) == 16          # under the floor
    assert blocks_for_bytes(16 * 256 * mb) == 16     # exactly the floor
    assert blocks_for_bytes(32 * 256 * mb) == 32     # bytes take over
    assert blocks_for_bytes(10**18) == 4096          # capped
