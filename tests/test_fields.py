"""Unified multi-field index (M8): one build, one reader pass for
body + title + anchor — dual-implementation shadow per SURVEY.md §5."""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoopsearchengine_ray.pipelines.anchor import anchor_links
from hadoopsearchengine_ray.pipelines.fields import (
    BM25FScorer,
    build_unified_index,
)
from hadoopsearchengine_ray.tokenizer import tokenize_py

TITLE_LEN, WT, WA, K1, B = 8, 2.0, 1.5, 1.2, 0.75


def _shadow(texts, alive=None):
    """Pure-python BM25F: tf/tft/atf/dl/adl maps + union df.

    ``alive`` restricts stats (N, df, avgdlc) and candidates to the
    surviving docs — the compaction semantics: per-doc field tfs are
    unchanged (anchor text contributed BY a deleted source doc stays
    attributed to its target, exactly as the index cannot un-attribute
    it), only deleted docs' own rows and stats disappear."""
    if alive is None:
        alive = set(range(len(texts)))
    n = len(alive)
    toks = [tokenize_py(t) for t in texts]
    links = anchor_links(len(texts))
    atf, tf, tft = {}, {}, {}
    for s, d in zip(links["src"].to_pylist(), links["dst"].to_pylist()):
        for t in toks[s][:TITLE_LEN]:
            atf[(d, t)] = atf.get((d, t), 0) + 1
    for i, ts in enumerate(toks):
        for p, t in enumerate(ts):
            tf[(i, t)] = tf.get((i, t), 0) + 1
            if p < TITLE_LEN:
                tft[(i, t)] = tft.get((i, t), 0) + 1
    dl = {i: len(ts) for i, ts in enumerate(toks) if i in alive}
    adl = {}
    for (d, t), v in atf.items():
        if d in alive:
            adl[d] = adl.get(d, 0) + v
    avgdlc = (sum(dl.values()) + WA * sum(adl.values())) / n
    dfu = {}
    for (d, t) in set(tf) | set(atf):
        if d in alive:
            dfu[t] = dfu.get(t, 0) + 1

    def score(terms, k):
        sc = {}
        for t in sorted(set(terms)):
            if t not in dfu:
                continue
            w = math.log((n - dfu[t] + 0.5) / (dfu[t] + 0.5) + 1.0)
            for d in sorted(alive):
                tfc = (tf.get((d, t), 0) + (WT - 1) * tft.get((d, t), 0)
                       + WA * atf.get((d, t), 0))
                if tfc <= 0:
                    continue
                dlc = dl.get(d, 0) + WA * adl.get(d, 0)
                sc[d] = sc.get(d, 0.0) + w * tfc * (K1 + 1) / (
                    tfc + K1 * (1 - B + B * dlc / avgdlc))
        return sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    return score


@pytest.fixture(scope="module")
def unified(tmp_path_factory, ray_session):
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(40)] + ["spark", "window", "merge"]
    texts = [" ".join(rng.choice(words, size=rng.integers(5, 60)))
             for _ in range(80)]
    root = tmp_path_factory.mktemp("unified")
    cp = str(root / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(80), pa.int64()),
        "text": pa.array(texts),
    }), cp)
    idx = str(root / "idx")
    build_unified_index(cp, idx)
    return idx, texts


def test_bm25f_matches_shadow(unified):
    idx, texts = unified
    scorer = BM25FScorer(idx)
    shadow = _shadow(texts)
    for terms in (["spark"], ["spark", "window"], ["merge", "w1", "w2"],
                  ["w0"], ["absent"], ["w3", "absent", "spark"]):
        d, s = scorer.score(terms, 10)
        exp = shadow(terms, 10)
        assert [int(x) for x in d] == [x for x, _ in exp], terms
        assert np.allclose(s, [v for _, v in exp]), terms


def test_unified_index_single_layout(unified):
    """One build produces ONE index dir serving all fields (round-2 had
    separate anchor/main dirs and two dictionaries)."""
    idx, _ = unified
    assert os.path.isdir(os.path.join(idx, "postings"))
    assert os.path.isdir(os.path.join(idx, "dictionary"))
    # no nested second index
    subdirs = {d for d in os.listdir(idx) if os.path.isdir(os.path.join(idx, d))}
    assert subdirs == {"postings", "dictionary", "doclen"}


def test_unified_resume_is_noop(unified):
    idx, _ = unified
    meta1 = build_unified_index(
        os.path.join(os.path.dirname(idx), "docs.parquet"), idx)
    assert meta1["with_fields"] is True


def test_aux_blob_roundtrip():
    from hadoopsearchengine_ray.codec import (
        decode_aux,
        decode_postings,
        encode_term_partition,
    )

    docs = np.array([1, 5, 9, 2, 3], np.uint64)
    tfs = np.array([2, 0, 1, 3, 0], np.uint64)   # 0-tf = anchor-only doc
    aux = np.array([0, 4, 1, 0, 2], np.uint64)
    starts = np.array([0, 3, 5])
    cols = encode_term_partition(starts, docs, tfs, aux=aux)
    for ti, (lo, hi) in enumerate(((0, 3), (3, 5))):
        d, f = decode_postings(cols["doc_blob"][ti].as_py(),
                               cols["tf_blob"][ti].as_py(), hi - lo)
        a = decode_aux(cols["aux_blob"][ti].as_py(), hi - lo)
        assert list(d) == list(docs[lo:hi])
        assert list(f) == list(tfs[lo:hi])
        assert list(a) == list(aux[lo:hi])


def test_merge_compacted_unified_matches_alive_shadow(unified, tmp_path):
    """Merge compaction of the UNIFIED field index (tombstones + the
    aux-channel re-encode path): the compacted index must score
    BM25F exactly like the alive-restricted shadow — per-doc field tfs
    unchanged, N/df/avgdl/avgdlc over survivors only."""
    import shutil

    from hadoopsearchengine_ray.pipelines.compaction import (
        merge_compact_index,
    )
    from hadoopsearchengine_ray.pipelines.delta import delete_documents

    idx, texts = unified
    src = str(tmp_path / "ucopy")
    shutil.copytree(idx, src)
    dead = set(range(0, 80, 7))
    delete_documents(src, sorted(dead))
    out = str(tmp_path / "ucompact")
    meta = merge_compact_index(src, out)

    alive = set(range(80)) - dead
    assert meta["num_docs"] == len(alive)
    assert meta["doc_id_space"] == 80
    assert meta["with_fields"] is True and meta["title_len"] == TITLE_LEN
    # anchor totals must track survivors (avgdlc depends on them)
    toks = [tokenize_py(t) for t in texts]
    links = anchor_links(80)
    adl = {}
    for s, d in zip(links["src"].to_pylist(), links["dst"].to_pylist()):
        if d in alive:
            adl[d] = adl.get(d, 0) + len(toks[s][:TITLE_LEN])
    assert meta["total_anchor_tokens"] == sum(adl.values())
    assert meta["total_tokens"] == sum(len(toks[i]) for i in alive)

    scorer = BM25FScorer(out)
    shadow = _shadow(texts, alive=alive)
    for terms in (["spark"], ["spark", "window"], ["merge", "w1", "w2"],
                  ["w0"], ["absent"], ["w3", "absent", "spark"],
                  ["w5", "w6", "w7"]):
        d, s = scorer.score(terms, 10)
        exp = shadow(terms, 10)
        assert [int(x) for x in d] == [x for x, _ in exp], terms
        assert np.allclose(s, [v for _, v in exp]), terms
