"""Incremental indexing: main + delta must serve rank-identical BM25
to a from-scratch rebuild over the union."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoopsearchengine_ray import corpus, oracle
from hadoopsearchengine_ray.pipelines.build_index import build_index
from hadoopsearchengine_ray.pipelines.delta import (
    MergedIndexReader,
    add_documents,
    merged_scorer,
)
from hadoopsearchengine_ray.pipelines.query import BM25Scorer


def _doc_table(lo, hi):
    tbl = corpus.gen_rows(np.arange(lo, hi))
    return pa.table({
        "doc_id": pa.array(range(lo, hi), pa.int64()),
        "text": tbl["content"],
    })


@pytest.fixture(scope="module")
def delta_dirs(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("delta")
    pq.write_table(_doc_table(0, 400), str(root / "main.parquet"))
    pq.write_table(_doc_table(400, 500), str(root / "new.parquet"))
    pq.write_table(_doc_table(0, 500), str(root / "full.parquet"))
    main = str(root / "main_idx")
    full = str(root / "full_idx")
    build_index(str(root / "main.parquet"), main,
                id_mode="column", text_col="text")
    build_index(str(root / "full.parquet"), full,
                id_mode="column", text_col="text")
    delta = add_documents(main, str(root / "new.parquet"))
    return main, delta, full, root


def test_merged_stats_equal_full(delta_dirs):
    main, delta, full, _ = delta_dirs
    merged = MergedIndexReader([main, delta])
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    fr = IndexReader(full)
    assert merged.N == fr.N
    assert abs(merged.avgdl - fr.avgdl) < 1e-9
    assert np.allclose(merged.dl[: fr.doc_space], fr.dl)
    for term in ("def", "return", "import"):
        assert merged.lookup(term) == fr.lookup(term)
        md, mt = merged.decoded_postings(term)
        fd, ft = fr.decoded_postings(term)
        assert (md == fd).all() and (mt == ft).all()


def test_merged_bm25_rank_identical_to_rebuild(delta_dirs):
    main, delta, full, _ = delta_dirs
    ms = merged_scorer(main)          # auto-discovers the delta
    fs = BM25Scorer(full)
    tbl = corpus.gen_rows(np.arange(500))
    idx = oracle.OracleIndex(
        [(i, tbl["content"][i].as_py()) for i in range(500)])
    for q in oracle.make_queries(idx, 30):
        dm, sm = ms.score(q["terms"], 10)
        df_, sf_ = fs.score(q["terms"], 10)
        assert [int(x) for x in dm] == [int(x) for x in df_], q["terms"]
        assert np.allclose(sm, sf_)
        # and both match the oracle over the union corpus
        assert [int(x) for x in dm] == \
            [int(t[0]) for t in idx.bm25_topk(q["terms"], 10)]


def test_delta_rejects_overlapping_ids(delta_dirs, tmp_path):
    main, _, _, root = delta_dirs
    bad = str(tmp_path / "bad.parquet")
    pq.write_table(_doc_table(100, 150), bad)   # ids overlap the main
    with pytest.raises(ValueError, match="doc_id_space"):
        add_documents(main, bad)


def test_merged_positions_and_phrase(delta_dirs):
    main, delta, full, _ = delta_dirs
    from hadoopsearchengine_ray.pipelines.positional import phrase_counts
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    merged = MergedIndexReader([main, delta])
    fr = IndexReader(full)
    toks = oracle.tokenize_py(corpus.gen_rows(np.arange(450, 451))["content"][0].as_py())
    ph = toks[2:4]
    dm, cm = phrase_counts(merged, ph)
    df_, cf_ = phrase_counts(fr, ph)
    assert (dm == df_).all() and (cm == cf_).all()


def test_delete_documents_matches_rebuild(delta_dirs, tmp_path):
    """Tombstoned scoring must be rank- AND score-identical to a full
    rebuild over the surviving corpus."""
    import shutil

    from hadoopsearchengine_ray.pipelines.delta import (
        TombstoneReader,
        delete_documents,
        load_tombstones,
    )
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    main, delta, full, root = delta_dirs
    # fresh copy of the full index so the module fixture stays clean
    idx = str(tmp_path / "full_copy")
    shutil.copytree(full, idx)
    dead = [i for i in range(500) if i % 17 == 0]
    delete_documents(idx, dead)
    assert load_tombstones(idx) == set(dead)

    reader = TombstoneReader(IndexReader(idx), set(dead))
    sc = BM25Scorer(idx, reader=reader)
    # shadow: oracle over the surviving docs only
    tbl = corpus.gen_rows(np.arange(500))
    alive = [(i, tbl["content"][i].as_py()) for i in range(500)
             if i % 17 != 0]
    oidx = oracle.OracleIndex(alive)
    assert reader.N == oidx.N
    assert abs(reader.avgdl - oidx.avgdl) < 1e-9
    for q in oracle.make_queries(oidx, 25):
        d, s = sc.score(q["terms"], 10)
        exp = oidx.bm25_topk(q["terms"], 10)
        assert [int(x) for x in d] == [int(t[0]) for t in exp], q["terms"]
        assert np.allclose(s, [t[1] for t in exp])


def test_second_delta_overlap_rejected_and_order_restored(delta_dirs, tmp_path):
    """Round-2 review: (a) a second delta overlapping an EARLIER delta
    must be rejected; (b) merged readers sort by doc range regardless of
    directory-name order."""
    import shutil

    from hadoopsearchengine_ray.pipelines.delta import (
        MergedIndexReader,
        add_documents,
    )

    main, delta, full, root = delta_dirs
    # (a) overlap with the existing 400-499 delta
    bad = str(tmp_path / "overlap.parquet")
    pq.write_table(_doc_table(450, 520), bad)
    with pytest.raises(ValueError, match="doc_id_space"):
        add_documents(main, bad)
    # (b) pass dirs in the wrong order — reader must re-sort by range
    merged = MergedIndexReader([delta, main])
    d, _ = merged.decoded_postings("def")
    assert (np.diff(d.astype(np.int64)) > 0).all()


def test_tombstone_edge_cases(delta_dirs, tmp_path):
    import shutil

    from hadoopsearchengine_ray.pipelines.delta import TombstoneReader
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    main, delta, full, root = delta_dirs
    base = IndexReader(full)
    # empty tombstone set: lookup must not crash (round-2 review)
    t0 = TombstoneReader(base, set())
    assert t0.lookup("def") == base.lookup("def")
    # out-of-range id fails loudly
    with pytest.raises(ValueError, match="doc-id space"):
        TombstoneReader(base, {10**9})


def test_media_resizer_gates_on_kind():
    import pyarrow as pa
    import ray.data as rd

    from hadoopsearchengine_ray.functions import multimodal

    media = multimodal.synthetic_media(9)
    out = (rd.from_arrow(media)
           .map_batches(multimodal.MediaResizer, batch_format="pyarrow",
                        concurrency=1, batch_size=9)
           .to_pandas().set_index("media_id"))
    src = media.to_pandas().set_index("media_id")
    for mid in range(9):
        if src.loc[mid, "kind"] == "image":
            assert out.loc[mid, "width"] == 32
        else:
            # audio/video untouched (round-2 review: no cross-kind resize)
            assert out.loc[mid, "payload"] == src.loc[mid, "payload"]
            assert out.loc[mid, "width"] == src.loc[mid, "width"]


@pytest.mark.parametrize("mode", ["merge", "rebuild"])
def test_compact_index_matches_merged_and_oracle(delta_dirs, tmp_path, mode):
    """Compaction (main + delta + tombstones -> one fresh index) must be
    rank- AND score-identical to the merged+tombstoned view and to the
    oracle over the surviving corpus; the result is standalone (plain
    BM25Scorer, no MergedIndexReader / TombstoneReader).  Both
    strategies — the posting-level blob merge and the token-level
    rebuild — must produce the same ranking."""
    import shutil

    from hadoopsearchengine_ray.pipelines.delta import (
        compact_index,
        delete_documents,
        merged_scorer,
    )

    main, delta, full, root = delta_dirs
    # fresh copy (deltas/ rides along) so the module fixture stays clean
    src = str(tmp_path / "main_copy")
    shutil.copytree(main, src)
    dead = [i for i in range(500) if i % 13 == 0]   # spans main AND delta
    delete_documents(src, dead)

    out = str(tmp_path / "compacted")
    meta = compact_index(src, out, mode=mode)
    assert meta["num_docs"] == 500 - len(dead)
    # id space must NOT shrink below the pre-compaction ceiling
    assert meta["doc_id_space"] == 500
    assert (meta.get("compacted_from") == 2) == (mode == "merge")

    sc = BM25Scorer(out)                 # plain scorer: standalone index
    ms = merged_scorer(src)              # merged + tombstoned view
    tbl = corpus.gen_rows(np.arange(500))
    alive = [(i, tbl["content"][i].as_py()) for i in range(500)
             if i % 13 != 0]
    oidx = oracle.OracleIndex(alive)
    assert sc.rd.N == oidx.N
    assert abs(sc.rd.avgdl - oidx.avgdl) < 1e-9
    for q in oracle.make_queries(oidx, 25):
        dc, scs = sc.score(q["terms"], 10)
        dm, sms = ms.score(q["terms"], 10)
        exp = oidx.bm25_topk(q["terms"], 10)
        assert [int(x) for x in dc] == [int(t[0]) for t in exp], q["terms"]
        assert [int(x) for x in dc] == [int(x) for x in dm]
        assert np.allclose(scs, [t[1] for t in exp])
        assert np.allclose(scs, sms)

    # resume: a second compact run with unchanged inputs skips every
    # stage (manifest lineage) — postings mtimes must not change
    import os

    post = os.path.join(out, "postings")
    before = {p: os.path.getmtime(os.path.join(r, p))
              for r, _, fs in os.walk(post) for p in fs}
    compact_index(src, out, mode=mode)
    after = {p: os.path.getmtime(os.path.join(r, p))
             for r, _, fs in os.walk(post) for p in fs}
    assert before == after

    # in-place compaction is refused
    with pytest.raises(ValueError, match="NEW directory"):
        compact_index(src, src)


def test_maybe_compact_policy(delta_dirs, tmp_path):
    """Tiered trigger: no-op under thresholds; fires on tombstone
    fraction; the produced index is the standard compaction output."""
    import os
    import shutil

    from hadoopsearchengine_ray.pipelines.delta import (
        delete_documents,
        maybe_compact,
    )

    main, _, _, _ = delta_dirs
    src = str(tmp_path / "main_copy")
    shutil.copytree(main, src)
    out = str(tmp_path / "auto_compacted")

    # 2 segments, no tombstones: below both thresholds -> no-op
    assert maybe_compact(src, out) is None
    assert not os.path.exists(out)

    # tombstone 10% of 500 docs +1 -> exceeds max_tombstone_frac=0.1
    delete_documents(src, list(range(51)))
    meta = maybe_compact(src, out)
    assert meta is not None and meta["num_docs"] == 500 - 51

    # segment-count trigger: max_segments=1 fires even with 0 tombstones
    src2 = str(tmp_path / "main_copy2")
    shutil.copytree(main, src2)
    out2 = str(tmp_path / "auto_compacted2")
    assert maybe_compact(src2, out2, max_segments=2) is None
    meta2 = maybe_compact(src2, out2, max_segments=1)
    assert meta2 is not None and meta2["num_docs"] == 500


def test_merge_compact_many_segments(tmp_path, ray_session):
    """4 segments (main + 3 deltas) + tombstones in every segment:
    the segment-major salt renumbering must keep each term's sub-rows
    doc-ordered, and scoring must match the oracle over survivors."""
    from hadoopsearchengine_ray.pipelines.compaction import (
        merge_compact_index,
    )
    from hadoopsearchengine_ray.pipelines.delta import (
        add_documents,
        delete_documents,
    )
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    root = tmp_path
    pq.write_table(_doc_table(0, 120), str(root / "main.parquet"))
    main = str(root / "main_idx")
    build_index(str(root / "main.parquet"), main,
                id_mode="column", text_col="text")
    for lo, hi in ((120, 180), (180, 260), (260, 300)):
        p = str(root / f"d{lo}.parquet")
        pq.write_table(_doc_table(lo, hi), p)
        add_documents(main, p)
    dead = [i for i in range(300) if i % 11 == 0]   # hits all 4 segments
    delete_documents(main, dead)

    out = str(root / "compacted")
    meta = merge_compact_index(main, out)
    assert meta["compacted_from"] == 4
    assert meta["num_docs"] == 300 - len(dead)
    assert meta["doc_id_space"] == 300

    tbl = corpus.gen_rows(np.arange(300))
    alive = [(i, tbl["content"][i].as_py()) for i in range(300)
             if i % 11 != 0]
    oidx = oracle.OracleIndex(alive)
    sc = BM25Scorer(out)
    assert sc.rd.N == oidx.N
    assert abs(sc.rd.avgdl - oidx.avgdl) < 1e-9
    for q in oracle.make_queries(oidx, 20):
        d, s = sc.score(q["terms"], 10)
        exp = oidx.bm25_topk(q["terms"], 10)
        assert [int(x) for x in d] == [int(t[0]) for t in exp], q["terms"]
        assert np.allclose(s, [t[1] for t in exp])

    # sub-rows concatenate doc-ordered: reader-decoded postings ascend
    r = IndexReader(out)
    for t in ("def", "return", "import"):
        d, _ = r.decoded_postings(t)
        assert (np.diff(d.astype(np.int64)) > 0).all(), t


def test_wildcard_and_query_string_on_delta_and_tombstone_serving(
        delta_dirs, tmp_path):
    """expand_prefix must work through BOTH wrappers: MergedIndexReader
    (union of segment dictionaries) and TombstoneReader (delegation) —
    a wildcard query on a delta-serving scorer used to AttributeError."""
    import shutil

    from hadoopsearchengine_ray.pipelines.delta import delete_documents
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    main, delta, full, root = delta_dirs
    work = str(tmp_path / "m")
    shutil.copytree(main, work)
    sc = merged_scorer(work)                  # merged, no tombstones yet
    fr = BM25Scorer(full)
    d1, s1 = sc.score_prefix(["ret"], 10)
    d2, s2 = fr.score_prefix(["ret"], 10)
    assert list(d1) == list(d2) and np.allclose(s1, s2)
    q1 = sc.score_query("import^2 +return ret*", 10)
    q2 = fr.score_query("import^2 +return ret*", 10)
    assert list(q1[0]) == list(q2[0]) and np.allclose(q1[1], q2[1])

    delete_documents(work, [0, 7])            # now TombstoneReader wraps
    sc2 = merged_scorer(work)
    d3, _ = sc2.score_query("import ret*", 10)
    assert 0 not in [int(x) for x in d3] and 7 not in [int(x) for x in d3]


def test_delta_inherits_exclude_terms(tmp_path, ray_session):
    """A delta built on a main index with M3 exclusions must amputate
    the same terms, or merged ranking diverges from a rebuild."""
    root = tmp_path
    pq.write_table(_doc_table(0, 60), str(root / "main.parquet"))
    pq.write_table(_doc_table(60, 80), str(root / "new.parquet"))
    main = str(root / "idx")
    build_index(str(root / "main.parquet"), main, id_mode="column",
                text_col="text", exclude_terms=("return",))
    delta = add_documents(main, str(root / "new.parquet"))
    import json
    import os

    with open(os.path.join(delta, "meta.json")) as f:
        assert f.read and json.load(open(os.path.join(delta, "meta.json")))[
            "exclude_terms"] == ["return"]
    merged = MergedIndexReader([main, delta])
    assert merged.lookup("return") is None    # amputated on BOTH sides


def test_compaction_rejects_out_of_range_tombstones(delta_dirs, tmp_path):
    """A tombstone outside the covered doc-id space must fail loudly at
    compaction (both strategies) instead of silently skewing N/avgdl."""
    import shutil

    from hadoopsearchengine_ray.pipelines.delta import (
        compact_index,
        delete_documents,
    )

    main, _, _, _ = delta_dirs
    work = str(tmp_path / "m")
    shutil.copytree(main, work)
    delete_documents(work, [10 ** 9])
    for mode in ("merge", "rebuild"):
        with pytest.raises(ValueError, match="doc-id space"):
            compact_index(work, str(tmp_path / f"out_{mode}"), mode=mode)


def test_empty_segment_does_not_hide_overlap(delta_dirs, tmp_path):
    """An empty segment sorting between two overlapping ranges must not
    defeat the overlap validation."""
    empty_corpus = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),          # zero rows
    })
    pq.write_table(empty_corpus, str(tmp_path / "e.parquet"))
    e_idx = str(tmp_path / "e_idx")
    build_index(str(tmp_path / "e.parquet"), e_idx,
                id_mode="column", text_col="text")
    main, _, full, _ = delta_dirs
    # main (0-399) and full (0-499) overlap; E is empty (max_doc_id -1)
    with pytest.raises(ValueError, match="overlapping"):
        MergedIndexReader([main, e_idx, full])
    # and a rows-but-zero-tokens corpus fails LOUDLY at build
    bad = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": pa.array([""], pa.string())})
    pq.write_table(bad, str(tmp_path / "bad.parquet"))
    with pytest.raises(ValueError, match="zero tokens"):
        build_index(str(tmp_path / "bad.parquet"),
                    str(tmp_path / "bad_idx"),
                    id_mode="column", text_col="text")


def test_rebuild_compaction_with_custom_id_col_and_tombstones(
        tmp_path, ray_session):
    """Token tables are keyed 'doc_id' regardless of id_col: the rebuild
    tombstone filter used to KeyError on a custom-id index."""
    from hadoopsearchengine_ray.pipelines.delta import (
        compact_index,
        delete_documents,
    )

    tbl = corpus.gen_rows(np.arange(0, 80))
    pq.write_table(pa.table({
        "docno": pa.array(range(80), pa.int64()),
        "text": tbl["content"],
    }), str(tmp_path / "c.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "c.parquet"), idx, id_mode="column",
                id_col="docno", text_col="text")
    delete_documents(idx, [3, 11])
    out = str(tmp_path / "out")
    meta = compact_index(idx, out, mode="rebuild")
    assert meta["num_docs"] == 78
    sc = BM25Scorer(out)
    d, _ = sc.score(["return"], 80)
    assert 3 not in [int(x) for x in d] and 11 not in [int(x) for x in d]


def test_merge_compact_carry_tokens_false_is_idempotent(
        tmp_path, ray_session):
    """With carry_tokens=False the tokens stage must still checkpoint:
    a second invocation may not rewrite the sha carry-over."""
    import json
    import os

    from hadoopsearchengine_ray.pipelines.compaction import (
        merge_compact_index,
    )

    tbl = corpus.gen_rows(np.arange(0, 60))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": tbl["content"],
    }), str(tmp_path / "c.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "c.parquet"), idx, id_mode="column",
                text_col="text")
    out = str(tmp_path / "out")
    merge_compact_index(idx, out, carry_tokens=False)
    man1 = json.load(open(os.path.join(out, "manifest.json")))
    assert man1["stages"]["tokens"]["status"] == "done"
    sha_dir = os.path.join(out, "sha256")
    mtime1 = os.path.getmtime(sha_dir)
    merge_compact_index(idx, out, carry_tokens=False)   # resume: no-op
    assert os.path.getmtime(sha_dir) == mtime1
