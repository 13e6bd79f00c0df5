"""Property tests for the posting-merge compaction kernel
(pipelines/compaction._merge_batch): random posting rows + random
tombstones -> decoded output must equal the per-row filtered input,
with salts renumbered segment-major and empty rows dropped.  Covers
the row-split path, the dense whole-batch fallback, positions and the
aux channel in one harness."""

import numpy as np
import pyarrow as pa
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoopsearchengine_ray.codec import (
    decode_aux,
    decode_positions,
    decode_postings,
    encode_term_partition,
)
from hadoopsearchengine_ray.pipelines.compaction import _merge_batch

STRIDE, OUT_PARTS = 8, 16


def _build_batch(rows):
    """rows: list of (term_id, salt, seg, docs, tfs, aux, pos_flat)."""
    term_starts = np.concatenate(
        ([0], np.cumsum([len(r[3]) for r in rows]))).astype(np.int64)
    docs = np.concatenate([r[3] for r in rows]).astype(np.uint64)
    tfs = np.concatenate([r[4] for r in rows]).astype(np.uint64)
    aux = np.concatenate([r[5] for r in rows]).astype(np.uint64)
    pos = np.concatenate([r[6] for r in rows]).astype(np.uint64) \
        if sum(len(r[6]) for r in rows) else np.empty(0, np.uint64)
    cols = encode_term_partition(term_starts, docs, tfs,
                                 positions=pos, aux=aux)
    first = term_starts[:-1]
    tid = np.array([r[0] for r in rows], np.int64)
    return pa.table({
        "term_id": pa.array(tid, pa.int64()),
        "salt": pa.array([r[1] for r in rows], pa.uint8()),
        "cf": pa.array(np.add.reduceat(tfs.astype(np.int64), first)
                       if len(rows) else [], pa.int64()),
        "part": pa.array((tid % OUT_PARTS).astype(np.int32), pa.int32()),
        **cols,
        "acf": pa.array(np.add.reduceat(aux.astype(np.int64), first)
                        if len(rows) else [], pa.int64()),
        "seg": pa.array([r[2] for r in rows], pa.int64()),
    })


@st.composite
def _rows_and_tombs(draw):
    n_rows = draw(st.integers(1, 8))
    used = set()
    rows = []
    for _ in range(n_rows):
        while True:
            key = (draw(st.integers(-50, 50)), draw(st.integers(0, STRIDE - 1)),
                   draw(st.integers(0, 3)))
            if key not in used:
                used.add(key)
                break
        tid, salt, seg = key
        df = draw(st.integers(1, 20))
        docs = np.sort(np.array(
            draw(st.lists(st.integers(0, 500), min_size=df, max_size=df,
                          unique=True)), np.uint64))
        tfs = np.array(draw(st.lists(st.integers(1, 5), min_size=df,
                                     max_size=df)), np.uint64)
        aux = np.array(draw(st.lists(st.integers(0, 7), min_size=df,
                                     max_size=df)), np.uint64)
        pos = np.concatenate([
            np.sort(np.array(
                draw(st.lists(st.integers(0, 1000), min_size=int(t),
                              max_size=int(t), unique=True)), np.uint64))
            for t in tfs]) if tfs.sum() else np.empty(0, np.uint64)
        rows.append((tid, salt, seg, docs, tfs, aux, pos))
    tombs = np.array(sorted(draw(st.sets(st.integers(0, 500),
                                         max_size=120))), np.uint64)
    return rows, tombs


@given(_rows_and_tombs())
@settings(max_examples=60, deadline=None)
def test_merge_batch_equals_filtered_input(ray_session, case):
    rows, tombs = case
    batch = _build_batch(rows)
    target = batch.schema.remove(batch.schema.get_field_index("seg"))
    tomb_ref = ray.put(tombs)
    out = _merge_batch(batch, tomb_ref, STRIDE, OUT_PARTS, target)

    # expected surviving rows, sorted like the kernel's output key
    tset = set(tombs.tolist())
    exp = []
    for tid, salt, seg, docs, tfs, aux, pos in rows:
        keep = np.array([int(d) not in tset for d in docs], bool)
        if not keep.any():
            continue
        offs = np.concatenate(([0], np.cumsum(tfs))).astype(np.int64)
        pmask = np.repeat(keep, tfs.astype(np.int64))
        exp.append((tid, seg * STRIDE + salt, docs[keep], tfs[keep],
                    aux[keep], pos[pmask]))
    exp.sort(key=lambda r: (r[0], r[1]))
    got = out.sort_by([("term_id", "ascending"), ("salt", "ascending")])
    assert got.num_rows == len(exp)
    for i, (tid, salt, docs, tfs, aux, pos) in enumerate(exp):
        assert got["term_id"][i].as_py() == tid
        assert got["salt"][i].as_py() == salt
        assert got["part"][i].as_py() == tid % OUT_PARTS
        df = got["df"][i].as_py()
        assert df == len(docs)
        d, f = decode_postings(got["doc_blob"][i].as_py(),
                               got["tf_blob"][i].as_py(), df)
        assert np.array_equal(d, docs) and np.array_equal(f, tfs)
        assert np.array_equal(
            decode_aux(got["aux_blob"][i].as_py(), df), aux)
        flat, _ = decode_positions(got["pos_blob"][i].as_py(), f)
        assert np.array_equal(flat, pos)
        assert got["cf"][i].as_py() == int(tfs.sum())
        assert got["acf"][i].as_py() == int(aux.sum())


# ---- merge_indexes: independently built shard indexes -> one index ----

def test_merge_indexes_rank_identical_to_full_build(tmp_path, ray_session):
    import json
    import os

    import pyarrow.parquet as pq

    from hadoopsearchengine_ray import oracle
    from hadoopsearchengine_ray.pipelines.build_index import build_index
    from hadoopsearchengine_ray.pipelines.compaction import merge_indexes
    from hadoopsearchengine_ray.pipelines.query import BM25Scorer
    from tests.conftest import doc_id_table

    n, cut = 400, 170
    full = doc_id_table(0, n)
    pq.write_table(full.slice(0, cut), str(tmp_path / "a.parquet"))
    pq.write_table(full.slice(cut), str(tmp_path / "b.parquet"))
    for name in ("a", "b"):
        build_index(str(tmp_path / f"{name}.parquet"),
                    str(tmp_path / f"idx_{name}"),
                    id_mode="column", text_col="text")
    merged = str(tmp_path / "merged")
    # input order deliberately REVERSED: merge_indexes sorts by range
    meta = merge_indexes([str(tmp_path / "idx_b"), str(tmp_path / "idx_a")],
                         merged)
    assert meta["num_docs"] == n

    # CLI wiring: `merge` subcommand produces the same meta
    from hadoopsearchengine_ray.__main__ import main

    assert main(["merge", "--out", str(tmp_path / "merged_cli"),
                 str(tmp_path / "idx_a"), str(tmp_path / "idx_b")]) == 0
    with open(str(tmp_path / "merged_cli" / "meta.json")) as f:
        assert json.load(f)["num_docs"] == n

    idx = oracle.OracleIndex(
        [(i, full["text"][i].as_py()) for i in range(n)])
    sc = BM25Scorer(merged)
    for q in oracle.make_queries(idx, 30):
        d, s = sc.score(q["terms"], q["k"])
        gold = idx.bm25_topk(q["terms"], q["k"])
        assert [int(x) for x in d] == [g[0] for g in gold], q["terms"]
        assert np.allclose(s, [g[1] for g in gold], atol=1e-6)
    # positions survive the merge: phrase counts match the shadow
    from hadoopsearchengine_ray.pipelines.positional import phrase_counts

    rd_ = sc.rd
    toks = full["text"][0].as_py().split()[:2]
    if all(len(t) >= 2 for t in toks):
        dd, cc = phrase_counts(rd_, [t.lower() for t in toks])
        want = idx.phrase_counts([t.lower() for t in toks])
        assert {int(a): int(b) for a, b in zip(dd, cc)} == want


def test_merge_indexes_rejects_overlap_and_tombstones(tmp_path, ray_session):
    import pyarrow.parquet as pq
    import pytest

    from hadoopsearchengine_ray.pipelines.build_index import build_index
    from hadoopsearchengine_ray.pipelines.compaction import merge_indexes
    from tests.conftest import doc_id_table

    pq.write_table(doc_id_table(0, 60), str(tmp_path / "a.parquet"))
    pq.write_table(doc_id_table(30, 90), str(tmp_path / "b.parquet"))
    for name in ("a", "b"):
        build_index(str(tmp_path / f"{name}.parquet"),
                    str(tmp_path / f"idx_{name}"),
                    id_mode="column", text_col="text")
    with pytest.raises(ValueError, match="overlap"):
        merge_indexes([str(tmp_path / "idx_a"), str(tmp_path / "idx_b")],
                      str(tmp_path / "m1"))
    # id-space ceiling overhang: a segment whose recorded doc_id_space
    # exceeds the next segment's range start (e.g. post-deletion
    # compaction kept the old ceiling) would be re-sorted past it by
    # the blob merge — must refuse loudly
    import json as _json

    pq.write_table(doc_id_table(70, 130), str(tmp_path / "c.parquet"))
    build_index(str(tmp_path / "c.parquet"), str(tmp_path / "idx_c"),
                id_mode="column", text_col="text")
    meta_p = str(tmp_path / "idx_a" / "meta.json")
    with open(meta_p) as f:
        meta_a = _json.load(f)
    meta_a["doc_id_space"] = 75            # live docs end at 59
    with open(meta_p, "w") as f:
        _json.dump(meta_a, f)
    with pytest.raises(ValueError, match="overhanging"):
        merge_indexes([str(tmp_path / "idx_a"), str(tmp_path / "idx_c")],
                      str(tmp_path / "m_ceil"))
    meta_a["doc_id_space"] = 60
    with open(meta_p, "w") as f:
        _json.dump(meta_a, f)

    # pending delta segments would be silently dropped — must refuse
    ddir = tmp_path / "idx_c" / "deltas" / "abc123"
    ddir.mkdir(parents=True)
    with open(str(ddir / "meta.json"), "w") as f:
        f.write("{}")
    with pytest.raises(ValueError, match="delta"):
        merge_indexes([str(tmp_path / "idx_a"), str(tmp_path / "idx_c")],
                      str(tmp_path / "m_delta"))

    with open(str(tmp_path / "idx_a" / "tombstones.json"), "w") as f:
        f.write("[1]")
    with pytest.raises(ValueError, match="tombstones"):
        merge_indexes([str(tmp_path / "idx_a"), str(tmp_path / "idx_b")],
                      str(tmp_path / "m2"))
    with pytest.raises(ValueError, match=">= 2"):
        merge_indexes([str(tmp_path / "idx_a")], str(tmp_path / "m3"))
