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
