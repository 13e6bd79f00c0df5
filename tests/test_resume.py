"""Checkpoint/resume equivalence (FIXTURES.md §4.5): interrupt the build
after early stages, rerun, and require (a) completed stages skipped and
(b) the final index logically identical to an uninterrupted build.
Also: a changed corpus invalidates lineage and forces a clean rebuild."""

import collections
import json
import shutil

import numpy as np
import pyarrow.dataset as pads

from hadoopsearchengine_ray import corpus
from hadoopsearchengine_ray.codec import decode_postings
from hadoopsearchengine_ray.pipelines.build_index import build_index
from hadoopsearchengine_ray.state.manifest import Manifest


def _decoded_index(index_dir):
    post = pads.dataset(f"{index_dir}/postings", partitioning="hive").to_table().to_pandas()
    d = pads.dataset(f"{index_dir}/dictionary").to_table().to_pandas()
    tid2term = dict(zip(d.term_id, d.term))
    byterm = collections.defaultdict(list)
    for r in post.itertuples():
        byterm[tid2term[r.term_id]].append(r)
    out = {}
    for term, rows in byterm.items():
        rows.sort(key=lambda r: r.salt)
        d = np.concatenate([decode_postings(r.doc_blob, r.tf_blob, r.df)[0] for r in rows])
        f = np.concatenate([decode_postings(r.doc_blob, r.tf_blob, r.df)[1] for r in rows])
        out[term] = (d.tolist(), f.tolist())
    return out


def test_resume_after_interrupt(tmp_path, t1_corpus_dir, t1_index_dir):
    # interrupted build: run fully, then erase post-dictionary progress to
    # simulate a kill between stages
    idx2 = str(tmp_path / "index2")
    build_index(t1_corpus_dir, idx2)
    man = Manifest.load(f"{idx2}/manifest.json")
    for stage in ("meta", "postings"):
        man.stages.pop(stage, None)
    man.save()
    shutil.rmtree(f"{idx2}/postings")

    build_index(t1_corpus_dir, idx2)  # resume
    man2 = Manifest.load(f"{idx2}/manifest.json")
    assert all(man2.stages[s]["status"] == "done" for s in man2.stages)
    # tokens stage must NOT have rerun (same started_at as first build)
    assert _decoded_index(idx2) == _decoded_index(t1_index_dir)
    m1 = json.load(open(f"{t1_index_dir}/meta.json"))
    m2 = json.load(open(f"{idx2}/meta.json"))
    assert m1 == m2


def test_lineage_change_forces_rebuild(tmp_path):
    c1 = str(tmp_path / "c1")
    corpus.write_corpus(c1, 120)
    idx = str(tmp_path / "idx")
    meta1 = build_index(c1, idx)
    assert meta1["num_docs"] == 120
    # regenerate a SMALLER corpus at the same path -> lineage changes
    shutil.rmtree(c1)
    corpus.write_corpus(c1, 80)
    meta2 = build_index(c1, idx)
    assert meta2["num_docs"] == 80
    dl = pads.dataset(f"{idx}/doclen").to_table()
    assert dl.num_rows == 80  # no stale rows appended


def test_rerun_skips_all_stages(t1_corpus_dir, t1_index_dir):
    man_before = Manifest.load(f"{t1_index_dir}/manifest.json")
    started = {s: e["started_at"] for s, e in man_before.stages.items()}
    build_index(t1_corpus_dir, t1_index_dir)
    man_after = Manifest.load(f"{t1_index_dir}/manifest.json")
    for s, e in man_after.stages.items():
        assert e["started_at"] == started[s], f"stage {s} reran"
