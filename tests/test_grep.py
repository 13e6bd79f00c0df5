"""Trigram substring/regex index (pipelines/grep.py) vs brute force."""

import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoopsearchengine_ray import corpus
from hadoopsearchengine_ray.pipelines import grep
from hadoopsearchengine_ray.pipelines.grep import (
    TrigramIndex,
    _encode_block,
    _pattern_grams,
    build_trigram_index,
    grep_count,
    grep_lines,
    grep_multi,
    grep_regex,
    grep_substring,
    regex_required_literals,
)

N_DOCS = 300


@pytest.fixture(scope="module")
def grep_corpus(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("grep")
    tbl = corpus.gen_rows(np.arange(N_DOCS))
    tbl = tbl.append_column(
        "doc_id", pa.array(np.arange(N_DOCS, dtype=np.int64)))
    path = str(d / "docs.parquet")
    pq.write_table(tbl, path)
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["content"].to_pylist()))
    return path, texts


@pytest.fixture(scope="module")
def grep_index(grep_corpus, tmp_path_factory):
    path, _ = grep_corpus
    idx = str(tmp_path_factory.mktemp("grep_idx") / "tri")
    build_trigram_index(path, idx, text_col="content", id_col="doc_id")
    return idx


SUBSTRINGS = [
    "def ",               # common
    "return",             # common token
    "zzz_never_there",    # absent
    "x)",                 # 2 bytes -> full-scan fallback
    "for (",
]


def test_substring_parity(grep_corpus, grep_index):
    path, texts = grep_corpus
    for pat in SUBSTRINGS:
        got = grep_substring(grep_index, path, pat)["doc_id"].to_pylist()
        want = sorted(d for d, s in texts.items() if pat in s)
        assert got == want, pat


REGEXES = [
    r"def \w+\(",                # class breaks the run; 'def ' required
    r"(return|yield) ",          # branch of two literals
    r"for \(int",                # literal with paren
    r"import\s+os",              # both sides required
    r"never(gonna|match)zzz",    # absent
]


def test_regex_parity(grep_corpus, grep_index):
    path, texts = grep_corpus
    for rx in REGEXES:
        got = grep_regex(grep_index, path, rx)["doc_id"].to_pylist()
        rc = re.compile(rx)
        want = sorted(d for d, s in texts.items() if rc.search(s))
        assert got == want, rx


def test_broadcast_verify_path(grep_corpus, grep_index, monkeypatch):
    """Force the distributed broadcast-filter verify (large-candidate
    dispatch) and check it returns the same rows as the driver path."""
    path, texts = grep_corpus
    pat = "return"
    base = grep_substring(grep_index, path, pat)["doc_id"].to_pylist()
    monkeypatch.setattr(grep, "DRIVER_FETCH_CAP", 0)
    dist = grep_substring(grep_index, path, pat)["doc_id"].to_pylist()
    assert dist == base and base == sorted(
        d for d, s in texts.items() if pat in s)


def test_required_literal_cnf():
    assert regex_required_literals(r"spark (scan|merge)") == \
        [["spark "], ["scan", "merge"]]
    # min=0 repeat contributes nothing; the literal around it stays
    assert regex_required_literals(r"abc(xyz)?def") == [["abc"], ["def"]]
    # a branch with a non-literal alternative prunes nothing
    assert regex_required_literals(r"(abc|d+)") == []
    # anchors break runs but don't block literals
    assert regex_required_literals(r"^needle$") == [["needle"]]
    # classes break the run mid-literal
    assert regex_required_literals(r"foo[0-9]bar") == [["foo"], ["bar"]]
    # short literals (<3 bytes) yield no requirement
    assert regex_required_literals(r"ab") == []
    # min>=1 repeats require one occurrence of the body
    assert regex_required_literals(r"(abcd)+") == [["abcd"]]


def test_pattern_grams():
    g = _pattern_grams(b"abcd")
    assert sorted(g) == sorted([
        (ord("a") << 16) | (ord("b") << 8) | ord("c"),
        (ord("b") << 16) | (ord("c") << 8) | ord("d"),
    ])
    assert len(_pattern_grams(b"ab")) == 0


def test_segment_merge(tmp_path):
    """A gram split across encode blocks must merge at read time."""
    idx = str(tmp_path / "seg")
    gram = (ord("a") << 16) | (ord("b") << 8) | ord("c")
    bucket = gram % 64
    rows1 = pa.table({
        "bucket": pa.array([bucket] * 3, pa.int32()),
        "gram": pa.array([gram] * 3, pa.int32()),
        "doc_id": pa.array([1, 5, 9], pa.int64()),
    })
    rows2 = pa.table({
        "bucket": pa.array([bucket] * 2, pa.int32()),
        "gram": pa.array([gram] * 2, pa.int32()),
        "doc_id": pa.array([3, 7], pa.int64()),
    })
    seg = pa.concat_tables([_encode_block(rows1), _encode_block(rows2)])
    pdir = os.path.join(idx, "postings", f"bucket={bucket}")
    os.makedirs(pdir)
    pq.write_table(seg.drop_columns(["bucket"]),
                   os.path.join(pdir, "part.parquet"))
    ddir = os.path.join(idx, "df")
    os.makedirs(ddir)
    pq.write_table(pa.table({"gram": pa.array([gram], pa.int32()),
                             "df": pa.array([5], pa.int64())}),
                   os.path.join(ddir, "df.parquet"))
    import json
    with open(os.path.join(idx, "meta.json"), "w") as f:
        json.dump({"text_col": "content", "id_col": "doc_id",
                   "num_buckets": 64}, f)
    ti = TrigramIndex(idx)
    assert ti.postings([gram])[gram].tolist() == [1, 3, 5, 7, 9]


def test_empty_corpus(tmp_path, ray_session):
    src = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "content": pa.array([], pa.string()),
    }), src)
    idx = str(tmp_path / "idx")
    build_trigram_index(src, idx, text_col="content", id_col="doc_id")
    assert grep_substring(idx, src, "anything").num_rows == 0
    assert grep_regex(idx, src, r"any(thing|where)").num_rows == 0


def test_grep_count_parity(grep_corpus, grep_index):
    """Non-overlapping counts vs str.count (same convention)."""
    path, texts = grep_corpus
    for pat in ["return", "def ", "zzz_never_there"]:
        got = grep_count(grep_index, path, pat)
        want = {d: s.count(pat) for d, s in texts.items() if pat in s}
        assert dict(zip(got["doc_id"].to_pylist(),
                        got["n_matches"].to_pylist())) == want, pat
        assert got["doc_id"].to_pylist() == sorted(want)


def test_grep_multi_parity(grep_corpus, grep_index):
    """Batched multi-pattern grep: common + absent + short (full-scan)
    patterns in one batch, vs per-pattern brute force."""
    path, texts = grep_corpus
    pats = ["return", "def ", "zzz_never_there", "x)", "for ("]
    got = grep_multi(grep_index, path, pats)
    pairs = list(zip(got["pattern"].to_pylist(),
                     got["doc_id"].to_pylist()))
    want = sorted((p, d) for p in pats
                  for d, s in texts.items() if p in s)
    assert pairs == want


def test_grep_multi_dispatch_parity(grep_corpus, grep_index, monkeypatch):
    """Distributed union-scan path returns what the driver path does."""
    path, texts = grep_corpus
    pats = ["return", "import os"]
    base = grep_multi(grep_index, path, pats)
    monkeypatch.setattr(grep, "DRIVER_FETCH_CAP", 0)
    dist = grep_multi(grep_index, path, pats)
    assert base.equals(dist)
    monkeypatch.undo()
    assert grep_multi(grep_index, path, ["zzz_never_there"]).num_rows == 0


def test_casefold_index(tmp_path, ray_session):
    """Casefolded index: lower(text)-contains-lower(pat) semantics,
    discriminating corpus (mixed case); regex over the folded index
    serves regexp_matches(lower(text), pattern)."""
    rows = {
        0: "Merge BATCH now",
        1: "merge batch now",
        2: "MERGE nothing",
        3: "unrelated text",
    }
    src = str(tmp_path / "mixed.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(rows), pa.int64()),
        "content": pa.array([rows[k] for k in sorted(rows)], pa.string()),
    }), src)
    ci = str(tmp_path / "ci")
    build_trigram_index(src, ci, text_col="content", id_col="doc_id",
                        casefold=True)
    cs = str(tmp_path / "cs")
    build_trigram_index(src, cs, text_col="content", id_col="doc_id")

    assert grep_substring(ci, src, "MERGE batch")["doc_id"].to_pylist() \
        == [0, 1]
    assert grep_substring(cs, src, "MERGE batch")["doc_id"].to_pylist() \
        == []
    got = grep_count(ci, src, "MeRgE")
    assert dict(zip(got["doc_id"].to_pylist(),
                    got["n_matches"].to_pylist())) == {0: 1, 1: 1, 2: 1}
    assert grep_multi(ci, src, ["merge BATCH", "NOTHING"]) \
        .to_pydict() == {"pattern": ["NOTHING", "merge BATCH",
                                     "merge BATCH"],
                         "doc_id": [2, 0, 1]}
    # regex on the folded index: regexp_matches(lower(text), pattern)
    assert grep_regex(ci, src, "merge (batch|nothing)")["doc_id"] \
        .to_pylist() == [0, 1, 2]
    # an uppercase literal can never occur in lowered text: provably
    # empty at PLAN time (candidates, not just verify)
    assert len(TrigramIndex(ci).candidates_regex("MERGE batch")) == 0
    assert grep_regex(ci, src, "MERGE (batch|now)").num_rows == 0


def test_multiblock_build_parity(grep_corpus, tmp_path, ray_session):
    """Build from a many-block Dataset (sort emits multiple encode
    blocks -> per-gram segments) and check parity still holds."""
    import ray.data as rd

    path, texts = grep_corpus
    ds = rd.read_parquet(path, columns=["doc_id", "content"]) \
        .repartition(8)
    idx = str(tmp_path / "mb")
    build_trigram_index(ds, idx, text_col="content", id_col="doc_id")
    pat = "return"
    got = grep_substring(idx, path, pat)["doc_id"].to_pylist()
    assert got == sorted(d for d, s in texts.items() if pat in s)


def _write_docs(path: str, rows: dict[int, str],
                col: str = "content") -> str:
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(rows), pa.int64()),
        col: pa.array([rows[k] for k in sorted(rows)], pa.string()),
    }), path)
    return path


def test_regex_ignorecase_is_not_pruned(tmp_path, ray_session):
    """(?i) regexes must not be planned with case-sensitive grams —
    the old planner required the as-written literal's trigrams and
    silently dropped every upper-case match."""
    src = _write_docs(str(tmp_path / "up.parquet"), {
        0: "MERGE batch now", 1: "unrelated text here",
        2: "big merge day"})
    idx = str(tmp_path / "cs")
    build_trigram_index(src, idx, text_col="content", id_col="doc_id")

    # global flag: NO sound pruning derivable
    assert regex_required_literals("(?i)merge") == []
    ti = TrigramIndex(idx)
    assert ti.candidates_regex("(?i)merge") is None
    assert grep_regex(idx, src, "(?i)merge")["doc_id"].to_pylist() \
        == [0, 2]
    # scoped flag: the group is opaque, surrounding literals still prune
    assert regex_required_literals("(?i:merge) batch") == [[" batch"]]
    assert grep_regex(idx, src, "(?i:merge) batch")["doc_id"] \
        .to_pylist() == [0]
    # case-sensitive patterns keep their pruning
    assert ti.candidates_regex("merge") is not None


def test_casefold_non_ascii(tmp_path, ray_session):
    """The casefolded index folds with the SAME utf8_lower kernel the
    verify stage uses, so non-ASCII case pairs are found (the old
    ASCII-only byte fold silently missed them)."""
    src = _write_docs(str(tmp_path / "uni.parquet"), {
        0: "RÉSUMÉ time", 1: "résumé time", 2: "nothing here"})
    ci = str(tmp_path / "ci")
    build_trigram_index(src, ci, text_col="content", id_col="doc_id",
                        casefold=True)
    assert grep_substring(ci, src, "résumé")["doc_id"].to_pylist() == [0, 1]
    assert grep_substring(ci, src, "RÉSUMÉ")["doc_id"].to_pylist() == [0, 1]
    got = grep_count(ci, src, "Résumé time")
    assert dict(zip(got["doc_id"].to_pylist(),
                    got["n_matches"].to_pylist())) == {0: 1, 1: 1}
    assert grep_multi(ci, src, ["résumé TIME"]).to_pydict() == {
        "pattern": ["résumé TIME"] * 2, "doc_id": [0, 1]}


def test_stale_casefold_format_rejected(tmp_path, ray_session):
    """A casefolded index without the utf8_lower fold marker (the old
    ASCII-fold format) must be refused, not silently served."""
    import json

    src = _write_docs(str(tmp_path / "s.parquet"), {0: "abc def"})
    ci = str(tmp_path / "old")
    build_trigram_index(src, ci, text_col="content", id_col="doc_id",
                        casefold=True)
    meta_path = os.path.join(ci, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta.pop("fold")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="rebuild"):
        TrigramIndex(ci)


def test_trigram_for_cache_key_covers_columns(tmp_path, ray_session,
                                              monkeypatch):
    """trigram_for must not serve an index built over one column pair
    for a call asking different columns."""
    from hadoopsearchengine_ray.functions import search

    monkeypatch.setattr(search, "CACHE_ROOT", str(tmp_path / "cache"))
    src = str(tmp_path / "two.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["alpha body", "beta body"], pa.string()),
        "alt": pa.array(["gamma side", "delta side"], pa.string()),
    }), src)
    d1 = search.trigram_for(src, text_col="text")
    d2 = search.trigram_for(src, text_col="alt")
    assert d1 != d2
    assert grep_substring(d2, src, "delta side")["doc_id"].to_pylist() \
        == [1]
    assert grep_substring(d1, src, "alpha body")["doc_id"].to_pylist() \
        == [0]


def test_trigram_for_tag_separator_safe(tmp_path, ray_session,
                                        monkeypatch):
    """Column names containing the old ':' separator must not collide
    to one cache key (['a:b','c'] vs ['a','b:c'])."""
    from hadoopsearchengine_ray.functions import search

    monkeypatch.setattr(search, "CACHE_ROOT", str(tmp_path / "cache"))
    src = str(tmp_path / "colon.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "c": pa.array([9], pa.int64()),
        "a:b": pa.array(["left column text"], pa.string()),
        "a": pa.array(["right column text"], pa.string()),
        "b:c": pa.array([3], pa.int64()),
    }), src)
    d1 = search.trigram_for(src, text_col="a:b", id_col="c")
    d2 = search.trigram_for(src, text_col="a", id_col="b:c")
    assert d1 != d2


def test_grep_lines_matches_bruteforce(grep_corpus, grep_index,
                                       monkeypatch):
    """Line-level grep vs a pure-Python line scan over the multi-line
    corpus, on both the driver-fetch and the streaming dispatch."""
    from hadoopsearchengine_ray.pipelines.grep import grep_lines

    path, texts = grep_corpus
    for pat in ("return", "for (", "zzz_never_there"):
        want = [(d, i + 1, ln)
                for d in sorted(texts)
                for i, ln in enumerate(texts[d].split("\n"))
                if pat in ln]
        got = grep_lines(grep_index, path, pat)
        rows = list(zip(got["doc_id"].to_pylist(),
                        got["line_no"].to_pylist(),
                        got["line"].to_pylist()))
        assert rows == want, pat
        assert any(n > 1 for _, n, _ in rows) or not rows  # multi-line
    base = grep_lines(grep_index, path, "return")
    monkeypatch.setattr(grep, "DRIVER_FETCH_CAP", 0)
    assert grep_lines(grep_index, path, "return").equals(base)


def test_grep_lines_casefold(tmp_path, ray_session):
    src = _write_docs(str(tmp_path / "ml.parquet"), {
        0: "Merge BATCH\nnothing\nMERGE batch again",
        1: "plain text"})
    ci = str(tmp_path / "ci")
    build_trigram_index(src, ci, text_col="content", id_col="doc_id",
                        casefold=True)
    from hadoopsearchengine_ray.pipelines.grep import grep_lines
    got = grep_lines(ci, src, "merge batch")
    assert list(zip(got["doc_id"].to_pylist(),
                    got["line_no"].to_pylist())) == [(0, 1), (0, 3)]


def test_trigram_delta_parity(grep_corpus, tmp_path, ray_session):
    """Half-then-delta incremental build serves identically to a full
    build (segments spanning base+delta merge in the reader, df table
    re-aggregated), and a delta onto an EMPTY base works."""
    from hadoopsearchengine_ray.pipelines.grep import (
        TrigramIndex,
        add_to_trigram_index,
    )

    path, texts = grep_corpus
    full_tbl = pq.read_table(path)
    half = full_tbl.num_rows // 2
    base_src = str(tmp_path / "base.parquet")
    delta_src = str(tmp_path / "delta.parquet")
    pq.write_table(full_tbl.slice(0, half), base_src)
    pq.write_table(full_tbl.slice(half), delta_src)
    idx = str(tmp_path / "inc")
    build_trigram_index(base_src, idx, text_col="content",
                        id_col="doc_id")
    add_to_trigram_index(delta_src, idx)
    full_idx = str(tmp_path / "full")
    build_trigram_index(path, full_idx, text_col="content",
                        id_col="doc_id")
    for pat in ("return", "def ", "import os", "zzz_never_there"):
        want = sorted(d for d, s in texts.items() if pat in s)
        assert grep_substring(idx, path, pat)["doc_id"].to_pylist() \
            == want, pat
        # planner state parity: same candidate sets as the full build
        inc, full = TrigramIndex(idx), TrigramIndex(full_idx)
        ci = inc.candidates_literal(pat)
        cf = full.candidates_literal(pat)
        assert (ci is None) == (cf is None)
        if ci is not None:
            assert sorted(ci.tolist()) == sorted(cf.tolist()), pat
    assert grep_regex(idx, path, "return [a-z]+").equals(
        grep_regex(full_idx, path, "return [a-z]+"))
    # delta onto an empty base
    empty_src = str(tmp_path / "none.parquet")
    pq.write_table(full_tbl.slice(0, 0), empty_src)
    e_idx = str(tmp_path / "embase")
    build_trigram_index(empty_src, e_idx, text_col="content",
                        id_col="doc_id")
    add_to_trigram_index(delta_src, e_idx)
    pat = "return"
    want = sorted(d for d, s in texts.items()
                  if d >= half and pat in s)
    assert grep_substring(e_idx, delta_src, pat)["doc_id"].to_pylist() \
        == want


def test_delta_ingest_marker_and_retry(grep_corpus, tmp_path,
                                       ray_session):
    """A half-finished delta ingest must be refused loudly (stale df
    would silently drop delta-only matches), and re-running the SAME
    delta converges (duplicate segments are harmless)."""
    from hadoopsearchengine_ray.pipelines.grep import (
        _INGEST_MARKER,
        TrigramIndex,
        add_to_trigram_index,
    )

    path, texts = grep_corpus
    full_tbl = pq.read_table(path)
    half = full_tbl.num_rows // 2
    base_src = str(tmp_path / "b.parquet")
    delta_src = str(tmp_path / "d.parquet")
    pq.write_table(full_tbl.slice(0, half), base_src)
    pq.write_table(full_tbl.slice(half), delta_src)
    idx = str(tmp_path / "inc")
    build_trigram_index(base_src, idx, text_col="content",
                        id_col="doc_id")
    # simulate a crash mid-ingest: marker present -> loud refusal
    marker = os.path.join(idx, _INGEST_MARKER)
    open(marker, "w").close()
    with pytest.raises(ValueError, match="half-finished"):
        TrigramIndex(idx)
    with pytest.raises(ValueError, match="half-finished"):
        grep_substring(idx, path, "return")
    os.remove(marker)
    # apply the delta TWICE (retry-after-crash): results stay exact
    add_to_trigram_index(delta_src, idx)
    add_to_trigram_index(delta_src, idx)
    for pat in ("return", "def "):
        want = sorted(d for d, s in texts.items() if pat in s)
        assert grep_substring(idx, path, pat)["doc_id"].to_pylist() \
            == want, pat
    assert not os.path.exists(marker)


def test_cli_grep_reuse_and_lineage(tmp_path, ray_session, capsys):
    """CLI grep must not serve an index built with different params
    (-i mismatch) or over a rewritten corpus; regex -i serves
    regexp_matches(lower(text), pattern) from the folded index."""
    from hadoopsearchengine_ray.__main__ import main

    src = _write_docs(str(tmp_path / "c.parquet"),
                      {0: "Merge BATCH now", 1: "merge batch now"},
                      col="text")
    idx = str(tmp_path / "cli_idx")

    assert main(["grep", "--corpus", src, "--index", idx,
                 "merge batch"]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in rows] == [1]
    # same index dir, now case-insensitive: must rebuild, not reuse
    assert main(["grep", "--corpus", src, "--index", idx, "-i",
                 "merge batch"]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in rows] == [0, 1]
    # corpus rewritten in place: lineage forces a rebuild
    _write_docs(src, {0: "nothing here", 1: "merge batch still",
                      2: "merge batch too"}, col="text")
    assert main(["grep", "--corpus", src, "--index", idx, "-i",
                 "merge batch"]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in rows] == [1, 2]
    # regex on the casefolded index: regexp_matches(lower(text), pat)
    assert main(["grep", "--corpus", src, "--index", idx, "-i",
                 "--mode", "regex", "merge (batch|gone)"]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in rows] == [1, 2]


def test_grep_tombstones(grep_corpus, tmp_path, ray_session,
                         monkeypatch):
    """Tombstoned docs vanish from every grep mode on every dispatch
    path, including the no-trigram full-scan fallback; deletes
    accumulate; a fresh rebuild clears them."""
    from hadoopsearchengine_ray.pipelines.grep import (
        delete_from_trigram_index,
        grep_lines,
    )

    path, texts = grep_corpus
    idx = str(tmp_path / "ts")
    build_trigram_index(path, idx, text_col="content", id_col="doc_id")
    dead = sorted(d for d in texts if d % 7 == 0)
    assert delete_from_trigram_index(idx, dead) == len(dead)
    for pat in ("return", "x)"):   # pruned path AND 2-byte full scan
        want = sorted(d for d, s in texts.items()
                      if pat in s and d % 7 != 0)
        assert grep_substring(idx, path, pat)["doc_id"].to_pylist() \
            == want, pat
    for tbl in (grep_count(idx, path, "return"),
                grep_multi(idx, path, ["return", "def "]),
                grep_lines(idx, path, "return"),
                grep_regex(idx, path, "return [a-z]+")):
        assert all(d % 7 != 0 for d in tbl["doc_id"].to_pylist())
    # streaming dispatch honors them too
    monkeypatch.setattr(grep, "DRIVER_FETCH_CAP", 0)
    got = grep_substring(idx, path, "return")["doc_id"].to_pylist()
    assert got == sorted(d for d, s in texts.items()
                         if "return" in s and d % 7 != 0)
    monkeypatch.undo()
    # deletes accumulate
    delete_from_trigram_index(idx, [d for d in texts if d % 7 == 1])
    got = grep_substring(idx, path, "return")["doc_id"].to_pylist()
    assert got and all(d % 7 not in (0, 1) for d in got)
    # rebuild = compaction: tombstones cleared with the fresh index
    import shutil
    shutil.rmtree(idx)
    build_trigram_index(path, idx, text_col="content", id_col="doc_id")
    assert grep_substring(idx, path, "return")["doc_id"].to_pylist() \
        == sorted(d for d, s in texts.items() if "return" in s)


def test_cli_grep_lifecycle(tmp_path, ray_session, capsys):
    """grep-ingest and grep-delete drive the delta/tombstone lifecycle
    end-to-end from the CLI."""
    from hadoopsearchengine_ray.__main__ import main

    src = _write_docs(str(tmp_path / "b.parquet"),
                      {0: "alpha merge", 1: "merge beta"}, col="text")
    delta = _write_docs(str(tmp_path / "d.parquet"),
                        {2: "gamma merge", 3: "no match"}, col="text")
    idx = str(tmp_path / "life")
    assert main(["grep", "--corpus", src, "--index", idx, "merge"]) == 0
    rows = [json.loads(x) for x in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in rows] == [0, 1]
    assert main(["grep-ingest", "--corpus", delta, "--index", idx]) == 0
    capsys.readouterr()
    # note: grep revalidates lineage of --corpus only; query the union
    # through the library (the CLI's lineage guard would rebuild from
    # src alone, which is the correct single-corpus contract)
    from hadoopsearchengine_ray.pipelines.grep import grep_substring
    import pyarrow.parquet as _pq
    import pyarrow as _pa
    union = str(tmp_path / "u.parquet")
    _pq.write_table(_pa.concat_tables([
        _pq.read_table(src), _pq.read_table(delta)]), union)
    assert grep_substring(idx, union, "merge")["doc_id"].to_pylist() \
        == [0, 1, 2]
    assert main(["grep-delete", "--index", idx, "1", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["tombstones"] == 2
    assert grep_substring(idx, union, "merge")["doc_id"].to_pylist() \
        == [0]


def test_cli_rebuild_preserves_tombstones(tmp_path, ray_session,
                                          capsys):
    """A stale-lineage CLI rebuild must NOT resurrect grep-deleted
    docs: tombstones are user intent and carry across the rebuild."""
    from hadoopsearchengine_ray.__main__ import main

    src = _write_docs(str(tmp_path / "c.parquet"),
                      {0: "alpha merge", 1: "merge beta",
                       2: "merge gamma"}, col="text")
    idx = str(tmp_path / "keep")
    assert main(["grep", "--corpus", src, "--index", idx, "merge"]) == 0
    capsys.readouterr()
    assert main(["grep-delete", "--index", idx, "1"]) == 0
    capsys.readouterr()
    # content-identical rewrite: same bytes, fresh mtime -> lineage
    # mismatch -> rebuild path
    data = open(src, "rb").read()
    with open(src, "wb") as f:
        f.write(data)
    os.utime(src, (0, 0))
    assert main(["grep", "--corpus", src, "--index", idx, "merge"]) == 0
    rows = [json.loads(x) for x in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in rows] == [0, 2]   # 1 stays deleted


def test_cli_grep_ingest_refreshes_lineage(tmp_path, ray_session,
                                           capsys):
    """grep-ingest --full-corpus makes the delta-ingested index
    reachable through the CLI: the next grep over the combined corpus
    reuses the index (no rebuild) and serves delta docs."""
    from hadoopsearchengine_ray.__main__ import main

    src = _write_docs(str(tmp_path / "b.parquet"),
                      {0: "alpha merge", 1: "merge beta"}, col="text")
    delta = _write_docs(str(tmp_path / "d.parquet"),
                        {2: "gamma merge"}, col="text")
    union = str(tmp_path / "u.parquet")
    pq.write_table(pa.concat_tables([pq.read_table(src),
                                     pq.read_table(delta)]), union)
    idx = str(tmp_path / "lin")
    assert main(["grep", "--corpus", src, "--index", idx, "merge"]) == 0
    capsys.readouterr()
    assert main(["grep-ingest", "--corpus", delta, "--index", idx,
                 "--full-corpus", union]) == 0
    capsys.readouterr()
    post_dir = os.path.join(idx, "postings")
    n_files_before = sum(len(fs) for _, _, fs in os.walk(post_dir))
    assert main(["grep", "--corpus", union, "--index", idx,
                 "merge"]) == 0
    cap = capsys.readouterr()
    rows = [json.loads(x) for x in cap.out.strip().splitlines()]
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    assert "rebuilding" not in cap.err
    n_files_after = sum(len(fs) for _, _, fs in os.walk(post_dir))
    assert n_files_after == n_files_before   # reused, not rebuilt


def test_df_publish_marker_recovery(grep_corpus, tmp_path,
                                    ray_session):
    """A crash between the df publish renames leaves the _DF_INPROGRESS
    marker; opening the index refuses loudly and rebuild_trigram_df
    recovers from the (intact) posting segments."""
    import shutil

    from hadoopsearchengine_ray.pipelines.grep import (
        _DF_MARKER,
        rebuild_trigram_df,
    )

    path, texts = grep_corpus
    idx = str(tmp_path / "dfcrash")
    build_trigram_index(path, idx, text_col="content", id_col="doc_id")
    # simulate the crash window: old df renamed aside, marker present
    os.replace(os.path.join(idx, "df"), os.path.join(idx, "df.old"))
    with open(os.path.join(idx, _DF_MARKER), "w") as f:
        f.write("crash\n")
    with pytest.raises(ValueError, match="rebuild_trigram_df"):
        TrigramIndex(idx)
    rebuild_trigram_df(idx)
    want = sorted(d for d, s in texts.items() if "return" in s)
    assert grep_substring(idx, path, "return")["doc_id"].to_pylist() \
        == want


def test_output_path_mode_parity(grep_corpus, grep_index, tmp_path):
    """output_path mode: the match set lands as sorted parquet, the
    return value is a (path, n_rows) manifest, and the file contents
    equal the driver-table path — on BOTH dispatch branches (pruned
    fetch and fetch_cap=0-forced streaming), for substring, lines,
    multi and count shapes."""
    import pyarrow.dataset as pads

    path, texts = grep_corpus

    def _roundtrip(fn, *args, **kw):
        out = str(tmp_path / "out")
        man = fn(*args, output_path=out, **kw)
        assert man.column_names == ["path", "n_rows"]
        assert man["path"][0].as_py() == out
        tbl = pads.dataset(out).to_table()
        assert tbl.num_rows == man["n_rows"][0].as_py()
        return tbl

    for cap in (None, 0):
        base = grep_substring(grep_index, path, "return", fetch_cap=cap)
        got = _roundtrip(grep_substring, grep_index, path, "return",
                         fetch_cap=cap)
        assert got.select(base.column_names).equals(base)

        base = grep_lines(grep_index, path, "return", fetch_cap=cap)
        got = _roundtrip(grep_lines, grep_index, path, "return",
                         fetch_cap=cap)
        # streaming write sorts by (doc_id, line_no); line is carried
        assert got.sort_by([("doc_id", "ascending"),
                            ("line_no", "ascending")]).equals(base)

        base = grep_multi(grep_index, path, ["return", "def ", "zzzq"],
                          fetch_cap=cap)
        got = _roundtrip(grep_multi, grep_index, path,
                         ["return", "def ", "zzzq"], fetch_cap=cap)
        assert got.sort_by([("pattern", "ascending"),
                            ("doc_id", "ascending")]).equals(base)

        base = grep_count(grep_index, path, "return", fetch_cap=cap)
        got = _roundtrip(grep_count, grep_index, path, "return",
                         fetch_cap=cap)
        assert got.sort_by([("doc_id", "ascending")]).equals(base)

    # empty result still yields a typed file + zero-row manifest
    man = grep_substring(grep_index, path, "zzz_never_there",
                         output_path=str(tmp_path / "out"))
    assert man["n_rows"][0].as_py() == 0
    assert pads.dataset(str(tmp_path / "out")).to_table().num_rows == 0
    # all-provably-empty multi batch keeps the manifest contract too
    man = grep_multi(grep_index, path, ["zzzq_nope"],
                     output_path=str(tmp_path / "out"))
    assert man["n_rows"][0].as_py() == 0


def test_output_path_streaming_honors_tombstones(grep_corpus, tmp_path,
                                                 ray_session):
    """The streaming writer's per-block tombstone subtraction must
    match the driver path's post-hoc one."""
    import pyarrow.dataset as pads

    from hadoopsearchengine_ray.pipelines.grep import (
        delete_from_trigram_index,
    )

    path, texts = grep_corpus
    idx = str(tmp_path / "tri")
    build_trigram_index(path, idx, text_col="content", id_col="doc_id")
    alive = grep_substring(idx, path, "return")["doc_id"].to_pylist()
    assert len(alive) >= 3
    dead = alive[:2]
    delete_from_trigram_index(idx, dead)
    base = grep_substring(idx, path, "return")["doc_id"].to_pylist()
    assert not set(dead) & set(base)
    man = grep_substring(idx, path, "return",
                         output_path=str(tmp_path / "o"), fetch_cap=0)
    got = pads.dataset(str(tmp_path / "o")).to_table()
    assert got["doc_id"].to_pylist() == base
    assert man["n_rows"][0].as_py() == len(base)


def test_compact_trigram_index(grep_corpus, tmp_path, ray_session):
    """Compaction folds tombstones into the segments: same results,
    empty tombstone list, deleted docs gone from the postings
    themselves (not just plan-time subtracted)."""
    from hadoopsearchengine_ray.pipelines.grep import (
        compact_trigram_index,
        delete_from_trigram_index,
        maybe_compact_trigram_index,
    )

    path, texts = grep_corpus
    idx = str(tmp_path / "tri")
    build_trigram_index(path, idx, text_col="content", id_col="doc_id")
    with open(os.path.join(idx, "meta.json")) as f:
        assert json.load(f)["num_docs"] == N_DOCS

    alive = grep_substring(idx, path, "return")["doc_id"].to_pylist()
    dead = alive[:3]
    delete_from_trigram_index(idx, dead)
    want = grep_substring(idx, path, "return")["doc_id"].to_pylist()

    assert compact_trigram_index(idx) == 3
    assert not os.path.exists(os.path.join(idx, "tombstones.json"))
    t = TrigramIndex(idx)
    assert len(t.tombstones) == 0
    got = grep_substring(idx, path, "return")["doc_id"].to_pylist()
    assert got == want
    # the postings themselves no longer carry the deleted docs
    import pyarrow.dataset as pads  # noqa: F401
    for g, docs in t.postings(
            [int(x) for x in _pattern_grams(b"return")]).items():
        assert not set(dead) & set(docs.tolist())
    # regex/multi still healthy on the rewritten index
    assert grep_regex(idx, path, r"(return|yield) ") \
        ["doc_id"].to_pylist() == sorted(
            d for d, s in texts.items()
            if re.search(r"(return|yield) ", s) and d not in dead)
    # num_docs denominator shrank by the folded tombstones
    with open(os.path.join(idx, "meta.json")) as f:
        assert json.load(f)["num_docs"] == N_DOCS - 3
    # idempotent: nothing left to fold
    assert compact_trigram_index(idx) == 0
    # trigger: below the absolute floor it declines
    delete_from_trigram_index(idx, alive[3:4])
    assert not maybe_compact_trigram_index(idx, min_tombstones=10)
    assert maybe_compact_trigram_index(idx, frac=0.0, min_tombstones=1)
    assert not os.path.exists(os.path.join(idx, "tombstones.json"))


def test_compact_collapses_recovered_delta_dupes(grep_corpus, tmp_path,
                                                 ray_session):
    """A delta ingest re-run (the documented crash recovery) leaves
    duplicate segments; compaction must collapse them to single
    postings (delta-0 entries would poison assume_unique
    intersections)."""
    from hadoopsearchengine_ray.pipelines.grep import (
        add_to_trigram_index,
        compact_trigram_index,
        delete_from_trigram_index,
    )

    path, texts = grep_corpus
    import pyarrow.parquet as pq
    full = pq.read_table(path)
    base, delta = full.slice(0, 200), full.slice(200)
    bp, dp = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    pq.write_table(base, bp)
    pq.write_table(delta, dp)
    idx = str(tmp_path / "tri")
    build_trigram_index(bp, idx, text_col="content", id_col="doc_id")
    add_to_trigram_index(dp, idx)
    add_to_trigram_index(dp, idx)      # recovery re-run: dup segments
    delete_from_trigram_index(idx, [0])
    compact_trigram_index(idx)
    t = TrigramIndex(idx)
    posts = t.postings([int(x) for x in _pattern_grams(b"return")])
    for g, docs in posts.items():
        assert len(docs) == len(np.unique(docs)), g
    got = grep_substring(idx, path, "return")["doc_id"].to_pylist()
    assert got == sorted(d for d, s in texts.items()
                         if "return" in s and d != 0)


def test_compact_marker_recovery(grep_corpus, tmp_path, ray_session):
    """A crash between the postings renames leaves the marker (and the
    old dir): opens refuse loudly; re-running compaction recovers."""
    from hadoopsearchengine_ray.pipelines import grep as g

    path, texts = grep_corpus
    idx = str(tmp_path / "tri")
    build_trigram_index(path, idx, text_col="content", id_col="doc_id")
    g.delete_from_trigram_index(idx, [1, 2])
    want = grep_substring(idx, path, "return")["doc_id"].to_pylist()

    # simulate the worst crash point: after rename1 (postings gone)
    post = os.path.join(idx, "postings")
    os.replace(post, post + ".old")
    with open(os.path.join(idx, g._COMPACT_MARKER), "w") as f:
        f.write("crash\n")
    with pytest.raises(ValueError, match="compact_trigram_index"):
        TrigramIndex(idx)
    assert g.compact_trigram_index(idx) == 2
    got = grep_substring(idx, path, "return")["doc_id"].to_pylist()
    assert got == want


def test_casefold_regex_parity(tmp_path, ray_session):
    """grep_regex on a casefolded index == re.search over lower(text)
    (lowercase patterns give grep -i behavior), pruned-vs-streaming
    dispatch identical, non-ASCII case pairs included."""
    rows = {
        0: "Merge BATCH now",
        1: "merge batch later",
        2: "MERGE nothing",
        3: "unrelated text",
        4: "RÉSUMÉ merge Batch",
    }
    src = _write_docs(str(tmp_path / "cirx.parquet"), rows)
    ci = str(tmp_path / "ci")
    build_trigram_index(src, ci, text_col="content", id_col="doc_id",
                        casefold=True)
    import pyarrow.compute as pc
    lower = {d: pc.utf8_lower(pa.array([s]))[0].as_py()
             for d, s in rows.items()}
    for rx in [r"merge (batch|nothing)", r"résumé \w+",
               r"batch (now|later)", r"zzz(a|b)never"]:
        want = sorted(d for d, s in lower.items() if re.search(rx, s))
        assert grep_regex(ci, src, rx)["doc_id"].to_pylist() == want, rx
        assert grep_regex(ci, src, rx, fetch_cap=0)["doc_id"] \
            .to_pylist() == want, rx
    # caller-written (?i) is honored by verify (planned conservatively)
    assert grep_regex(ci, src, r"(?i)MeRgE BaTcH")["doc_id"] \
        .to_pylist() == [0, 1, 4]


def test_cli_rebuild_refuses_unstable_tombstones(tmp_path, ray_session,
                                                 capsys):
    """Rank-derived doc ids (no id column in the corpus) do NOT
    survive a rebuild — a carried tombstone could hide a different
    live doc.  The CLI must refuse the rebuild unless the user
    explicitly discards the tombstones with --drop-tombstones."""
    from hadoopsearchengine_ray.__main__ import main

    src = str(tmp_path / "raw.parquet")
    pq.write_table(pa.table({
        "path": ["a.py", "b.py", "c.py"],
        "content": ["alpha merge", "merge beta", "merge gamma"],
    }), src)
    idx = str(tmp_path / "rawidx")
    assert main(["grep", "--corpus", src, "--index", idx, "merge"]) == 0
    capsys.readouterr()
    assert main(["grep-delete", "--index", idx, "1"]) == 0
    capsys.readouterr()
    # corpus rewrite with a NEW doc sorting first: rank ids shift
    pq.write_table(pa.table({
        "path": ["0new.py", "a.py", "b.py", "c.py"],
        "content": ["merge zero", "alpha merge", "merge beta",
                    "merge gamma"],
    }), src)
    assert main(["grep", "--corpus", src, "--index", idx,
                 "merge"]) == 2
    err = capsys.readouterr().err
    assert "--drop-tombstones" in err
    # explicit discard: rebuild proceeds, ALL current docs match
    assert main(["grep", "--corpus", src, "--index", idx,
                 "--drop-tombstones", "merge"]) == 0
    rows = [json.loads(x) for x in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3]
