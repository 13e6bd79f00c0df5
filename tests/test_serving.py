"""Doc store / snippets / spell check / WavePass / query expansion."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from hadoopsearchengine_ray import corpus
from hadoopsearchengine_ray.functions.spellcheck import SpellIndex
from hadoopsearchengine_ray.pipelines.docstore import (
    DocStore,
    make_snippet,
    search_with_snippets,
    write_docstore,
)
from hadoopsearchengine_ray.pipelines.wavepass import (
    cluster_graph,
    wavepass,
    wavepass_oracle,
)


def test_docstore_roundtrip(tmp_path, t1_corpus_dir, t1_index_dir):
    from hadoopsearchengine_ray.stages.ingest import load_corpus, zip_with_index

    store = str(tmp_path / "store")
    ds = zip_with_index(load_corpus(t1_corpus_dir),
                        sort_keys=["repo", "path", "commit"])
    write_docstore(ds, store, range_size=128)  # force multiple partitions
    st = DocStore(store, range_size=128)
    got = st.fetch([0, 5, 599])
    assert got.num_rows == 3
    by_id = {r["doc_id"]: r for r in got.to_pylist()}
    assert by_id[5]["content"]
    assert by_id[599]["repo"].startswith("org")
    assert st.fetch([]).num_rows == 0


def test_search_with_snippets(tmp_path, t1_corpus_dir, t1_index_dir):
    from hadoopsearchengine_ray.stages.ingest import load_corpus, zip_with_index

    store = str(tmp_path / "store2")
    ds = zip_with_index(load_corpus(t1_corpus_dir),
                        sort_keys=["repo", "path", "commit"])
    write_docstore(ds, store)
    out = search_with_snippets(t1_index_dir, store, ["def", "return"], k=5)
    assert out.num_rows == 5
    rows = out.to_pylist()
    assert rows[0]["rank"] == 1 and rows[0]["score"] >= rows[-1]["score"]
    assert any("**" in r["snippet"] for r in rows)


def test_make_snippet_marks_terms():
    text = "alpha beta gamma " * 20 + "needle here omega " + "alpha beta " * 20
    s = make_snippet(text, ["needle", "omega"], window=60)
    assert "**needle**" in s and "**omega**" in s
    assert len(s) < len(text)
    # no hits -> head of doc
    s2 = make_snippet(text, ["zzz"], window=40)
    assert s2.startswith("alpha beta")


def test_spellcheck_suggestions(t1_index_dir):
    sp = SpellIndex.from_index_dir(t1_index_dir)
    # exact term passes through
    assert sp.suggest("def") == ["def"]
    # single-char typo of a very common term is corrected
    sug = sp.suggest("retorn")
    assert "return" in sug
    assert sp.correct_query(["retorn"]) == ["return"]
    # garbage stays put
    assert sp.correct_query(["qqqqqqqqqq"]) == ["qqqqqqqqqq"]


def test_wavepass_matches_oracle():
    links = corpus.links_table(200)
    gold = wavepass_oracle(links["src"].to_numpy(), links["dst"].to_numpy(),
                           links["weight"].to_numpy(), 200)
    got = wavepass(rd.from_arrow(links), 200)
    assert np.array_equal(got, gold)
    assert len(np.unique(gold)) > 1  # not collapsed into one class


def test_association_expansion():
    from hadoopsearchengine_ray.functions.text import association_map, expand_query

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array([
            "machine learning model training",
            "machine learning deep networks",
            "machine learning rocks",
            "unrelated words entirely",
        ]),
    }))
    assoc = association_map(docs, top_m=2)
    assert assoc["machine"][0] == "learning"
    expanded = expand_query(["machine"], assoc)
    assert expanded[0] == "machine" and "learning" in expanded
    # unknown term expands to itself only
    assert expand_query(["zzz"], assoc) == ["zzz"]


def test_cluster_graph_coarsens():
    links = corpus.links_table(400)
    maps = cluster_graph(rd.from_arrow(links), 400, target_nodes=50,
                         max_levels=5)
    assert maps, "no coarsening happened"
    n = 400
    for m in maps:
        assert len(m) == n
        n = int(m.max()) + 1
        assert n < len(m)
    assert n <= 400 // 2


def test_search_dedup_suppresses_duplicate_content(tmp_path):
    """Round-3 (D2): docs with identical token sequences collapse to the
    highest-ranked one in the final page; distinct docs all survive."""
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.pipelines.build_index import build_index
    from hadoopsearchengine_ray.pipelines.docstore import (
        search_dedup,
        search_with_snippets,
    )

    texts = ["needle alpha beta gamma"] * 3 + [
        f"needle delta{i} epsilon{i} zeta{i}" for i in range(5)
    ] + ["totally unrelated words"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    cp = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, cp)
    idx = str(tmp_path / "idx")
    store = str(tmp_path / "store")
    build_index(cp, idx, id_mode="column", text_col="text")
    write_docstore(rd.read_parquet(cp), store)

    out = search_dedup(idx, store, ["needle"], k=10, k_prime=20,
                       text_col="text").to_pandas()
    # 8 docs match "needle"; the 3 identical ones collapse to doc 0
    assert len(out) == 6
    assert 0 in set(out["doc_id"])
    assert not {1, 2} & set(out["doc_id"])
    assert list(out["rank"]) == list(range(1, 7))

    # snippet path with the flag on agrees on the surviving doc ids
    snip = search_with_snippets(idx, store, ["needle"], k=10,
                                drop_near_dups=True, k_prime=20,
                                text_col="text")
    assert snip.column("doc_id").to_pylist() == out["doc_id"].tolist()


def test_compact_docstore_in_place(tmp_path, t1_corpus_dir):
    """Store-side compaction: tombstoned rows physically gone, clean
    partitions' files untouched (byte-identical mtimes), idempotent."""
    import os

    from hadoopsearchengine_ray.pipelines.docstore import compact_docstore
    from hadoopsearchengine_ray.stages.ingest import load_corpus, zip_with_index

    store = str(tmp_path / "store")
    ds = zip_with_index(load_corpus(t1_corpus_dir),
                        sort_keys=["repo", "path", "commit"])
    write_docstore(ds, store, range_size=128)
    st = DocStore(store, range_size=128)
    n0 = sum(1 for _ in os.listdir(store))
    # tombstones only in partitions 0 and 1 (ids < 256)
    dead = [0, 5, 130, 131]
    mtimes_before = {}
    for part in os.listdir(store):
        if part in ("doc_range=0", "doc_range=1"):
            continue
        for f in os.listdir(os.path.join(store, part)):
            mtimes_before[f"{part}/{f}"] = os.path.getmtime(
                os.path.join(store, part, f))

    dropped = compact_docstore(store, dead, range_size=128)
    assert dropped == len(dead)
    assert st.fetch(dead).num_rows == 0
    alive = st.fetch([1, 129, 599])
    assert alive.num_rows == 3
    assert sum(1 for _ in os.listdir(store)) == n0   # no stray tmp/.old
    for key, mt in mtimes_before.items():
        part, f = key.split("/")
        assert os.path.getmtime(os.path.join(store, part, f)) == mt, key
    # idempotent: same tombstones again drop nothing
    assert compact_docstore(store, dead, range_size=128) == 0
    # crash recovery: park a partition at .old with no live dir
    os.rename(os.path.join(store, "doc_range=1"),
              os.path.join(store, "doc_range=1.old"))
    assert compact_docstore(store, [131], range_size=128) == 0
    assert st.fetch([129]).num_rows == 1


def test_autocomplete_and_facet_counts(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.functions.search import (
        autocomplete,
        facet_counts,
    )

    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [
            "cat cat cat dog",          # cf(cat)=3
            "cart cat dog",             # cf(cart)=1, cat+1
            "dog dog dog dog",
            "candle cart",              # cf(candle)=1, cart+1
        ],
        "lang": ["en", "fr", "en", "en"],
    }), path)

    top = autocomplete(path, "ca", n=10)
    assert list(top["term"]) == ["cat", "cart", "candle"]   # cf 4,2,1
    assert list(top["cf"]) == [4, 2, 1]
    assert list(top["rank"]) == [1, 2, 3]
    # no matches: typed empty frame, not a schema-less one
    none = autocomplete(path, "zz", n=5)
    assert list(none.columns) == ["rank", "term", "cf"] and none.empty

    fc = facet_counts(path, ["cat", "cart"], facet_col="lang")
    # docs matching cat or cart: 0,1,3 -> en:2, fr:1
    assert dict(zip(fc["lang"], fc["n_docs"])) == {"en": 2, "fr": 1}


def test_facet_topk_groups_and_ranks(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.functions.search import facet_topk

    path = str(tmp_path / "facet_docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": [
            "apple apple apple pad",   # en, tf=3
            "apple pad pad pad",       # en, tf=1
            "apple apple pad pad",     # fr, tf=2
            "pad pad pad pad",         # fr, no match
            "apple pie",               # fr, tf=1 but shortest doc
            "apple apple apple apple", # de, tf=4
        ],
        "lang": ["en", "en", "fr", "fr", "fr", "de"],
    }), path)
    out = facet_topk(path, ["apple"], facet_col="lang", k=2)
    # every matched facet appears, ranks restart per facet, k caps rows
    assert list(out.columns) == ["lang", "rank", "doc_id"]
    by = {(r.lang, r.rank): r.doc_id for r in out.itertuples()}
    assert by[("en", 1)] == 0 and by[("en", 2)] == 1
    assert by[("de", 1)] == 5
    # fr: doc 4 (tf=1, len 2) outscores doc 2 (tf=2, len 4)? BM25's
    # length normalization decides — just assert the unmatched doc 3
    # is absent and fr has exactly 2 rows
    fr = out[out.lang == "fr"]
    assert len(fr) == 2 and 3 not in set(fr.doc_id)


def test_more_like_this_returns_source_first(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.functions.search import more_like_this

    path = str(tmp_path / "mlt_docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": [
            "quartz granite quartz mineral",
            "granite mineral quartz quartz pebble",   # near-twin of doc 0
            "syntax parser token grammar compile",
            "unrelated prose about cooking dinner tonight",
        ],
    }), path)
    out = more_like_this(path, doc_id=0, m=3, k=4)
    # the source doc dominates its own keyword query; its twin follows
    assert out.iloc[0]["doc_id"] == 0
    assert out.iloc[1]["doc_id"] == 1
    assert 3 not in set(out["doc_id"])

    import pytest as _pytest
    with _pytest.raises(KeyError):
        more_like_this(path, doc_id=99)


def test_facet_ops_keep_null_group(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.functions.search import (
        facet_counts,
        facet_topk,
    )

    path = str(tmp_path / "nullfacet.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["cat dog", "cat bird", "cat fish", "nothing here"],
        "lang": ["en", None, "fr", "en"],
    }), path)
    fc = facet_counts(path, ["cat"], facet_col="lang")
    # SQL GROUP BY keeps the NULL group; NULLS LAST ordering
    assert list(fc["n_docs"]) == [1, 1, 1]
    assert list(fc["lang"])[:2] == ["en", "fr"] and pd.isna(fc["lang"].iloc[2])
    ft = facet_topk(path, ["cat"], facet_col="lang", k=2)
    assert 1 in set(ft["doc_id"])          # the NULL-lang doc survives
    assert len(ft) == 3


def test_search_snippets_table_serving_path(tmp_path, ray_session):
    import os

    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.functions.search import (
        bm25_topk_table,
        search_snippets_table,
        store_for,
    )

    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [
            "merge sort beats bubble sort on big arrays",
            "window functions partition then order rows",
            "spark window merge combine",      # matches all three terms
            "nothing relevant whatsoever here",
        ],
    }), path)

    out = search_snippets_table(path, ["spark", "window", "merge"], k=3)
    ranks = bm25_topk_table(path, ["spark", "window", "merge"], k=3)
    # identical ranking to the plain scorer, every row has a snippet
    assert out["doc_id"].tolist() == ranks["doc_id"].tolist()
    assert out["rank"].tolist() == ranks["rank"].tolist()
    assert out["snippet_nonempty"].all()
    assert out["doc_id"].iloc[0] == 2          # the 3-term doc ranks first

    # store reuse: the _DONE sentinel makes the second call a no-op
    d1 = store_for(path)
    assert os.path.exists(os.path.join(d1, "_DONE"))
    assert store_for(path) == d1


def test_store_for_invalidates_on_rewrite(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.functions.search import store_for
    from hadoopsearchengine_ray.pipelines.docstore import DocStore

    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["original zero", "original one"],
    }), path)
    d1 = store_for(path)
    assert DocStore(d1).fetch([0]).to_pylist()[0]["text"] == "original zero"

    # in-place rewrite: the lineage-bearing sentinel must force a rebuild
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["rewritten zero!!", "rewritten one!!"],
    }), path)
    d2 = store_for(path)
    assert d2 == d1
    assert DocStore(d2).fetch([0]).to_pylist()[0]["text"] == "rewritten zero!!"


def test_within_distance_complete(t1_index_dir, t1_oracle):
    """within_distance(w, 1) must return EXACTLY the dictionary terms
    at plain Levenshtein distance <= 1 — brute-forced over the whole
    vocabulary for in-vocab words, 1-edit misspellings, and misses."""
    from hadoopsearchengine_ray.functions.spellcheck import (
        SpellIndex,
        _edit_distance_le,
    )

    idx, _ = t1_oracle
    vocab = sorted(idx.postings)
    sp = SpellIndex.from_index_dir(t1_index_dir)
    probes = vocab[0:20:4]                       # in-vocab
    probes += [w[:-1] for w in vocab[1:21:4] if len(w) > 2]   # deletion
    probes += [w + "q" for w in vocab[2:22:4]]   # insertion
    probes += ["x" + w[1:] for w in vocab[3:23:4]]  # substitution
    probes += ["zzzzzzz"]                        # no match
    for w in probes:
        want = sorted(t for t in vocab
                      if _edit_distance_le(w, t, 1) <= 1)
        assert sp.within_distance(w, 1) == want, w
    import pytest
    with pytest.raises(ValueError):
        sp.within_distance("abc", 2)


def test_spell_cache_lineage(tmp_path, ray_session, monkeypatch):
    """_spell_for reuses the deletion index while the dictionary is
    unchanged and rebuilds when the index is rebuilt in place."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.functions import search

    monkeypatch.setattr(search, "CACHE_ROOT", str(tmp_path / "cache"))
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["alpha merge window", "beta merge spark"]),
    }), src)
    idx = search.index_for(src)
    s1 = search._spell_for(idx)
    assert search._spell_for(idx) is s1          # cache hit
    assert "merge" in s1.within_distance("merg", 1)
    # rewrite the corpus -> index_for rebuilds -> spell must follow
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["gamma scan window", "delta scan spark"]),
    }), src)
    idx2 = search.index_for(src)
    s2 = search._spell_for(idx2)
    assert s2 is not s1
    assert s2.within_distance("merg", 1) == []
    assert "scan" in s2.within_distance("scam", 1)


def test_facet_topk_pool_path_matches_small_path(tmp_path, ray_session):
    """driver_merge_threshold=0 forces the distributed pool path
    (range-owner scoring + per-owner facet heads); results must be
    row-identical to the small driver path — including the NULL facet
    group and cross-range tie-breaks."""
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.functions.search import facet_topk

    rng = np.random.default_rng(7)
    n = 120
    langs = [None, "en", "fr", "de", "pt"]
    texts = []
    for i in range(n):
        words = ["apple"] * int(rng.integers(0, 4)) + \
                ["pad"] * int(rng.integers(1, 9)) + [f"u{i}"]
        rng.shuffle(words)
        texts.append(" ".join(words))
    path = str(tmp_path / "facet_pool.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": texts,
        "lang": pa.array([langs[i % len(langs)] for i in range(n)],
                         pa.string()),
    }), path)
    small = facet_topk(path, ["apple"], facet_col="lang", k=3)
    big = facet_topk(path, ["apple"], facet_col="lang", k=3,
                     driver_merge_threshold=0)
    pd.testing.assert_frame_equal(
        small.reset_index(drop=True), big.reset_index(drop=True))
    # the NULL group survives both paths
    assert small["lang"].isna().any() and big["lang"].isna().any()


def test_facet_topk_big_path_builds_no_driver_scorer(tmp_path,
                                                     ray_session,
                                                     monkeypatch):
    """The big path exists to keep the driver bounded: it must not
    construct a driver-side BM25Scorer (whose reader materializes the
    O(num_docs) doclen array + full dictionary) — the dispatch bound
    comes from a term-pruned read of the dictionary's df column, and
    scoring happens inside the range-pool owners."""
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.functions import search

    path = str(tmp_path / "facet_noscorer.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "text": [f"apple pad u{i}" for i in range(12)],
        "lang": ["en", "fr"] * 6,
    }), path)
    search.facet_topk(path, ["apple"], facet_col="lang", k=2)  # build

    def _boom(*a, **kw):
        raise AssertionError("driver-side BM25Scorer on the big path")

    monkeypatch.setattr(search, "BM25Scorer", _boom)
    out = search.facet_topk(path, ["apple"], facet_col="lang", k=2,
                            driver_merge_threshold=0)
    assert set(out["lang"]) == {"en", "fr"}
    with pytest.raises(AssertionError):
        # the small path still uses the scorer — the patch proves the
        # big path's independence, not a dead code path
        search.facet_topk(path, ["apple"], facet_col="lang", k=2)


def test_facet_topk_reuses_caller_pool(tmp_path, ray_session):
    """A warm caller-owned pool (a serving daemon's) is used as-is:
    same answer, and the pool stays alive afterwards."""
    import pyarrow.parquet as pq
    import ray

    from hadoopsearchengine_ray.functions.search import (
        facet_topk,
        index_for,
    )
    from hadoopsearchengine_ray.pipelines.pool import (
        RangePartitionedPool,
    )

    path = str(tmp_path / "facet_pool_reuse.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": [f"apple pad u{i}" for i in range(10)],
        "lang": ["en", "fr"] * 5,
    }), path)
    cold = facet_topk(path, ["apple"], facet_col="lang", k=2)
    pool = RangePartitionedPool(index_for(path), num_ranges=2)
    try:
        warm = facet_topk(path, ["apple"], facet_col="lang", k=2,
                          driver_merge_threshold=0, pool=pool)
        pd.testing.assert_frame_equal(cold.reset_index(drop=True),
                                      warm.reset_index(drop=True))
        # pool not shut down by the call
        d, _ = pool.score_after(["apple"], 1)
        assert len(d) == 1
    finally:
        pool.shutdown()
