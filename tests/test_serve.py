"""Persistent serving daemon (pipelines/serve.py): warm pools behind
one dispatcher, NDJSON loop, CLI wiring."""

import io
import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoopsearchengine_ray.pipelines.serve import (
    SearchServer,
    serve_http,
    serve_loop,
)


@pytest.fixture(scope="module")
def serve_env(tmp_path_factory, ray_session):
    """documents-style table + main index + trigram index + ANN index,
    all tiny, plus the ground-truth text map."""
    from hadoopsearchengine_ray.functions.search import index_for
    from hadoopsearchengine_ray.pipelines.ann import build_ann_index
    from hadoopsearchengine_ray.pipelines.grep import build_trigram_index

    d = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(11)
    n = 90
    langs = ["en", "fr", None]
    texts = []
    for i in range(n):
        words = (["spark"] * int(rng.integers(0, 3))
                 + ["merge"] * int(rng.integers(0, 3))
                 + ["window", "batch", f"u{i}"]
                 + ["pad"] * int(rng.integers(1, 6)))
        rng.shuffle(words)
        texts.append(" ".join(words))
    docs = str(d / "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": texts,
        "lang": pa.array([langs[i % 3] for i in range(n)], pa.string()),
    }), docs)
    index_dir = index_for(docs)

    tri = str(d / "tri")
    build_trigram_index(docs, tri, text_col="text", id_col="doc_id")

    m = rng.standard_normal((n, 32))
    emb = str(d / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float32())),
    }), emb)
    ann = str(d / "ann")
    build_ann_index(emb, ann, num_lists=4, m=8, ksub=16, dim=32)

    server = SearchServer(index_dir, corpus_path=docs, grep_index=tri,
                          ann_index=ann, num_ranges=3)
    yield {"server": server, "docs": docs, "index": index_dir,
           "texts": texts, "emb_matrix": m, "ann": ann}
    server.close()


def test_serve_search_matches_scorer(serve_env):
    """search/query/cursor ops agree with the cold-path scorers —
    the daemon adds warmth, not different answers."""
    from hadoopsearchengine_ray.pipelines.query import BM25Scorer

    srv = serve_env["server"]
    sc = BM25Scorer(serve_env["index"])

    r = srv.handle({"op": "search", "terms": ["spark", "merge"],
                    "k": 10, "id": 7})
    assert r["ok"] and r["id"] == 7
    d, s = sc.score_exact(["spark", "merge"], 10)
    assert [h["doc_id"] for h in r["hits"]] == [int(x) for x in d]
    assert [h["score"] for h in r["hits"]] == [float(x) for x in s]

    # cursor paging: page2 via next_after == ranks k+1..2k of one
    # deep dense pass
    p2 = srv.handle({"op": "search", "terms": ["spark", "merge"],
                     "k": 10, "after": r["next_after"]})
    deep_d, _ = sc.score_exact(["spark", "merge"], 20)
    assert [h["doc_id"] for h in p2["hits"]] == \
        [int(x) for x in deep_d[10:20]]

    rq = srv.handle({"op": "query", "q": "merge^2 +window", "k": 5})
    qd, qs = sc.score_query("merge^2 +window", 5)
    assert [h["doc_id"] for h in rq["hits"]] == [int(x) for x in qd]

    # LM-Dirichlet op: same warm pool, second ranking family
    rl = srv.handle({"op": "lm", "terms": ["spark", "merge"], "k": 10})
    ld, ls = sc.score_lm(["spark", "merge"], 10)
    assert rl["ok"]
    assert [h["doc_id"] for h in rl["hits"]] == [int(x) for x in ld]
    assert [h["score"] for h in rl["hits"]] == [float(x) for x in ls]


def test_serve_phrase_near_facets_spell(serve_env):
    srv = serve_env["server"]
    texts = serve_env["texts"]

    r = srv.handle({"op": "phrase", "terms": ["window", "batch"]})
    want = sorted(i for i, t in enumerate(texts)
                  if "window batch" in t)
    assert [row["doc_id"] for row in r["rows"]] == want
    assert r["total"] == len(want)

    r = srv.handle({"op": "near", "a": "spark", "b": "merge",
                    "slop": 2, "limit": 5})
    assert r["ok"] and len(r["rows"]) <= 5 and r["total"] >= len(r["rows"])

    r = srv.handle({"op": "facets", "terms": ["spark"], "k": 2,
                    "facet_col": "lang"})
    assert r["ok"]
    facets = {row["facet"] for row in r["rows"]}
    assert None in facets and "en" in facets
    per = {}
    for row in r["rows"]:
        per.setdefault(row["facet"], []).append(row["score"])
    for scores in per.values():
        assert len(scores) <= 2 and scores == sorted(scores,
                                                     reverse=True)

    r = srv.handle({"op": "spell", "term": "windoq"})
    assert r["ok"] and "window" in r["suggestions"]


def test_serve_ann_and_grep(serve_env):
    from hadoopsearchengine_ray.pipelines.ann import AnnIndex

    srv = serve_env["server"]
    m = serve_env["emb_matrix"]

    r = srv.handle({"op": "ann", "vectors": m[3].tolist(), "k": 5,
                    "nprobe": 4})
    assert r["ok"] and len(r["results"]) == 1
    base = AnnIndex(serve_env["ann"]).query(m[3:4], k=5, nprobe=4)
    assert [h["vec_id"] for h in r["results"][0]] == \
        list(base.sort_values("rank")["vec_id"])

    texts = serve_env["texts"]
    r = srv.handle({"op": "grep", "pattern": "window batch",
                    "mode": "docs", "limit": 3})
    want = sorted(i for i, t in enumerate(texts) if "window batch" in t)
    assert r["total"] == len(want)
    assert [row["doc_id"] for row in r["rows"]] == want[:3]
    r = srv.handle({"op": "grep", "pattern": "window batch",
                    "mode": "count", "limit": None})
    assert {row["doc_id"]: row["n_matches"] for row in r["rows"]} == \
        {i: texts[i].count("window batch") for i in want}


def test_serve_errors_do_not_kill(serve_env):
    srv = serve_env["server"]
    r = srv.handle({"op": "definitely_not_an_op"})
    assert not r["ok"] and "unknown op" in r["error"]
    r = srv.handle({"no_op_at_all": 1})
    assert not r["ok"]
    r = srv.handle({"op": "grep", "mode": "docs"})   # missing pattern
    assert not r["ok"] and "KeyError" in r["error"]
    # still alive
    assert srv.handle({"op": "ping"})["ok"]
    st = srv.handle({"op": "stats"})
    assert st["ok"] and st["num_docs"] == 90 and st["num_ranges"] == 3
    assert st["n_requests"] >= 5


def test_serve_requires_configured_backends(tmp_path, serve_env):
    """Ops needing unconfigured state fail per-request, loudly."""
    srv = SearchServer(serve_env["index"])     # bare: pool only
    try:
        assert srv.handle({"op": "search", "terms": ["spark"],
                           "k": 3})["ok"]
        r = srv.handle({"op": "ann", "vectors": [0.0] * 32})
        assert not r["ok"] and "ann_index" in r["error"]
        r = srv.handle({"op": "grep", "pattern": "x"})
        assert not r["ok"] and "grep_index" in r["error"]
        r = srv.handle({"op": "facets", "terms": ["spark"]})
        assert not r["ok"] and "corpus_path" in r["error"]
    finally:
        srv.close()


def test_serve_loop_ndjson(serve_env):
    srv = serve_env["server"]
    fin = io.StringIO("\n".join([
        json.dumps({"op": "ping", "id": 1}),
        "",                                   # blank: skipped
        "{not json",                          # error response, keep going
        json.dumps({"op": "search", "terms": ["spark"], "k": 3,
                    "id": 2}),
        json.dumps({"op": "shutdown", "id": 3}),
        json.dumps({"op": "ping", "id": 99}),  # after shutdown: unread
    ]) + "\n")
    fout = io.StringIO()
    served = serve_loop(srv, fin, fout)
    lines = [json.loads(x) for x in fout.getvalue().splitlines()]
    assert served == 4 and len(lines) == 4
    assert lines[0] == {"id": 1, "ok": True, "pong": True}
    assert not lines[1]["ok"] and "bad json" in lines[1]["error"]
    assert lines[2]["ok"] and lines[2]["id"] == 2 and lines[2]["hits"]
    assert lines[3] == {"ok": True, "bye": True, "id": 3}


def test_cli_serve_roundtrip(serve_env, monkeypatch, capsys):
    """The serve subcommand wires argv -> SearchServer -> loop."""
    import sys

    from hadoopsearchengine_ray.__main__ import main

    monkeypatch.setattr(sys, "stdin", io.StringIO(
        json.dumps({"op": "search", "terms": ["merge"], "k": 3}) + "\n"
        + json.dumps({"op": "shutdown"}) + "\n"))
    rc = main(["serve", "--index", serve_env["index"],
               "--corpus", serve_env["docs"],
               "--grep-index", serve_env["server"].grep_index,
               "--num-ranges", "2"])
    assert rc == 0
    out = [json.loads(x)
           for x in capsys.readouterr().out.strip().splitlines()]
    assert out[0]["ok"] and len(out[0]["hits"]) == 3
    assert out[1] == {"ok": True, "bye": True}


def test_serve_http_roundtrip(serve_env, monkeypatch):
    """HTTP front: POST JSON == handle(), GET /ping, malformed body is
    a 400 (not a dead daemon), op failures are 500 (retryable, unlike
    shape errors), connections are one-request (no keep-alive parking
    the single-threaded server), shutdown stops the listener."""
    import threading
    import urllib.error
    import urllib.request

    srv = serve_env["server"]
    srv.shutdown_requested = False   # earlier loop tests may leave it set
    httpd = serve_http(srv, port=0)
    base = "http://%s:%d" % httpd.server_address
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def post(obj=None, raw=None):
            data = raw if raw is not None else json.dumps(obj).encode()
            return urllib.request.urlopen(
                urllib.request.Request(base + "/", data=data), timeout=30)

        with post({"op": "search", "terms": ["spark", "merge"],
                   "k": 5, "id": 3}) as resp:
            assert resp.status == 200
            # single-threaded server: every reply must close the
            # connection, or a keep-alive client parks accept()
            assert resp.headers.get("Connection") == "close"
            body = json.loads(resp.read())
        ref = srv.handle({"op": "search",
                          "terms": ["spark", "merge"], "k": 5})
        assert body["ok"] and body["id"] == 3
        assert body["hits"] == ref["hits"]

        with urllib.request.urlopen(base + "/ping", timeout=30) as resp:
            assert json.loads(resp.read()) == {"ok": True, "pong": True}

        with pytest.raises(urllib.error.HTTPError) as ei:
            post(raw=b"{not json")
        assert ei.value.code == 400
        assert "bad json" in json.loads(ei.value.read())["error"]
        with pytest.raises(urllib.error.HTTPError) as ei:
            post({"op": "nope"})        # shape error: don't-retry 400
        assert ei.value.code == 400
        assert json.loads(ei.value.read())["bad_request"]

        # a server-side op failure (dead actor, bug) must surface as a
        # retryable 500, not blame the well-formed request with a 400
        def boom(self, req):
            raise RuntimeError("actor died")
        monkeypatch.setitem(type(srv)._OPS, "stats", boom)
        with pytest.raises(urllib.error.HTTPError) as ei:
            post({"op": "stats"})
        assert ei.value.code == 500
        err = json.loads(ei.value.read())
        assert "actor died" in err["error"] and "bad_request" not in err

        # still alive after the errors, then shutdown ends the loop
        with post({"op": "ping"}) as resp:
            assert json.loads(resp.read())["ok"]
        with post({"op": "shutdown"}) as resp:
            assert json.loads(resp.read())["bye"]
        t.join(timeout=30)
        assert not t.is_alive()
        # served-count mirrors serve_loop: every POST, including the
        # malformed and failed ones (6 here), not handle() internals
        assert httpd.n_served == 6
    finally:
        httpd.shutdown() if t.is_alive() else None
        httpd.server_close()
        srv.shutdown_requested = False     # module-scoped fixture


def test_cli_serve_http_wiring(serve_env, monkeypatch, capsys):
    """`serve --http PORT` builds the HTTP front (not the NDJSON loop)
    and prints the bound address on the ready line."""
    from hadoopsearchengine_ray import __main__ as cli

    calls = {}

    class FakeHTTPd:
        server_address = ("127.0.0.1", 45678)
        n_served = 0

        def serve_forever(self):
            calls["served"] = True

        def server_close(self):
            calls["closed"] = True

    def fake_serve_http(server, host="127.0.0.1", port=0):
        calls["port"] = port
        return FakeHTTPd()

    import hadoopsearchengine_ray.pipelines.serve as serve_mod
    monkeypatch.setattr(serve_mod, "serve_http", fake_serve_http)
    rc = cli.main(["serve", "--index", serve_env["index"],
                   "--num-ranges", "2", "--http", "0"])
    assert rc == 0
    assert calls == {"port": 0, "served": True, "closed": True}
    err = capsys.readouterr().err
    ready = json.loads(err.strip().splitlines()[0])
    assert ready["ready"] and ready["http"] == "http://127.0.0.1:45678/"


def test_handle_serves_shutdown_for_any_transport(serve_env):
    """shutdown is part of the documented protocol, so it must work
    through handle() itself (an HTTP/socket front wraps handle(), not
    serve_loop) — the old code only special-cased it in serve_loop."""
    srv = serve_env["server"]
    try:
        r = srv.handle({"op": "shutdown", "id": 42})
        assert r == {"id": 42, "ok": True, "bye": True}
        assert srv.shutdown_requested
        # the flag is advisory for the transport; the dispatcher keeps
        # answering (close() is the owner's call)
        assert srv.handle({"op": "ping"})["ok"]
    finally:
        srv.shutdown_requested = False


def test_search_k0_returns_empty_page(serve_env):
    """k=0 must be an empty page, not an IndexError minting the cursor
    (len(hits) == k is true for 0 == 0)."""
    r = serve_env["server"].handle(
        {"op": "search", "terms": ["merge"], "k": 0})
    assert r["ok"] and r["hits"] == [] and "next_after" not in r


def test_failed_constructor_reaps_pool_actors(serve_env, tmp_path):
    """If a later init step raises (bad grep index), the
    already-spawned range-pool actors must be shut down — the caller
    has no handle to close()."""
    import ray

    from hadoopsearchengine_ray.pipelines import pool as pool_mod

    spawned = []
    orig = pool_mod.RangePartitionedPool

    class Spy(orig):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            spawned.append(self)

    pool_mod.RangePartitionedPool, bak = Spy, orig
    try:
        with pytest.raises(Exception):
            SearchServer(serve_env["index"],
                         grep_index=str(tmp_path / "not_an_index"))
    finally:
        pool_mod.RangePartitionedPool = bak
    assert len(spawned) == 1
    # every actor of the failed server was killed: a real remote call
    # on a dead actor raises RayActorError (on a leaked live actor it
    # would return an empty page and the test fails)
    for a in spawned[0].actors:
        with pytest.raises(ray.exceptions.RayActorError):
            ray.get(a.score_after.remote(["merge"], 1, None, -1))


def test_serve_nrt_ingest_and_delete(tmp_path_factory, ray_session):
    """Live index mutation through the daemon: ingest makes new docs
    searchable (scored exactly as a rebuild), delete removes docs AND
    shifts the BM25 statistics; the pool refresh is atomic per request
    and a daemon (re)start over the mutated index serves it correctly."""
    from hadoopsearchengine_ray.pipelines.build_index import build_index
    from hadoopsearchengine_ray.pipelines.delta import merged_scorer

    from tests.conftest import doc_id_table as _doc_table

    d = tmp_path_factory.mktemp("serve_nrt")
    mainp, newp = str(d / "main.parquet"), str(d / "new.parquet")
    pq.write_table(_doc_table(0, 150), mainp)
    pq.write_table(_doc_table(150, 190), newp)
    idx = str(d / "idx")
    build_index(mainp, idx, id_mode="column", text_col="text")

    srv = SearchServer(idx, corpus_path=mainp, num_ranges=3)
    try:
        base = srv.handle({"op": "stats"})
        assert base["num_deltas"] == 0 and base["num_tombstones"] == 0

        r = srv.handle({"op": "ingest", "corpus": newp})
        assert r["ok"] and r["num_deltas"] == 1
        r = srv.handle({"op": "search", "terms": ["def", "return"],
                        "k": 190})
        got = {h["doc_id"] for h in r["hits"]}
        assert any(i >= 150 for i in got)   # delta docs searchable

        dels = [i for i in range(190) if i % 13 == 0]
        r = srv.handle({"op": "delete", "doc_ids": dels})
        assert r["ok"] and r["num_tombstones"] == len(dels)
        r = srv.handle({"op": "search", "terms": ["def", "return"],
                        "k": 10})
        ms = merged_scorer(idx)
        dm, sm = ms.score(["def", "return"], 10)
        assert [h["doc_id"] for h in r["hits"]] == [int(x) for x in dm]
        assert [h["score"] for h in r["hits"]] == [float(x) for x in sm]
        assert not {h["doc_id"] for h in r["hits"]} & set(dels)
        st = srv.handle({"op": "stats"})
        assert st["num_deltas"] == 1
        assert st["num_tombstones"] == len(dels)

        # a failed mutation must leave the serving pool intact
        bad = srv.handle({"op": "ingest", "corpus": str(d / "nope.pq")})
        assert not bad["ok"]
        r2 = srv.handle({"op": "search", "terms": ["def", "return"],
                         "k": 10})
        assert r2["hits"] == r["hits"]
    finally:
        srv.close()

    # restart: a NEW daemon over the mutated index serves the same
    # generation from request 1 (no silent pre-update answers)
    srv2 = SearchServer(idx, corpus_path=mainp, num_ranges=2)
    try:
        r3 = srv2.handle({"op": "search", "terms": ["def", "return"],
                          "k": 10})
        assert r3["hits"] == r["hits"]
    finally:
        srv2.close()


def test_serve_delete_without_corpus_is_loud(tmp_path_factory,
                                             ray_session):
    """delete on a daemon started without corpus_path fails BEFORE
    writing tombstones (a tombstone the pool can't serve would wedge
    every later refresh)."""
    from hadoopsearchengine_ray.pipelines.build_index import build_index
    from hadoopsearchengine_ray.pipelines.delta import load_tombstones

    from tests.conftest import doc_id_table as _doc_table

    d = tmp_path_factory.mktemp("serve_del_nc")
    mainp = str(d / "main.parquet")
    pq.write_table(_doc_table(0, 60), mainp)
    idx = str(d / "idx")
    build_index(mainp, idx, id_mode="column", text_col="text")
    srv = SearchServer(idx, num_ranges=2)
    try:
        r = srv.handle({"op": "delete", "doc_ids": [3]})
        assert not r["ok"] and "corpus_path" in r["error"]
        assert load_tombstones(idx) == set()
        assert srv.handle({"op": "ping"})["ok"]
    finally:
        srv.close()


def test_serve_nrt_cursor_and_stats_generation(tmp_path_factory,
                                               ray_session):
    """A cursor minted before an ingest/delete is rejected as stale
    (scores shift with the statistics — comparing the old floats would
    silently drop/duplicate docs across pages), and stats reports the
    LIVE corpus (deltas counted, tombstones subtracted)."""
    from hadoopsearchengine_ray.pipelines.build_index import build_index
    from hadoopsearchengine_ray.pipelines.delta import merged_scorer

    from tests.conftest import doc_id_table as _doc_table

    d = tmp_path_factory.mktemp("serve_gen")
    mainp, newp = str(d / "main.parquet"), str(d / "new.parquet")
    pq.write_table(_doc_table(0, 120), mainp)
    pq.write_table(_doc_table(120, 150), newp)
    idx = str(d / "idx")
    build_index(mainp, idx, id_mode="column", text_col="text")
    srv = SearchServer(idx, corpus_path=mainp, num_ranges=2)
    try:
        st0 = srv.handle({"op": "stats"})
        assert st0["num_docs"] == 120
        p1 = srv.handle({"op": "search", "terms": ["def", "return"],
                         "k": 5})
        cur = p1["next_after"]
        assert len(cur) == 3                       # score, doc, gen
        # same generation: paging works
        assert srv.handle({"op": "search", "terms": ["def", "return"],
                           "k": 5, "after": cur})["ok"]

        assert srv.handle({"op": "ingest", "corpus": newp})["ok"]
        stale = srv.handle({"op": "search", "terms": ["def", "return"],
                            "k": 5, "after": cur})
        assert not stale["ok"] and "stale cursor" in stale["error"]
        assert stale.get("bad_request")

        st1 = srv.handle({"op": "stats"})
        assert st1["num_docs"] == 150
        assert st1["generation"] != st0["generation"]

        assert srv.handle({"op": "delete", "doc_ids": [0, 130]})["ok"]
        st2 = srv.handle({"op": "stats"})
        assert st2["num_docs"] == 148
        ms = merged_scorer(idx)
        assert st2["avgdl"] == ms.rd.avgdl      # live == lazy, bitwise

        # out-of-range delete: rejected BEFORE any mutation
        r = srv.handle({"op": "delete", "doc_ids": [10**9]})
        assert not r["ok"] and "doc-id space" in r["error"]
        assert srv.handle({"op": "stats"})["num_tombstones"] == 2

        # refresh failure rolls the tombstone file back
        from hadoopsearchengine_ray.pipelines.delta import load_tombstones

        real_refresh = srv._refresh_pool
        srv._refresh_pool = lambda: (_ for _ in ()).throw(
            RuntimeError("boom"))
        r = srv.handle({"op": "delete", "doc_ids": [7]})
        assert not r["ok"] and "boom" in r["error"]
        assert load_tombstones(idx) == {0, 130}
        srv._refresh_pool = real_refresh
        assert srv.handle({"op": "search", "terms": ["def"],
                           "k": 3})["ok"]
    finally:
        srv.close()


def test_serve_explain_matches_scorer(serve_env):
    from hadoopsearchengine_ray.pipelines.query import BM25Scorer

    srv = serve_env["server"]
    sc = BM25Scorer(serve_env["index"])
    d, s = sc.score_exact(["spark", "merge"], 3)
    r = srv.handle({"op": "explain", "terms": ["spark", "merge"],
                    "doc_id": int(d[0])})
    assert r["ok"] and r["total"] == float(s[0])
    assert any(p["matched"] for p in r["parts"])
    bad = srv.handle({"op": "explain", "terms": ["spark"],
                      "doc_id": 10**9})
    assert not bad["ok"] and bad["bad_request"]
