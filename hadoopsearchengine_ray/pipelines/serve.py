"""Persistent serving daemon: warm pools behind a request loop.

The reference's front-end is a LONG-LIVED process fleet — CGI query
servers that keep their lexicon/posting state resident across requests
and register with a name server
(/root/reference/DyableRequest/DyableQuery/DyableQuery.cpp:70-100,
/root/reference/DyableRequest/Query.cpp:137-171,
/root/reference/DyableRequest/NameServer.h).  Every warm-state
component of this repo (``RangePartitionedPool`` doc-range scorer
actors, ``AnnPool`` list owners, the trigram grep index, the SymSpell
lexicon) already exists; this module is the missing front door that
keeps them ALIVE across requests, so the measured pool latencies
(sub-ms BM25, ~13 ms ANN) are what a user actually gets — instead of
paying Ray init + pool construction per invocation as the one-shot CLI
subcommands do.

Shape: ``SearchServer`` pins the pools once in ``__init__`` (the actor
fleet is the cluster-resident state; the driver object is just
handles), ``handle()`` dispatches one JSON-dict request to the right
pool method, and two transports wrap it: ``serve_loop`` runs NDJSON
over stdin/stdout — one request per line in, one response per line
out — and ``serve_http`` serves the same dict protocol as ``POST /``
JSON bodies (the reference's actual transport: its query tier is CGI
behind an HTTP daemon).  The line protocol stays the default because
it is sandbox-friendly (no sockets); both fronts share ``handle()``
so they cannot diverge.  Errors are per-request
(``{"ok": false, "error": ...}``) — a bad request must never take the
daemon down.

Request reference (all fields besides ``op`` optional unless noted)::

    {"op": "search", "terms": [...], "k": 10}
    {"op": "search", "terms": [...], "k": 10,
     "after": [score, doc_id, generation]}  # cursor from a prior page
       # pass next_after back VERBATIM; a cursor minted before an
       # ingest/delete is rejected as stale (scores shifted)
    {"op": "query", "q": "merge^2 +window -dup s*", "k": 10}
       # also: '"hash table"' quoted-phrase and near(a,b,N) /
       # onear(a,b,N) proximity predicates (positional, range-local)
    {"op": "lm", "terms": [...], "k": 10, "mu": 2000}
       # LM-Dirichlet ranking: plain term list only (no query syntax)
    {"op": "explain", "terms": [...], "doc_id": 42}
       # per-term BM25 breakdown for one doc (total == dense score)
    {"op": "phrase", "terms": ["slow", "hash", "batch"], "limit": 100}
    {"op": "near", "a": "spark", "b": "merge", "slop": 3,
     "ordered": false, "limit": 100}
    {"op": "facets", "terms": [...], "k": 3, "facet_col": "lang"}
    {"op": "ann", "vectors": [[...], ...], "k": 10, "nprobe": 12}
    {"op": "spell", "term": "windoq", "max_suggestions": 5}
    {"op": "grep", "pattern": "for(", "mode": "docs", "limit": 100}
       # mode: docs | count | lines | regex; "output_path" spills the
       # full match set to parquet instead of returning rows
    {"op": "ingest", "corpus": "/path/new.parquet",
     "text_col": "text", "id_col": "doc_id"}
       # near-real-time indexing: delta-build the new docs (ids must be
       # disjoint above the served space) and refresh the pool — later
       # searches see them, scored exactly as a full rebuild would
    {"op": "delete", "doc_ids": [3, 17]}
       # tombstone + refresh: deleted docs leave results AND the BM25
       # statistics (exact N/avgdl/df correction; needs corpus_path)
    {"op": "stats"} | {"op": "ping"} | {"op": "shutdown"}

Cursor contract (mirrors ``RangePartitionedPool.score_after``): page 1
is ``search`` WITH NO ``after`` (the server routes it through the
dense ``score_after`` pass so its floats are cursor-safe); the next
page's ``after`` is the last hit of the previous page, verbatim.
"""

from __future__ import annotations

import json
import sys
import time


def _hits(docs, scores) -> list[dict]:
    return [{"doc_id": int(d), "score": float(s)}
            for d, s in zip(docs, scores)]


def _counts(docs, counts, limit) -> dict:
    n = len(docs)
    if limit is not None:
        docs, counts = docs[:limit], counts[:limit]
    return {"rows": [{"doc_id": int(d), "count": int(c)}
                     for d, c in zip(docs, counts)],
            "total": n}


class SearchServer:
    """Warm pools + a dict-in/dict-out dispatcher (transport-free)."""

    def __init__(self, index_dir: str, corpus_path: str | None = None,
                 grep_index: str | None = None,
                 ann_index: str | None = None, num_ranges: int = 4,
                 ann_owners: int = 4):
        from .pool import RangePartitionedPool

        self.index_dir = index_dir
        self.corpus_path = corpus_path
        self.grep_index = grep_index
        self.num_ranges = num_ranges
        # per-doc dl/term products for tombstone stat corrections —
        # persists across refreshes so one-doc deletes don't re-read
        # and re-tokenize the whole tombstone history
        self._nrt_cache: dict = {}
        # live pool: deltas + tombstones already on disk are served
        # from request 1 (a daemon over an updated index must never
        # silently answer from the pre-update generation)
        self.pool = RangePartitionedPool(index_dir,
                                         num_ranges=num_ranges,
                                         corpus_path=corpus_path,
                                         nrt_cache=self._nrt_cache)
        try:
            self.ann = None
            if ann_index is not None:
                from .ann import AnnPool

                self.ann = AnnPool(ann_index, num_owners=ann_owners)
            if grep_index is not None:
                # fail fast on a broken/half-published grep index (the
                # open validates markers + meta) instead of on request 1
                from .grep import TrigramIndex

                TrigramIndex(grep_index)
        except BaseException:
            # a failed constructor has no handle for the caller to
            # close() — reap the already-spawned actors here
            self.close()
            raise
        self.shutdown_requested = False
        self._t0 = time.monotonic()
        self._n_requests = 0

    # -- op implementations -------------------------------------------------

    def _generation(self) -> str:
        """Index-generation token baked into cursors: every ingest /
        delete changes it (delta count + tombstone count are both
        monotonic between compactions), and it survives a daemon
        restart — a cursor minted before a mutation compares floats
        against RE-SCORED pages, silently dropping/duplicating docs,
        so a stale one must be rejected loudly instead."""
        return f"g{self.pool.num_deltas}.{self.pool.num_tombstones}"

    def _op_search(self, req: dict) -> dict:
        terms = req["terms"]
        k = int(req.get("k", 10))
        after = req.get("after")
        if after is None:
            # page 1 through the dense pass so a cursor minted from it
            # is ULP-consistent with later pages (pool.score_after doc)
            d, s = self.pool.score_after(terms, k)
        else:
            if len(after) >= 3 and str(after[2]) != self._generation():
                raise ValueError(
                    "stale cursor: the index changed (ingest/delete) "
                    "since this page was minted — restart pagination "
                    "from page 1")
            d, s = self.pool.score_after(terms, k,
                                         after_score=float(after[0]),
                                         after_doc=int(after[1]))
        hits = _hits(d, s)
        out = {"hits": hits}
        if hits and len(hits) == k:
            out["next_after"] = [hits[-1]["score"], hits[-1]["doc_id"],
                                 self._generation()]
        return out

    def _op_query(self, req: dict) -> dict:
        d, s = self.pool.score_query(req["q"], int(req.get("k", 10)))
        return {"hits": _hits(d, s)}

    def _op_explain(self, req: dict) -> dict:
        """Per-term score breakdown for one doc — the debug surface a
        relevance engineer drives against a live server (public
        Lucene/Elasticsearch explain-API shape); routed to the doc's
        one owning range actor."""
        return self.pool.explain(req["terms"], int(req["doc_id"]))

    def _op_lm(self, req: dict) -> dict:
        """LM-Dirichlet ranking (Zhai & Lafferty 2001) from the same
        warm range pool BM25 serves from; ``mu`` optional (default
        2000).  On a delta/tombstone-serving pool the scorer raises
        NotImplementedError (cf corrections not implemented) and the
        per-request wall maps it to an error response."""
        d, s = self.pool.score_lm(req["terms"], int(req.get("k", 10)),
                                  mu=float(req.get("mu", 2000.0)))
        return {"hits": _hits(d, s)}

    def _op_phrase(self, req: dict) -> dict:
        d, c = self.pool.phrase_counts([str(t) for t in req["terms"]])
        return _counts(d, c, req.get("limit", 100))

    def _op_near(self, req: dict) -> dict:
        d, c = self.pool.near_counts(str(req["a"]), str(req["b"]),
                                     slop=int(req.get("slop", 3)),
                                     ordered=bool(req.get("ordered",
                                                          False)))
        return _counts(d, c, req.get("limit", 100))

    def _op_facets(self, req: dict) -> dict:
        if self.corpus_path is None:
            raise ValueError("facets needs the server started with a "
                             "corpus_path (the facet column lives in "
                             "the doc table, not the index)")
        k = int(req.get("k", 3))
        facet_col = str(req.get("facet_col", "lang"))
        j = self.pool.facet_heads(req["terms"], k, facet_col,
                                  self.corpus_path)
        j = j.sort_values([facet_col, "score", "doc_id"],
                          ascending=[True, False, True])
        head = j.groupby(facet_col, sort=False, dropna=False).head(k)
        rows = [{"facet": (None if f != f else f),  # NaN -> null
                 "doc_id": int(d), "score": float(s)}
                for f, d, s in zip(head[facet_col], head["doc_id"],
                                   head["score"])]
        return {"rows": rows}

    def _op_ann(self, req: dict) -> dict:
        if self.ann is None:
            raise ValueError("ann needs the server started with an "
                             "ann_index directory")
        import numpy as np

        q = np.asarray(req["vectors"], dtype=np.float64)
        if q.ndim == 1:
            q = q[None, :]
        out = self.ann.query(q, k=int(req.get("k", 10)),
                             nprobe=int(req.get("nprobe", 12)),
                             rerank=int(req.get("rerank", 8)))
        out = out.sort_values(["qid", "rank"])
        res: list[list[dict]] = [[] for _ in range(len(q))]
        for qid, rank, vid in zip(out["qid"], out["rank"],
                                  out["vec_id"]):
            res[int(qid)].append({"rank": int(rank),
                                  "vec_id": int(vid)})
        return {"results": res}

    def _op_spell(self, req: dict) -> dict:
        # _spell_for is lineage-keyed: a dictionary rebuilt under a
        # running daemon evicts the cached SymSpell structure instead
        # of serving stale suggestions until restart
        from ..functions.search import _spell_for

        return {"suggestions": _spell_for(self.index_dir).suggest(
            str(req["term"]), int(req.get("max_suggestions", 5)))}

    def _op_grep(self, req: dict) -> dict:
        if self.grep_index is None or self.corpus_path is None:
            raise ValueError("grep needs the server started with both "
                             "grep_index and corpus_path")
        from .grep import (
            grep_count,
            grep_lines,
            grep_regex,
            grep_substring,
        )

        mode = str(req.get("mode", "docs"))
        pat = str(req["pattern"])
        out_path = req.get("output_path")
        fn = {"docs": grep_substring, "count": grep_count,
              "lines": grep_lines, "regex": grep_regex}.get(mode)
        if fn is None:
            raise ValueError(f"unknown grep mode {mode!r}")
        tbl = fn(self.grep_index, self.corpus_path, pat,
                 output_path=out_path)
        if out_path is not None:
            return {"path": tbl["path"][0].as_py(),
                    "n_rows": tbl["n_rows"][0].as_py()}
        limit = req.get("limit", 100)
        total = tbl.num_rows
        if limit is not None:
            tbl = tbl.slice(0, int(limit))
        return {"rows": tbl.to_pylist(), "total": total}

    def _op_stats(self, req: dict) -> dict:
        # num_docs/avgdl are the LIVE serving values (deltas counted,
        # tombstones subtracted), not the main segment's meta — a
        # client sizing pages after an ingest must see the real corpus
        return {
            "num_docs": self.pool.live_n,
            "avgdl": self.pool.live_avgdl,
            "generation": self._generation(),
            "num_ranges": len(self.pool.actors),
            "num_deltas": self.pool.num_deltas,
            "num_tombstones": self.pool.num_tombstones,
            "ann_owners": len(self.ann.owners) if self.ann else 0,
            "grep_index": self.grep_index,
            "uptime_sec": time.monotonic() - self._t0,
            "n_requests": self._n_requests,
        }

    # -- live index mutation (NRT ingest / delete) ---------------------------

    def _refresh_pool(self) -> None:
        """Swap in a pool over the CURRENT index generation.  The new
        fleet is built before the old one dies, so a refresh that fails
        (bad corpus, missing _SOURCE) leaves the serving pool intact."""
        from .pool import RangePartitionedPool

        new = RangePartitionedPool(self.index_dir,
                                   num_ranges=self.num_ranges,
                                   corpus_path=self.corpus_path,
                                   nrt_cache=self._nrt_cache)
        old, self.pool = self.pool, new
        old.shutdown()

    def _op_ingest(self, req: dict) -> dict:
        """Delta-index a new corpus and serve it — the reference's
        incremental update cycle, but without a daemon restart."""
        from .delta import add_documents

        delta_dir = add_documents(self.index_dir, str(req["corpus"]),
                                  text_col=str(req.get("text_col",
                                                       "text")),
                                  id_col=str(req.get("id_col",
                                                     "doc_id")))
        self._refresh_pool()
        return {"delta_dir": delta_dir,
                "num_deltas": self.pool.num_deltas}

    def _op_delete(self, req: dict) -> dict:
        from .delta import delete_documents

        import json as _json
        import os

        ids = [int(d) for d in req["doc_ids"]]
        if not ids:
            raise ValueError("delete needs a non-empty doc_ids list")
        # checks BEFORE writing tombstones: a tombstone the pool cannot
        # serve would wedge every later refresh AND daemon restart
        if self.corpus_path is None:
            raise ValueError("delete needs the server started with a "
                             "corpus_path (the exact df correction "
                             "re-tokenizes the deleted docs)")
        bad = [i for i in ids if i < 0 or i >= self.pool.doc_space]
        if bad:
            raise ValueError(
                f"doc ids {bad[:5]} outside the served doc-id space "
                f"({self.pool.doc_space}); only indexed docs may be "
                "deleted")
        from .delta import _tombstone_path, load_tombstones

        before = load_tombstones(self.index_dir)
        tomb = delete_documents(self.index_dir, ids)
        try:
            self._refresh_pool()
        except BaseException:
            # roll the on-disk tombstone set back so a failed delete
            # (id not in the corpus, missing delta _SOURCE, ...) never
            # poisons later mutations or restarts
            tp = _tombstone_path(self.index_dir)
            if before:
                with open(tp + ".tmp", "w") as f:
                    _json.dump(sorted(before), f)
                os.replace(tp + ".tmp", tp)
            elif os.path.exists(tp):
                os.remove(tp)
            raise
        return {"num_tombstones": len(tomb)}

    # -- dispatch ------------------------------------------------------------

    _OPS = {
        "search": _op_search, "query": _op_query, "lm": _op_lm,
        "explain": _op_explain, "phrase": _op_phrase,
        "near": _op_near, "facets": _op_facets, "ann": _op_ann,
        "spell": _op_spell, "grep": _op_grep, "stats": _op_stats,
        "ingest": _op_ingest, "delete": _op_delete,
    }

    def handle(self, req: dict) -> dict:
        """One request dict -> one response dict; never raises (errors
        become ``{"ok": false, "error": ...}`` so one bad request can't
        take the daemon down)."""
        self._n_requests += 1
        rid = req.get("id") if isinstance(req, dict) else None
        base = {} if rid is None else {"id": rid}
        try:
            if not isinstance(req, dict) or "op" not in req:
                raise ValueError('request must be an object with "op"')
            op = req["op"]
            if op == "ping":
                return {**base, "ok": True, "pong": True}
            if op == "shutdown":
                # handled here (not only in serve_loop) so ANY
                # transport wrapping handle() can stop the daemon via
                # the documented protocol; the transport reads
                # shutdown_requested after each response
                self.shutdown_requested = True
                return {**base, "ok": True, "bye": True}
            fn = self._OPS.get(op)
            if fn is None:
                raise ValueError(f"unknown op {op!r}")
            return {**base, "ok": True, **fn(self, req)}
        except (ValueError, KeyError, TypeError) as e:
            # request-shape errors (missing/mistyped fields, unknown
            # op); transports may map these to a don't-retry status
            return {**base, "ok": False, "bad_request": True,
                    "error": f"{type(e).__name__}: {e}"}
        except Exception as e:          # noqa: BLE001 — per-request wall
            return {**base, "ok": False,
                    "error": f"{type(e).__name__}: {e}"}

    def close(self) -> None:
        self.pool.shutdown()
        if self.ann is not None:
            self.ann.shutdown()


def serve_http(server: SearchServer, host: str = "127.0.0.1",
               port: int = 0):
    """HTTP front over ``handle()`` — the reference's actual transport
    (its query tier is CGI behind an HTTP daemon,
    /root/reference/DyableRequest/DyableQuery/DyableQuery.cpp:70-100).

    ``POST /`` with a JSON request body returns the ``handle()``
    response as JSON; ``GET /ping`` answers without a body.  Requests
    are served SERIALLY on purpose: ``handle()`` mutates per-server
    counters and the reference fleet is likewise one-request-per-worker
    — horizontal scale comes from running more daemons (each pinning
    its own actor fleet), not threads in one.  ``{"op": "shutdown"}``
    stops the listener after the response is written.

    Returns the bound ``HTTPServer`` WITHOUT starting it, so callers
    own the loop: the CLI calls ``serve_forever()``; a test reads
    ``server_address`` for the ephemeral port and drives it from a
    thread.
    """
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class _Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        # The server is single-threaded, so one request per connection:
        # a keep-alive client parked in readline() would otherwise hold
        # accept() (and a pending shutdown) hostage.  The socket timeout
        # bounds slow/short-bodied clients the same way.
        timeout = 30

        def _reply(self, obj: dict, code: int = 200) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            # also sets self.close_connection — one request per
            # connection, advertised to the client
            self.send_header("Connection", "close")
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802 — http.server API
            self.server.n_served += 1
            try:
                n = int(self.headers.get("Content-Length") or 0)
                req = json.loads(self.rfile.read(n))
            except (ValueError, json.JSONDecodeError) as e:
                self._reply({"ok": False, "error": f"bad json: {e}"},
                            code=400)
                return
            resp = server.handle(req)
            if resp.get("ok"):
                code = 200
            elif resp.get("bad_request"):
                code = 400      # request-shape error: don't retry
            else:
                code = 500      # op failed server-side: retryable
            self._reply(resp, code=code)
            if server.shutdown_requested:
                # shutdown() joins the serve_forever loop this handler
                # runs inside — must be called from another thread
                threading.Thread(target=self.server.shutdown,
                                 daemon=True).start()

        def do_GET(self):  # noqa: N802
            if self.path == "/ping":
                self._reply({"ok": True, "pong": True})
            else:
                self._reply({"ok": False,
                             "error": "POST a JSON request to /"},
                            code=404)

        def log_message(self, *args):  # quiet: one line per request
            pass                       # pollutes the daemon's stderr

    httpd = HTTPServer((host, port), _Handler)
    httpd.n_served = 0   # the HTTP analog of serve_loop's return value
    return httpd


def serve_loop(server: SearchServer, fin=None, fout=None) -> int:
    """NDJSON request loop: one JSON object per input line, one JSON
    response per output line (flushed — a pipe peer must not wait on a
    buffer).  Blank lines are ignored; a malformed line gets an error
    response; ``{"op": "shutdown"}`` (or EOF) ends the loop after
    acknowledging.  Returns the number of requests served."""
    fin = sys.stdin if fin is None else fin
    fout = sys.stdout if fout is None else fout
    served = 0
    for line in fin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"ok": False, "error": f"bad json: {e}"}),
                  file=fout, flush=True)
            served += 1
            continue
        print(json.dumps(server.handle(req)), file=fout, flush=True)
        served += 1
        if server.shutdown_requested:
            break
    return served
