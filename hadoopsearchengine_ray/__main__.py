"""Job-submission entry point: ``python -m hadoopsearchengine_ray ...``.

The reference runs as hand-sequenced binaries driven by DyableCommand
(/root/reference/DyableCommand/DyableCommand.cpp:641-724); the Ray-native
equivalent is one module runnable directly or via the cluster job API::

    ray job submit --working-dir . -- \
        python -m hadoopsearchengine_ray build --corpus /data/corpus --index /data/index

Subcommands:

- ``gen``    write the deterministic synthetic corpus (FIXTURES.md §1)
- ``build``  run (or resume — the manifest skips finished stages) the
             full index build and print the manifest metrics as JSON
- ``query``  score ad-hoc queries against a built index and print top-k
- ``compact`` fold an index + its deltas + tombstones into a fresh
             standalone index (no re-tokenize; resumable)
- ``search`` parsed query strings (``"merge^2 +window -dup s*"``)
             against a built index
- ``grep``   exact-substring / regex / line-level code search backed
             by the trigram index (built on first use)

Ray session ownership: this CLI initialises Ray itself (guarded) because
it IS a job entry point; library code never does.  ``RAY_ADDRESS`` is
honoured, so the same command line works on a laptop (``local``) and on
a cluster head node (``auto``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


_RAY_OWNED = False


def _init_ray() -> None:
    """Guarded init; remembers whether THIS process started Ray so
    ``main`` only shuts down a session it owns (an embedding caller's
    live session — e.g. the test harness — must survive a CLI call)."""
    import ray

    global _RAY_OWNED
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
        _RAY_OWNED = True


def _cmd_gen(a: argparse.Namespace) -> int:
    from . import corpus

    _init_ray()
    corpus.write_corpus(a.out, a.docs, seed=a.seed)
    print(json.dumps({"corpus": a.out, "docs": a.docs, "seed": a.seed}))
    return 0


def _cmd_build(a: argparse.Namespace) -> int:
    from .pipelines.build_index import build_index
    from .state.manifest import Manifest

    _init_ray()
    meta = build_index(a.corpus, a.index, with_positions=not a.no_positions,
                       hot_df_frac=a.hot_df_frac,
                       exclude_terms=tuple(a.exclude))
    man = Manifest.load(os.path.join(a.index, "manifest.json"))
    print(json.dumps({
        "index": a.index,
        "num_docs": meta["num_docs"],
        "total_tokens": meta["total_tokens"],
        "stages": {s: {"status": e.get("status"),
                       "wall_sec": e.get("wall_sec"),
                       "metrics": e.get("metrics")}
                   for s, e in man.stages.items()},
    }, indent=1))
    return 0


def _cmd_query(a: argparse.Namespace) -> int:
    from .pipelines.query import BM25Scorer

    _init_ray()
    sc = BM25Scorer(a.index)
    for q in a.terms:
        if a.ranker == "lm":
            ids, scores = sc.score_lm(q.split(), a.k, mu=a.mu)
        else:
            ids, scores = sc.score(q.split(), a.k)
        print(json.dumps({"query": q,
                          "hits": [{"doc_id": int(d), "score": round(float(s), 6)}
                                   for d, s in zip(ids, scores)]}))
    return 0


def _cmd_merge(a: argparse.Namespace) -> int:
    from .pipelines.compaction import merge_indexes

    _init_ray()
    meta = merge_indexes(a.indexes, a.out)
    print(json.dumps({"index": a.out,
                      "num_docs": meta["num_docs"],
                      "doc_id_space": meta["doc_id_space"],
                      "total_tokens": meta["total_tokens"]}))
    return 0


def _cmd_compact(a: argparse.Namespace) -> int:
    from .pipelines.delta import compact_index
    from .state.manifest import Manifest

    _init_ray()
    meta = compact_index(a.index, a.out, mode=a.mode)
    man = Manifest.load(os.path.join(a.out, "manifest.json"))
    print(json.dumps({
        "index": a.out,
        "num_docs": meta["num_docs"],
        "doc_id_space": meta["doc_id_space"],
        "total_tokens": meta["total_tokens"],
        "stages": {s: {"status": e.get("status"),
                       "wall_sec": e.get("wall_sec")}
                   for s, e in man.stages.items()},
    }, indent=1))
    return 0


def _cmd_search(a: argparse.Namespace) -> int:
    from .pipelines.query import BM25Scorer

    _init_ray()
    sc = BM25Scorer(a.index)
    for q in a.queries:
        ids, scores = sc.score_query(q, a.k)
        print(json.dumps({"query": q,
                          "hits": [{"doc_id": int(d), "score": round(float(s), 6)}
                                   for d, s in zip(ids, scores)]}))
    return 0


def _cmd_grep(a: argparse.Namespace) -> int:
    from .pipelines.grep import (
        build_trigram_index,
        grep_count,
        grep_lines,
        grep_regex,
        grep_substring,
    )

    _init_ray()
    import shutil

    import pyarrow.dataset as pads

    from .state.manifest import lineage_fingerprint

    schema = pads.dataset(a.corpus).schema
    corpus_path, text_col, id_col = a.corpus, a.text_col, a.id_col
    if text_col not in schema.names and "content" in schema.names:
        text_col = "content"      # the canonical corpus column name
    if text_col not in schema.names:
        print(f"error: text column {a.text_col!r} not in corpus schema "
              f"{schema.names}", file=sys.stderr)
        return 2

    # reuse the index only when BOTH its build params match the asked
    # flags AND its recorded corpus lineage is current — a stale or
    # differently-built index would silently prune true matches
    fp = lineage_fingerprint([a.corpus])
    meta_path = os.path.join(a.index, "meta.json")
    lin_path = os.path.join(a.index, "_LINEAGE")
    fresh = False
    if os.path.exists(meta_path) and os.path.exists(lin_path):
        with open(meta_path) as f:
            meta = json.load(f)
        with open(lin_path) as f:
            have_fp = f.read()
        fresh = (have_fp == fp
                 and meta.get("text_col") == text_col
                 and meta.get("id_col") == id_col
                 and bool(meta.get("casefold")) == bool(a.ignore_case))
    if not fresh:
        if os.path.exists(meta_path):
            print(f"[grep] index at {a.index} is stale or was built "
                  "with different parameters; rebuilding",
                  file=sys.stderr)
        # a rebuild must NOT resurrect docs the user explicitly
        # grep-deleted: tombstones are user intent, not index state.
        # Carrying them is only SOUND when the corpus provides its own
        # id column (ids survive any rewrite; ids absent from the new
        # corpus are harmless no-ops in the subtraction).  Rank-derived
        # ids (no id_col: zip_with_index over the sorted natural key)
        # can renumber docs when the corpus changes, so a carried
        # tombstone could silently suppress a DIFFERENT live doc —
        # refuse unless the user explicitly discards them.
        keep_tomb: list[int] = []
        tomb_path = os.path.join(a.index, "tombstones.json")
        if os.path.exists(tomb_path):
            with open(tomb_path) as f:
                keep_tomb = json.load(f)
        if keep_tomb and id_col not in schema.names:
            if not a.drop_tombstones:
                print(f"error: index {a.index} has {len(keep_tomb)} "
                      "tombstones but the corpus has no stable id "
                      f"column ({id_col!r}): rebuilding assigns ids by "
                      "rank, so carried tombstones could hide the "
                      "wrong documents. Re-run with --drop-tombstones "
                      "to rebuild without them (then re-issue "
                      "grep-delete for the surviving ids).",
                      file=sys.stderr)
                return 2
            print(f"[grep] dropping {len(keep_tomb)} tombstones "
                  "(--drop-tombstones): rank-derived ids do not "
                  "survive a rebuild", file=sys.stderr)
            keep_tomb = []
        elif keep_tomb:
            print(f"[grep] preserving {len(keep_tomb)} tombstones "
                  "across the rebuild (corpus-stable ids)",
                  file=sys.stderr)
        shutil.rmtree(a.index, ignore_errors=True)

    if id_col not in schema.names:
        # raw (repo, path, commit, lang, content) corpus: materialize a
        # (doc_id, text) view with the SAME dense ids the index build
        # assigns (rank over the sorted natural key), so grep doc_ids
        # agree with BM25 doc_ids over the same corpus
        import ray.data as rd

        from .stages.ingest import zip_with_index

        view = os.path.join(a.index, "corpus_view")
        if not fresh:
            keys = [k for k in ("repo", "path", "commit")
                    if k in schema.names]
            ds = rd.read_parquet(corpus_path, columns=keys + [text_col])
            zip_with_index(ds, sort_keys=keys or None,
                           id_column=id_col) \
                .select_columns([id_col, text_col]).write_parquet(view)
        corpus_path = view
    if not fresh:
        build_trigram_index(corpus_path, a.index, text_col=text_col,
                            id_col=id_col, casefold=a.ignore_case)
        if keep_tomb:
            from .pipelines.grep import delete_from_trigram_index

            delete_from_trigram_index(a.index, keep_tomb)
        with open(lin_path, "w") as f:
            f.write(fp)
    fn = {"substring": grep_substring, "regex": grep_regex,
          "count": grep_count, "lines": grep_lines}[a.mode]
    tbl = fn(a.index, corpus_path, a.pattern)
    for row in tbl.to_pylist():
        print(json.dumps(row))
    return 0


def _cmd_grep_ingest(a: argparse.Namespace) -> int:
    from .pipelines.grep import add_to_trigram_index
    from .state.manifest import lineage_fingerprint

    _init_ray()
    add_to_trigram_index(a.corpus, a.index)
    # without a refreshed _LINEAGE the next CLI `grep` (whose --corpus
    # is necessarily a different path/content than the pre-ingest one)
    # would fail the freshness check and rebuild, orphaning the delta
    # postings just written: --full-corpus names the COMBINED corpus
    # (base + this delta) the user will grep next, and its fingerprint
    # becomes the index's lineage
    if a.full_corpus:
        with open(os.path.join(a.index, "_LINEAGE"), "w") as f:
            f.write(lineage_fingerprint([a.full_corpus]))
    else:
        # stale lineage is worse than none: drop it so the next CLI
        # grep rebuilds loudly instead of the fingerprint mismatch
        # looking like corpus tampering (library calls are unaffected)
        lin = os.path.join(a.index, "_LINEAGE")
        if os.path.exists(lin):
            os.remove(lin)
            print("[grep-ingest] no --full-corpus given: cleared "
                  "_LINEAGE; the next CLI grep will rebuild unless "
                  "you pass the combined corpus via --full-corpus "
                  "here", file=sys.stderr)
    print(json.dumps({"index": a.index, "ingested": a.corpus,
                      "lineage": a.full_corpus}))
    return 0


def _cmd_grep_delete(a: argparse.Namespace) -> int:
    from .pipelines.grep import (
        delete_from_trigram_index,
        maybe_compact_trigram_index,
        should_compact_trigram_index,
    )

    total = delete_from_trigram_index(a.index, a.ids)
    compacted = False
    if not a.no_compact and should_compact_trigram_index(
            a.index, frac=a.compact_frac):
        # fold a grown tombstone list back into the segments so the
        # plan-time subtraction array stays bounded (threshold: both an
        # absolute floor and a fraction of the indexed doc count).
        # Compaction is a Ray Data job — own the session like every
        # other Ray-using subcommand instead of letting it auto-init
        _init_ray()
        compacted = maybe_compact_trigram_index(
            a.index, frac=a.compact_frac)
    print(json.dumps({"index": a.index,
                      "tombstones": 0 if compacted else total,
                      "compacted": compacted}))
    return 0


def _cmd_serve(a: argparse.Namespace) -> int:
    """Long-lived serving daemon (the reference's CGI/NameServer tier,
    DyableRequest/DyableQuery/DyableQuery.cpp:70-100): pin the range
    pool (+ optional ANN pool / grep index) ONCE, then answer NDJSON
    requests on stdin until EOF or {"op": "shutdown"} — the pool
    latencies the one-shot subcommands pay setup for on every call."""
    from .pipelines.serve import SearchServer, serve_http, serve_loop

    _init_ray()
    server = SearchServer(a.index, corpus_path=a.corpus,
                          grep_index=a.grep_index,
                          ann_index=a.ann_index,
                          num_ranges=a.num_ranges)
    httpd = None
    ready = {"ready": True,
             **{k: v for k, v in server.handle(
                 {"op": "stats"}).items() if k != "ok"}}
    if a.http is not None:
        httpd = serve_http(server, port=a.http)
        ready["http"] = "http://%s:%d/" % httpd.server_address
    print(json.dumps(ready), file=sys.stderr, flush=True)
    try:
        if httpd is not None:
            httpd.serve_forever()
            n = httpd.n_served
        else:
            n = serve_loop(server)
    finally:
        if httpd is not None:
            httpd.server_close()
        server.close()
    print(json.dumps({"served": n}), file=sys.stderr, flush=True)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m hadoopsearchengine_ray",
                                description=(__doc__ or "").split("\n\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="write the synthetic source-code corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--docs", type=int, required=True)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=_cmd_gen)

    b = sub.add_parser("build", help="build (or resume) the inverted index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--hot-df-frac", type=float, default=0.25)
    b.add_argument("--exclude", nargs="*", default=[], metavar="TERM",
                   help="stopword amputation (M3); default keeps every "
                        "term via lossless hot-term salting")
    b.set_defaults(fn=_cmd_build)

    q = sub.add_parser("query", help="BM25 top-k against a built index")
    q.add_argument("--index", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--ranker", choices=["bm25", "lm"], default="bm25",
                   help="lm = query-likelihood with Dirichlet smoothing "
                        "(Zhai & Lafferty 2001)")
    q.add_argument("--mu", type=float, default=2000.0,
                   help="Dirichlet smoothing mass (lm ranker only)")
    q.add_argument("terms", nargs="+",
                   help="one or more queries, each a space-joined term list")
    q.set_defaults(fn=_cmd_query)

    c = sub.add_parser("compact", help="fold index + deltas + tombstones "
                                       "into a fresh standalone index")
    c.add_argument("--index", required=True,
                   help="main index dir (deltas/tombstones auto-discovered)")
    c.add_argument("--out", required=True, help="new index dir (must differ)")
    c.add_argument("--mode", choices=["auto", "merge", "rebuild"],
                   default="auto",
                   help="merge = posting-level blob merge (no token "
                        "shuffle); rebuild = token-level rerun of "
                        "stages 2-7; auto = merge with loud fallback")
    c.set_defaults(fn=_cmd_compact)

    mg = sub.add_parser("merge", help="merge independently built shard "
                                      "indexes (disjoint doc-id ranges) "
                                      "into one standalone index")
    mg.add_argument("--out", required=True)
    mg.add_argument("indexes", nargs="+", metavar="INDEX_DIR")
    mg.set_defaults(fn=_cmd_merge)

    s = sub.add_parser("search", help="parsed query strings "
                                      "(weighted/required/excluded/wildcard)")
    s.add_argument("--index", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("queries", nargs="+", metavar="QUERY",
                   help="e.g. 'merge^2 +window -dup s*'")
    s.set_defaults(fn=_cmd_search)

    gr = sub.add_parser("grep", help="trigram-indexed code search")
    gr.add_argument("--corpus", required=True,
                    help="corpus parquet (text/id columns)")
    gr.add_argument("--index", required=True,
                    help="trigram index dir (built here on first use)")
    gr.add_argument("--mode", choices=["substring", "regex", "count",
                                       "lines"], default="substring")
    gr.add_argument("--text-col", default="text")
    gr.add_argument("--id-col", default="doc_id")
    gr.add_argument("--drop-tombstones", action="store_true",
                    help="allow a rebuild to discard tombstones when "
                         "the corpus has no stable id column (rank-"
                         "derived ids do not survive a rebuild)")
    gr.add_argument("-i", "--ignore-case", action="store_true",
                    help="build/serve the casefolded variant; with "
                         "--mode regex the semantics are "
                         "regexp_matches(lower(text), pattern) — "
                         "write the pattern in lowercase")
    gr.add_argument("pattern")
    gr.set_defaults(fn=_cmd_grep)

    gi = sub.add_parser("grep-ingest", help="append NEW docs to an "
                        "existing trigram index (delta; ids must not "
                        "collide with indexed ones)")
    gi.add_argument("--corpus", required=True,
                    help="parquet of the NEW docs (index's own columns)")
    gi.add_argument("--index", required=True)
    gi.add_argument("--full-corpus", default=None,
                    help="parquet of the COMBINED corpus (base + delta) "
                         "future `grep --corpus` calls will pass; its "
                         "lineage keeps the delta-ingested index fresh "
                         "for the CLI instead of forcing a rebuild")
    gi.set_defaults(fn=_cmd_grep_ingest)

    gd = sub.add_parser("grep-delete", help="tombstone doc ids out of "
                        "a trigram index (auto-compacts past a "
                        "threshold)")
    gd.add_argument("--index", required=True)
    gd.add_argument("ids", nargs="+", type=int, metavar="DOC_ID")
    gd.add_argument("--no-compact", action="store_true",
                    help="never fold tombstones into the segments")
    gd.add_argument("--compact-frac", type=float, default=0.25,
                    help="compact when tombstones exceed this fraction "
                         "of indexed docs (and the absolute floor)")
    gd.set_defaults(fn=_cmd_grep_delete)

    sv = sub.add_parser("serve", help="long-lived NDJSON serving "
                        "daemon over warm pools (stdin/stdout; ops: "
                        "search/query/phrase/near/facets/ann/spell/"
                        "grep/stats/ping/shutdown)")
    sv.add_argument("--index", required=True,
                    help="built inverted-index dir (pipelines build)")
    sv.add_argument("--corpus", default=None,
                    help="doc parquet — enables facets + grep verify")
    sv.add_argument("--grep-index", default=None,
                    help="built trigram index dir — enables grep ops")
    sv.add_argument("--ann-index", default=None,
                    help="built ANN index dir — enables ann op")
    sv.add_argument("--num-ranges", type=int, default=4,
                    help="doc-range scorer actors in the pool")
    sv.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="serve HTTP on 127.0.0.1:PORT (0 = ephemeral; "
                         "the bound address is printed on the ready "
                         "line) instead of NDJSON on stdin/stdout")
    sv.set_defaults(fn=_cmd_serve)

    a = p.parse_args(argv)
    try:
        return a.fn(a)
    finally:
        import ray

        global _RAY_OWNED
        if _RAY_OWNED and ray.is_initialized():
            ray.shutdown()
            _RAY_OWNED = False


if __name__ == "__main__":
    sys.exit(main())
