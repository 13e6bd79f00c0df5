"""Headline benchmark: index build + BM25 latency + auxiliary pipelines.

Default run:
    python bench.py
prints ONE JSON line:
    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-pipeline sec / stats...}, "sf": ..., "num_cpus": N}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32), GRAFT_BENCH_DOCS (bench corpus size, default 100_000).

Scaling mode (the sandbox proxy for N-node vs 4N-node clusters,
BASELINE.md §3):
    python bench.py --scaling
runs the same job in two FRESH processes at num_cpus=8 and 32 on the
same cached input and reports both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_QUERIES = 200


def _cpu_stat():
    """(busy, idle, steal) jiffies from /proc/stat; None off-Linux.

    Hypervisor steal is the shared-box failure mode the sentinels exist
    for — but steal only manifests UNDER load (observed 2026-08-19:
    16-18% of requested cycles denied at 32-way load while the box
    probed idle/healthy single-core).  Recording the steal fraction
    next to the sentinels makes each run self-describing.
    """
    try:
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:9]]
    except (OSError, ValueError, IndexError):
        return None
    # user nice system idle iowait irq softirq steal
    return v[0] + v[1] + v[2] + v[5] + v[6], v[3] + v[4], v[7]


def _steal_frac(before, after) -> float | None:
    """Fraction of *requested* cycles stolen between two _cpu_stat()s."""
    if before is None or after is None:
        return None
    busy = after[0] - before[0]
    steal = after[2] - before[2]
    return round(steal / max(busy + steal, 1), 4)


def _quiet_ctx():
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # at low CPU counts the default per-operator resource reservation
    # (50%) leaves multi-operator pipelines running ~2-wide; disable it
    if hasattr(ctx, "op_resource_reservation_ratio"):
        ctx.op_resource_reservation_ratio = 0.0


def ensure_bench_corpus(n_docs: int) -> str:
    """Generate-and-cache the synthetic source-code corpus (untimed)."""
    out = f"/tmp/hse_bench_corpus_{n_docs}"
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    from hadoopsearchengine_ray.corpus import write_corpus

    shutil.rmtree(out, ignore_errors=True)
    write_corpus(out, n_docs)
    open(marker, "w").close()
    return out


def run_bench() -> dict:
    import numpy as np
    import pyarrow.dataset as pads
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs = int(os.environ.get("GRAFT_BENCH_DOCS", "100000"))

    _run_st0 = _cpu_stat()
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    _quiet_ctx()

    import ray.data as rd

    from hadoopsearchengine_ray import oracle
    from hadoopsearchengine_ray.functions import dedup, text
    from hadoopsearchengine_ray.pipelines.build_index import build_index
    from hadoopsearchengine_ray.pipelines.pagerank import pagerank
    from hadoopsearchengine_ray.pipelines.query import BM25Scorer, run_queries

    corpus_dir = ensure_bench_corpus(n_docs)
    # warm the page cache so we measure compute + shuffle, not first I/O
    rd.read_parquet(corpus_dir).count()

    timings: dict[str, float] = {}

    # ---- host sentinels (contention reference, not a pipeline) -------
    # this sandbox is a shared box: identical code has measured 11-21 s
    # for the same 100k build across windows (BASELINE.md noise band).
    # Record a 1-core and an all-core sentinel next to every run so a
    # reader can normalize across windows — compare pipeline seconds at
    # similar sentinel readings, not across different ones.
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**62, size=20_000_000, dtype=np.int64)
    t0 = time.perf_counter()
    np.sort(x)
    timings["sentinel_1core_sort_sec"] = round(time.perf_counter() - t0, 3)

    @ray.remote(num_cpus=1)
    def _spin(seed: int) -> int:
        import numpy as _np
        r = _np.random.default_rng(seed)
        y = r.integers(0, 2**62, size=4_000_000, dtype=_np.int64)
        return int(_np.sort(y)[0])

    _st0 = _cpu_stat()
    t0 = time.perf_counter()
    ray.get([_spin.remote(i) for i in range(ncpu)])
    timings["sentinel_allcore_sort_sec"] = round(
        time.perf_counter() - t0, 3)
    _sf = _steal_frac(_st0, _cpu_stat())
    if _sf is not None:
        timings["sentinel_steal_frac"] = _sf

    # ---- headline: full index build ----------------------------------
    # index output goes to shared memory when available: on one box, disk
    # write bandwidth is constant regardless of CPU count, while a real
    # cluster adds one disk per node — shm is the sandbox proxy for
    # per-node storage (BASELINE.md §3)
    out_root = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    # clear ALL stale bench indexes (any cpu level / corpus size): leftovers
    # in shm eat the page cache and skew back-to-back scaling runs
    import glob
    for d in glob.glob(f"{out_root}/hse_bench_index_*") + \
            glob.glob(f"{out_root}/hse_bench_compact_*") + \
            glob.glob(f"{out_root}/hse_bench_trigram_*") + \
            glob.glob(f"{out_root}/hse_bench_merge_*"):
        shutil.rmtree(d, ignore_errors=True)
    index_dir = f"{out_root}/hse_bench_index_{n_docs}_{ncpu}"
    # best-of-2: single-box builds share page cache / scheduler state and
    # vary +-20%; min wall is the standard estimator (BASELINE.md)
    t_index = None
    for _ in range(2):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.perf_counter()
        meta = build_index(corpus_dir, index_dir, hot_df_frac=0.25)
        dt = time.perf_counter() - t0
        t_index = dt if t_index is None else min(t_index, dt)
    timings["index_build"] = round(t_index, 3)
    timings["index_docs_per_sec"] = round(n_docs / t_index, 1)
    timings["index_tokens_per_sec"] = round(meta["total_tokens"] / t_index, 1)

    # ---- BM25 query latency (p50/p99 per query, single scorer) -------
    d_tbl = pads.dataset(os.path.join(index_dir, "dictionary")).to_table(
        columns=["term", "df"])
    terms = d_tbl.column("term").to_pylist()
    dfs = np.asarray(d_tbl.column("df").to_pylist())
    order = np.argsort(terms)
    qs = oracle.queries_from_dictionary(
        [terms[i] for i in order], dfs[order], BENCH_QUERIES)
    scorer = BM25Scorer(index_dir)
    lat = []
    for q in qs:
        t0 = time.perf_counter()
        scorer.score(q["terms"], q["k"])
        lat.append(time.perf_counter() - t0)
    lat_ms = np.array(lat) * 1000
    timings["bm25_p50_ms"] = round(float(np.percentile(lat_ms, 50)), 3)
    timings["bm25_p99_ms"] = round(float(np.percentile(lat_ms, 99)), 3)

    # LM-Dirichlet ranking (round 5): same index, same query set, the
    # second ranking family — first call pays the one-time cf read
    scorer.score_lm(qs[0]["terms"], qs[0]["k"])   # warm (cf load)
    _lat = []
    for q in qs:
        t0 = time.perf_counter()
        scorer.score_lm(q["terms"], q["k"])
        _lat.append(time.perf_counter() - t0)
    timings["lm_p50_ms"] = round(
        float(np.percentile(np.array(_lat) * 1000, 50)), 3)

    # parsed query-string front-end (round 4): weighted OR + required +
    # excluded + wildcard composed in one scoring pass, warm scorer
    _qstrs = [f"{q['terms'][0]}^2 +{q['terms'][-1]} -{qs[(i + 7) % len(qs)]['terms'][0]} "
              f"{q['terms'][0][:3]}*" for i, q in enumerate(qs[:50])]
    scorer.score_query(_qstrs[0], 10)   # warm
    _lat = []
    for _qs in _qstrs:
        t0 = time.perf_counter()
        scorer.score_query(_qs, 10)
        _lat.append(time.perf_counter() - t0)
    timings["parsed_query_p50_ms"] = round(
        float(np.percentile(np.array(_lat) * 1000, 50)), 3)

    # actor-pool throughput over the same query set
    t0 = time.perf_counter()
    run_queries(index_dir, qs, concurrency=max(2, ncpu // 4)).count()
    timings["bm25_pool_200q"] = round(time.perf_counter() - t0, 3)

    # doc-range-partitioned pool (round 3): N range owners, driver merge
    from hadoopsearchengine_ray.pipelines.pool import RangePartitionedPool

    rpool = RangePartitionedPool(index_dir, num_ranges=max(2, ncpu // 8))
    rpool.replay(qs[:8])  # warm actor caches
    t0 = time.perf_counter()
    rpool.replay(qs)
    timings["bm25_rangepool_200q"] = round(time.perf_counter() - t0, 3)
    rpool.shutdown()

    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        # scaling mode: the efficiency criterion is about the BUILD; the
        # aux pipelines only add noise (and minutes at low cpu counts)
        _sf = _steal_frac(_run_st0, _cpu_stat())
        if _sf is not None:
            timings["run_steal_frac"] = _sf
        result = {
            "metric": "index-build sec (headline only)",
            "value": timings["index_build"], "unit": "sec",
            "queries": timings, "sf": sf_dir,
            "bench_docs": n_docs, "num_cpus": ncpu,
        }
        ray.shutdown()
        return result

    # ---- compaction: fold index + tombstones into a fresh index ------
    # posting-level blob merge (pipelines/compaction.py): one streaming
    # pass over the encoded posting rows, NO token shuffle — the
    # incremental-maintenance cost a 100-TB deploy pays instead of a
    # full rebuild.  ~6% of the docs are tombstoned so the re-encode
    # path is exercised, not just the verbatim copy.
    from hadoopsearchengine_ray.pipelines.delta import (
        compact_index,
        delete_documents,
    )

    delete_documents(index_dir, list(range(0, n_docs, 17)))
    compact_dir = f"{out_root}/hse_bench_compact_{n_docs}_{ncpu}"
    shutil.rmtree(compact_dir, ignore_errors=True)
    t0 = time.perf_counter()
    cmeta = compact_index(index_dir, compact_dir, mode="merge")
    timings["compact_merge_sec"] = round(time.perf_counter() - t0, 3)
    assert cmeta["num_docs"] == n_docs - len(range(0, n_docs, 17))
    assert cmeta.get("compacted_from") == 1
    shutil.rmtree(compact_dir, ignore_errors=True)
    # plain scorers below ignore tombstones, but leave the index pristine
    os.remove(os.path.join(index_dir, "tombstones.json"))

    # ---- shard-merge: fold two independently built half-indexes ------
    # (round 5) the parallel-partial-build path: the timed step is the
    # posting-level merge alone — at scale the two shard builds run as
    # independent jobs, so merge_sec is the serial tail a sharded
    # deploy pays on top of max(shard build times).
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.pipelines.compaction import merge_indexes

    mg_root = f"{out_root}/hse_bench_merge_{n_docs}_{ncpu}"
    shutil.rmtree(mg_root, ignore_errors=True)
    os.makedirs(mg_root)
    _full = pads.dataset(corpus_dir).to_table().sort_by(
        [("repo", "ascending"), ("path", "ascending"),
         ("commit", "ascending")])
    _full = _full.append_column(
        "doc_id", pa.array(np.arange(len(_full)), pa.int64()))
    _cut = len(_full) // 2
    pq.write_table(_full.slice(0, _cut), f"{mg_root}/a.parquet")
    pq.write_table(_full.slice(_cut), f"{mg_root}/b.parquet")
    build_index(f"{mg_root}/a.parquet", f"{mg_root}/ia",
                id_mode="column", text_col="content")
    build_index(f"{mg_root}/b.parquet", f"{mg_root}/ib",
                id_mode="column", text_col="content")
    t0 = time.perf_counter()
    mmeta = merge_indexes([f"{mg_root}/ia", f"{mg_root}/ib"],
                          f"{mg_root}/merged")
    timings["merge_shards_sec"] = round(time.perf_counter() - t0, 3)
    assert mmeta["num_docs"] == len(_full)
    shutil.rmtree(mg_root, ignore_errors=True)

    # ---- persistent serving daemon (round 5) --------------------------
    # SearchServer pins the range pool once; requests go through the
    # same dict-in/dict-out dispatcher the NDJSON loop (and any HTTP
    # front) uses — this is the per-request latency a daemon user gets,
    # vs paying Ray init + pool construction per one-shot CLI call.
    from hadoopsearchengine_ray.pipelines.serve import SearchServer

    _srv = SearchServer(index_dir, num_ranges=max(2, ncpu // 8))
    _srv.handle({"op": "search", "terms": qs[0]["terms"], "k": 10})  # warm
    _lat = []
    for q in qs:
        t0 = time.perf_counter()
        r = _srv.handle({"op": "search", "terms": q["terms"],
                         "k": q["k"]})
        assert r["ok"]
        _lat.append(time.perf_counter() - t0)
    timings["serve_search_p50_ms"] = round(
        float(np.percentile(np.array(_lat) * 1e3, 50)), 3)
    _srv.close()

    # ---- positional serving (phrase + proximity, round 2) ------------
    from hadoopsearchengine_ray.pipelines.positional import (
        phrase_counts,
        proximity_rerank_indexed,
    )
    from hadoopsearchengine_ray.pipelines.query import IndexReader

    order_df = np.argsort(dfs)
    hi_terms = [terms[i] for i in order_df[-2:]]
    mid_terms = [terms[i] for i in order_df[len(order_df) // 2:
                                            len(order_df) // 2 + 2]]
    reader = IndexReader(index_dir)
    for ph, label in ((mid_terms, "phrase_mid_p50_ms"),
                      (hi_terms, "phrase_hot_p50_ms")):
        phrase_counts(reader, ph)  # warm (posting rows cached after)
        lat = []
        for _ in range(20):
            t0 = time.perf_counter()
            phrase_counts(reader, ph)
            lat.append(time.perf_counter() - t0)
        timings[label] = round(float(np.percentile(np.array(lat) * 1e3, 50)), 3)
    t0 = time.perf_counter()
    proximity_rerank_indexed(index_dir, hi_terms, k=10, k_prime=50)
    timings["prox_rerank_1q"] = round(time.perf_counter() - t0, 3)

    # NEAR predicate from in-index positions (round 4): hot x hot is
    # the worst case (every occurrence of both terms enters the window
    # probes).  The cold number uses a pair the phrase benchmark did
    # NOT touch (3rd/4th hottest), so the first call genuinely pays
    # the position decode; the warm repeats show the decoded-cache
    # steady state; the mid-df pair is the typical-query cost.
    from hadoopsearchengine_ray.pipelines.positional import near_counts

    cold_pair = [terms[i] for i in order_df[-4:-2]]
    t0 = time.perf_counter()
    near_counts(reader, cold_pair[0], cold_pair[1], slop=5)
    timings["near_hot_cold_ms"] = round((time.perf_counter() - t0) * 1e3, 3)
    near_counts(reader, hi_terms[0], hi_terms[1], slop=5)   # warm decode
    for pair, label in ((hi_terms, "near_hot_p50_ms"),
                        (mid_terms, "near_mid_p50_ms")):
        lat = []
        for _ in range(20):
            t0 = time.perf_counter()
            near_counts(reader, pair[0], pair[1], slop=5)
            lat.append(time.perf_counter() - t0)
        timings[label] = round(
            float(np.percentile(np.array(lat) * 1e3, 50)), 3)

    # ---- trigram grep index (round 4): build + query latency ----------
    from hadoopsearchengine_ray.pipelines.grep import (
        build_trigram_index,
        grep_multi,
        grep_regex,
        grep_substring,
    )

    # keyed by n_docs AND invalidated when the corpus cache is newer
    # (generator/seed changes rewrite the corpus _DONE marker)
    grep_src = f"/tmp/hse_bench_grepsrc_{n_docs}_rg.parquet"
    corpus_marker = os.path.join(corpus_dir, "_DONE")
    if (not os.path.exists(grep_src)
            or os.path.getmtime(grep_src) < os.path.getmtime(corpus_marker)):
        import pyarrow as _pa
        import pyarrow.parquet as _pq
        _ctbl = pads.dataset(corpus_dir).to_table(columns=["content"])
        _ctbl = _ctbl.append_column("doc_id", _pa.array(
            np.arange(_ctbl.num_rows, dtype=np.int64)))
        # many row groups: Ray splits parquet reads at row-group
        # granularity, so a single-row-group file would serialize the
        # whole streaming verify scan onto one task (measured 14 s vs
        # ~2 s for the same 10-pattern batch)
        _pq.write_table(_ctbl, grep_src, row_group_size=4096)
    tri_dir = f"{out_root}/hse_bench_trigram_{n_docs}_{ncpu}"
    shutil.rmtree(tri_dir, ignore_errors=True)
    t0 = time.perf_counter()
    build_trigram_index(grep_src, tri_dir, text_col="content",
                        id_col="doc_id")
    timings["trigram_build_sec"] = round(time.perf_counter() - t0, 3)
    grep_substring(tri_dir, grep_src, "return")        # warm planner/df
    _gpats = sorted(t for t in terms if len(t) >= 4)[:10]
    for label, fn in (
            ("grep_substring_ms",
             lambda: grep_substring(tri_dir, grep_src, "template")),
            ("grep_regex_ms",
             lambda: grep_regex(tri_dir, grep_src, "return [a-z]+")),
            ("grep_multi10_ms",
             lambda: grep_multi(tri_dir, grep_src, _gpats))):
        t0 = time.perf_counter()
        fn()
        timings[label] = round((time.perf_counter() - t0) * 1e3, 3)
    # bounded-driver-memory mode on a stopword-scale pattern: the full
    # match set (O(matching docs) rows) is written to parquet by the
    # workers — only a (path, n_rows) summary crosses the driver
    _spill_dir = f"{out_root}/hse_bench_grepspill_{n_docs}_{ncpu}"
    t0 = time.perf_counter()
    _sp = grep_substring(tri_dir, grep_src, "return",
                         output_path=_spill_dir)
    timings["grep_spill_ms"] = round((time.perf_counter() - t0) * 1e3, 3)
    timings["grep_spill_rows"] = int(_sp["n_rows"][0].as_py())
    shutil.rmtree(_spill_dir, ignore_errors=True)
    shutil.rmtree(tri_dir, ignore_errors=True)

    # ---- auxiliary pipelines over $GRAFT_SF_DIR ----------------------
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    t0 = time.perf_counter()
    text.dictionary_table(docs).count()
    timings["documents_dictionary"] = round(time.perf_counter() - t0, 3)

    # relational round-2 additions: bucketed sessionize/asof + the
    # co-partitioned fact x fact hash join
    import pyarrow as pa
    import pyarrow.compute as pc

    from hadoopsearchengine_ray.pipelines import relational as rel

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    t0 = time.perf_counter()
    rel.sessionize(ev, "user_id", "ts", gap_seconds=1800,
                   tiebreak="event_id").count()
    timings["sessionize"] = round(time.perf_counter() - t0, 3)

    sg = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def _signups(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["event_type"], "signup"))
        return pa.table({"user_id": f["user_id"], "ts": f["ts"],
                         "signup_us": f["ts"].cast(pa.int64())})

    right = sg.map_batches(_signups, batch_format="pyarrow", batch_size=None)
    t0 = time.perf_counter()
    rel.asof_join(ev, right, by="user_id", on="ts",
                  value_cols=["signup_us"]).count()
    timings["asof_join"] = round(time.perf_counter() - t0, 3)

    # keyed interval-containment join (attribution windows): purchases
    # open 2h windows, every same-user event inside one matches
    def _points(b: pa.Table) -> pa.Table:
        f = b.filter(pc.not_equal(b["event_type"], "purchase"))
        return pa.table({"user_id": f["user_id"], "ts": f["ts"]})

    def _ivals(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["event_type"], "purchase"))
        s = f["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        e = pc.add(s, pa.scalar(2 * 3600 * 1_000_000, pa.int64()))
        return pa.table({"user_id": f["user_id"],
                         "w_start": s.cast(pa.timestamp("us")),
                         "w_end": e.cast(pa.timestamp("us"))})

    ev3 = rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id", "ts", "event_type"])
    t0 = time.perf_counter()
    rel.range_join(ev3.map_batches(_points, batch_format="pyarrow",
                                   batch_size=None),
                   ev3.map_batches(_ivals, batch_format="pyarrow",
                                   batch_size=None),
                   on="ts", start_col="w_start", end_col="w_end",
                   by="user_id").count()
    timings["range_join"] = round(time.perf_counter() - t0, 3)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    od = od.map_batches(
        lambda b: pa.table({"l_orderkey": b["o_orderkey"],
                            "o_custkey": b["o_custkey"]}),
        batch_format="pyarrow", batch_size=None)
    t0 = time.perf_counter()
    rel.hash_join(li, od, on="l_orderkey").count()
    timings["hash_join_fact_fact"] = round(time.perf_counter() - t0, 3)

    # anchor index (J4) over the sf documents table
    from hadoopsearchengine_ray.pipelines.anchor import build_anchor_index

    anchor_dir = f"{out_root}/hse_bench_anchor_{ncpu}"
    shutil.rmtree(anchor_dir, ignore_errors=True)
    t0 = time.perf_counter()
    build_anchor_index(f"{sf_dir}/documents.parquet", anchor_dir)
    timings["anchor_index_build"] = round(time.perf_counter() - t0, 3)

    # unified body+title+anchor index (round 3): one build, one reader
    from hadoopsearchengine_ray.pipelines.fields import (
        BM25FScorer,
        build_unified_index,
    )

    uni_dir = f"{out_root}/hse_bench_unified_{ncpu}"
    shutil.rmtree(uni_dir, ignore_errors=True)
    t0 = time.perf_counter()
    build_unified_index(f"{sf_dir}/documents.parquet", uni_dir)
    timings["unified_index_build"] = round(time.perf_counter() - t0, 3)
    fscorer = BM25FScorer(uni_dir)
    u_tbl = pads.dataset(os.path.join(uni_dir, "dictionary")).to_table(
        columns=["term", "df"])
    u_terms = u_tbl.column("term").to_pylist()
    u_dfs = np.asarray(u_tbl.column("df").to_pylist())
    u_order = np.argsort(u_terms)
    fq = oracle.queries_from_dictionary(
        [u_terms[i] for i in u_order], u_dfs[u_order], 50)
    fscorer.score(fq[0]["terms"], 10)  # warm
    lat = []
    for q in fq:
        t0 = time.perf_counter()
        fscorer.score(q["terms"], 10)
        lat.append(time.perf_counter() - t0)
    timings["bm25f_p50_ms"] = round(
        float(np.percentile(np.array(lat) * 1e3, 50)), 3)

    t0 = time.perf_counter()
    dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.5).count()
    timings["minhash_near_dup"] = round(time.perf_counter() - t0, 3)

    # IVF-PQ ANN over the embeddings table (train + encode + ADC scan +
    # exact rerank, end to end — the compressed-scan-table path)
    from hadoopsearchengine_ray.functions import similarity as _sim
    _et = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id").isin([0, 1, 2]))
    _lut = {v: e for v, e in zip(_et["vec_id"].to_pylist(),
                                 _et["embedding"].to_pylist())}
    _qm = np.array([_lut[i] for i in (0, 1, 2)], dtype=np.float64)
    _emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    t0 = time.perf_counter()
    _sim.ivfpq_knn(_emb, _qm, k=10, nprobe=12, num_lists=16, m=8,
                   ksub=64, rerank=16)
    timings["ivfpq_knn"] = round(time.perf_counter() - t0, 3)

    # persistent ANN index: one build, then repeated partition-pruned
    # query reads (the serving-side number)
    import tempfile as _tf

    from hadoopsearchengine_ray.pipelines.ann import AnnIndex, build_ann_index
    _ann_dir = _tf.mkdtemp(prefix="hse_bench_ann_")
    t0 = time.perf_counter()
    build_ann_index(f"{sf_dir}/embeddings.parquet", _ann_dir,
                    num_lists=16, m=8, ksub=64)
    timings["ann_index_build"] = round(time.perf_counter() - t0, 3)
    _ann = AnnIndex(_ann_dir)
    _ann.query(_qm, k=10, nprobe=12, rerank=16)   # warm
    _lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ann.query(_qm, k=10, nprobe=12, rerank=16)
        _lat.append(time.perf_counter() - t0)
    timings["ann_query_p50_ms"] = round(
        float(np.percentile(np.array(_lat) * 1e3, 50)), 3)

    # pinned ANN serving pool (round-4): list-owner actors hold codes +
    # rerank vectors in RAM — no per-query Ray Dataset job
    from hadoopsearchengine_ray.pipelines.ann import AnnPool
    _pool = AnnPool(_ann_dir, num_owners=4)
    _pool.query(_qm, k=10, nprobe=12, rerank=16)   # warm
    _lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        _pool.query(_qm, k=10, nprobe=12, rerank=16)
        _lat.append(time.perf_counter() - t0)
    timings["ann_pool_p50_ms"] = round(
        float(np.percentile(np.array(_lat) * 1e3, 50)), 3)
    _pool.shutdown()
    shutil.rmtree(_ann_dir, ignore_errors=True)

    t0 = time.perf_counter()
    dedup.ngram_jaccard_pairs(docs, threshold=0.5, min_common=3).count()
    timings["ngram_jaccard"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    dedup.dup_span_stats(docs, n=8).count()
    timings["dup_spans"] = round(time.perf_counter() - t0, 3)

    # late round-3 training-data ops over the same sf documents table
    from hadoopsearchengine_ray.functions.text import (
        chunk_table,
        clean_corpus,
        tfidf_table,
    )

    t0 = time.perf_counter()
    tfidf_table(f"{sf_dir}/documents.parquet").count()
    timings["tfidf_features"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    chunk_table(f"{sf_dir}/documents.parquet", size=32, stride=16).count()
    timings["doc_chunks"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    clean_corpus(f"{sf_dir}/documents.parquet").count()
    timings["clean_corpus"] = round(time.perf_counter() - t0, 3)

    # training-prep family (functions/trainprep.py): repetition gates,
    # unigram-LM scoring, PII scrub, contamination semi-join, packing
    from hadoopsearchengine_ray.functions import trainprep as _tp

    t0 = time.perf_counter()
    _tp.repetition_stats(f"{sf_dir}/documents.parquet").count()
    timings["repetition_stats"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _tp.unigram_logprob(f"{sf_dir}/documents.parquet").count()
    timings["unigram_logprob"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _tp.pii_redact(f"{sf_dir}/documents.parquet").count()
    timings["pii_redact"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _tp.contamination_table(f"{sf_dir}/documents.parquet",
                            test_source="src0", n=5, num_buckets=8).count()
    timings["contamination"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _tp.pack_sequences(f"{sf_dir}/documents.parquet", seq_len=512).count()
    timings["pack_sequences"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _tp.prepare_corpus(f"{sf_dir}/documents.parquet", seq_len=512).count()
    timings["prepare_corpus"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _tp.packed_shards(f"{sf_dir}/documents.parquet", seq_len=512).count()
    timings["packed_shards"] = round(time.perf_counter() - t0, 3)

    # continual-ingestion dedup: first 80% indexed, last 20% + mirrors
    # of every 10th doc incoming
    import pyarrow.parquet as _pq

    from hadoopsearchengine_ray.functions.dedup import incremental_dedup
    from hadoopsearchengine_ray.stages.ingest import add_sha256

    _t = _pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    _ids = _t["doc_id"].to_numpy()
    _cut = (_t.num_rows * 4) // 5
    import pyarrow as _pa

    _mir = _t.take(np.flatnonzero((_ids < _cut) & (_ids % 10 == 0)))
    _mir = _mir.set_column(0, "doc_id",
                           _pa.array(_mir["doc_id"].to_numpy() + _t.num_rows))
    _inc = _pa.concat_tables([_mir, _t.take(np.flatnonzero(_ids >= _cut))])
    t0 = time.perf_counter()
    incremental_dedup(
        rd.from_arrow(_inc),
        add_sha256(rd.from_arrow(_t.take(np.flatnonzero(_ids < _cut))),
                   text_col="text").select_columns(["sha256"]),
        text_col="text").count()
    timings["incremental_dedup"] = round(time.perf_counter() - t0, 3)

    # distributed keyword co-occurrence graph + PulseRank (round 3) over
    # the 100k bench corpus (ids attached once via zip_with_index)
    from hadoopsearchengine_ray.functions.text import keyword_pagerank
    from hadoopsearchengine_ray.stages.ingest import load_corpus, zip_with_index

    kdocs = zip_with_index(load_corpus(corpus_dir),
                           sort_keys=["repo", "path", "commit"]) \
        .select_columns(["doc_id", "content"]).materialize()
    t0 = time.perf_counter()
    keyword_pagerank(kdocs, text_col="content", top_m=3, cycles=20)
    timings["keyword_pagerank_100k"] = round(time.perf_counter() - t0, 3)

    from hadoopsearchengine_ray.corpus import links_table

    links = rd.from_arrow(links_table(n_docs))
    t0 = time.perf_counter()
    pagerank(links, n_docs)
    timings["pagerank_20c"] = round(time.perf_counter() - t0, 3)

    # mergeable sketches + bloom semi-join (round 3) over the sf tables
    from hadoopsearchengine_ray.functions import sketch as _sk

    t0 = time.perf_counter()
    _sk.term_heavy_hitters(f"{sf_dir}/documents.parquet", k=30,
                           capacity=1 << 17).count()
    timings["heavy_hitters"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _sk.quantile_sketch(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_extendedprice"]),
        "l_extendedprice", [0.5, 0.95, 0.99], capacity=4096)
    timings["quantile_sketch"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id"])
    _sk.hll_distinct(_ev, "user_id", p=14)
    timings["hll_distinct"] = round(time.perf_counter() - t0, 3)

    # selective key set (~7% of orders): the regime the bloom
    # pre-filter exists for — most big-side rows never enter the join
    _keys = rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_totalprice"]) \
        .map_batches(lambda b: pa.table({"l_orderkey": b.filter(
            pc.greater(b["o_totalprice"], 465000.0))["o_orderkey"]}),
            batch_format="pyarrow", batch_size=None)
    _big = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_quantity"])
    t0 = time.perf_counter()
    rel.bloom_semi_join(_big, _keys, on="l_orderkey").count()
    timings["bloom_semi_join"] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "index-build sec (synthetic source-code corpus) "
                  "+ BM25 p50/p99 + aux pipelines",
        "value": timings["index_build"],
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "bench_docs": n_docs,
        "num_cpus": ncpu,
    }
    _sf = _steal_frac(_run_st0, _cpu_stat())
    if _sf is not None:
        timings["run_steal_frac"] = _sf
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, two fresh processes, N=4 then 4N=16 cpus.

    Why 4/16 and not 8/32: the measured single-box curve (docs/s at
    2/4/8/16/32 cpus = 949/1440/2547/4259/5175) saturates past 16 —
    shared object-store/driver/page-cache resources that a real cluster
    scales per-node.  4 vs 16 is the faithful N-node vs 4N-node proxy on
    one machine; the corpus is larger here (250k docs) so fixed per-stage
    overhead does not masquerade as serial fraction."""
    n_docs = int(os.environ.get("GRAFT_BENCH_DOCS", "250000"))
    os.environ["GRAFT_BENCH_DOCS"] = str(n_docs)
    ensure_bench_corpus(n_docs)  # shared, pre-generated

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_HEADLINE_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # the headline build is already best-of-2 inside run_bench
        return run_once(ncpu)

    lo, hi = 4, 16
    r_lo, r_hi = run(lo), run(hi)
    thr_lo = r_lo["queries"]["index_docs_per_sec"]
    thr_hi = r_hi["queries"]["index_docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (N=4 vs 4N=16 cpus, fresh processes)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "docs_per_sec_lo": thr_lo,
        "docs_per_sec_hi": thr_hi,
        "index_sec_lo": r_lo["queries"]["index_build"],
        "index_sec_hi": r_hi["queries"]["index_build"],
        "bm25_p50_ms_lo": r_lo["queries"]["bm25_p50_ms"],
        "bm25_p50_ms_hi": r_hi["queries"]["bm25_p50_ms"],
        "bm25_p99_ms_lo": r_lo["queries"]["bm25_p99_ms"],
        "bm25_p99_ms_hi": r_hi["queries"]["bm25_p99_ms"],
        "sentinel_allcore_lo": r_lo["queries"].get(
            "sentinel_allcore_sort_sec"),
        "sentinel_allcore_hi": r_hi["queries"].get(
            "sentinel_allcore_sort_sec"),
        "steal_frac_lo": r_lo["queries"].get("run_steal_frac"),
        "steal_frac_hi": r_hi["queries"].get("run_steal_frac"),
        "bench_docs": n_docs,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
