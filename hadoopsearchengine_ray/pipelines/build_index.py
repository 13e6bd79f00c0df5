"""End-to-end index build: corpus Parquet -> on-disk inverted index.

The Ray rebuild of the reference's ``ProcessPipeline()`` driver
(/root/reference/DyableCommand/DyableCommand.cpp:641-724), with the
manual stage toggling replaced by a checkpoint manifest
(state/manifest.py).  Stage layout on disk::

    index_dir/
      manifest.json
      tokens/        (doc_id, term, tf)        — the checkpointed tokenize output
      doclen/        (doc_id, dl)
      dictionary/    (term, term_id, df, cf)
      postings/part=<p>/                       — encoded posting rows
      meta.json      (N, avgdl, hot terms, partitioning params, BM25 consts)

Each stage writes Parquet then records lineage + counts in the manifest;
a rerun with unchanged inputs skips completed stages (test_resume.py).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.dataset as pads
import ray.data as rd

from ..state.manifest import Manifest, lineage_fingerprint
from ..stages.dictionary import (
    dictionary_from_postings,
    hot_terms_from_vocab,
    vocab_table,
)
from ..stages.ingest import add_sha256, load_corpus, zip_with_index
from ..stages.postings import (
    DEFAULT_INDEX_PARTS,
    DEFAULT_SALTS,
    DEFAULT_SHARDS,
    build_postings,
)
from ..stages.tokenize import doc_lengths, tokenize_stage

K1 = 1.2
B = 0.75

# bumped whenever stage layout / on-disk schema changes: folded into the
# lineage fingerprint so indexes built by older code rebuild cleanly
# instead of resuming into mixed-schema state
INDEX_FORMAT_VERSION = 3  # v3: positional postings (pos_blob/skip_pos_off)


def _partition_metrics(out_dir: str) -> dict:
    """Per-partition rows/bytes for a hive-partitioned stage output, read
    from Parquet FOOTERS only (no data pages touched) — the manifest's
    per-partition lineage record.  A resumed run compares these against
    the on-disk reality to spot partial writes."""
    import pyarrow.parquet as pq

    parts: dict[str, dict] = {}
    for root, _, files in os.walk(out_dir):
        pfiles = [f for f in files if f.endswith(".parquet")]
        if not pfiles:
            continue
        key = os.path.relpath(root, out_dir)
        ent = parts.setdefault(key, {"rows": 0, "bytes": 0, "files": 0})
        for f in pfiles:
            fp = os.path.join(root, f)
            ent["rows"] += pq.ParquetFile(fp).metadata.num_rows
            ent["bytes"] += os.path.getsize(fp)
            ent["files"] += 1
    return {
        "partitions": len(parts),
        "total_rows": sum(e["rows"] for e in parts.values()),
        "total_bytes": sum(e["bytes"] for e in parts.values()),
        "per_partition": dict(sorted(parts.items())),
    }


def _write_empty_index(index_dir, num_shards, num_salts, num_index_parts,
                       id_col, hot_df_frac) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    # clear every stage output first: this dir may hold a previous
    # non-empty build whose stale files would otherwise sit beside the
    # empty markers and corrupt the scorer
    for sub in ("tokens", "doclen", "dictionary", "sha256", "vocab",
                "postings"):
        shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
    for p in ("manifest.json", "hot_terms.json"):
        try:
            os.remove(os.path.join(index_dir, p))
        except FileNotFoundError:
            pass

    for sub, schema in {
        "doclen": pa.schema([("doc_id", pa.uint64()), ("dl", pa.int64())]),
        "dictionary": pa.schema([("term", pa.string()), ("term_id", pa.int64()),
                                 ("df", pa.int64()), ("cf", pa.int64())]),
        "sha256": pa.schema([(id_col, pa.uint64()), ("sha256", pa.string())]),
    }.items():
        d = os.path.join(index_dir, sub)
        os.makedirs(d, exist_ok=True)
        pq.write_table(schema.empty_table(), os.path.join(d, "empty.parquet"))
    os.makedirs(os.path.join(index_dir, "postings"), exist_ok=True)
    meta = {
        "num_docs": 0, "doc_id_space": 0, "total_tokens": 0, "avgdl": 0.0,
        "k1": K1, "b": B, "hot_df_frac": hot_df_frac, "hot_term_ids": {},
        "num_shards": num_shards, "num_salts": num_salts,
        "num_index_parts": num_index_parts, "id_col": id_col,
        "with_positions": False,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def build_index(
    corpus_path: str,
    index_dir: str,
    *,
    id_mode: str = "sorted_rank",       # or "column" when corpus already has doc_id
    id_col: str = "doc_id",
    text_col: str = "content",
    sort_keys: tuple[str, ...] = ("repo", "path", "commit"),
    hot_df_frac: float = 0.25,           # term is "hot" if df > frac * N
    num_shards: int = DEFAULT_SHARDS,
    num_salts: int = DEFAULT_SALTS,
    num_index_parts: int = DEFAULT_INDEX_PARTS,
    with_sha256: bool = True,
    with_positions: bool = True,
    tokenize_batch_size: int = 512,
    exclude_terms: tuple[str, ...] = (),   # M3 stopword amputation (opt-in)
) -> dict:
    """Run (or resume) the full build; returns the meta dict."""
    os.makedirs(index_dir, exist_ok=True)
    man = Manifest.load(os.path.join(index_dir, "manifest.json"))
    # exclude list is part of the lineage: a changed stopword set must
    # rebuild, not resume into mixed state
    excl_tag = ""
    if exclude_terms:
        import hashlib as _hl

        excl_tag = ":excl=" + _hl.sha256(
            "\n".join(sorted(exclude_terms)).encode()).hexdigest()[:16]
    lineage = (f"v{INDEX_FORMAT_VERSION}:pos={int(with_positions)}"
               f"{excl_tag}:{lineage_fingerprint([corpus_path])}")

    # empty corpus -> valid empty index (write_parquet of an empty Dataset
    # creates no directory at all, so every stage would 404)
    n_input_rows = pads.dataset(corpus_path).count_rows()
    if n_input_rows == 0:
        return _write_empty_index(index_dir, num_shards, num_salts,
                                  num_index_parts, id_col, hot_df_frac)

    tokens_dir = os.path.join(index_dir, "tokens")
    doclen_dir = os.path.join(index_dir, "doclen")
    dict_dir = os.path.join(index_dir, "dictionary")
    post_dir = os.path.join(index_dir, "postings")
    meta_path = os.path.join(index_dir, "meta.json")

    # ---- stage 1: tokenize (+ dense ids + sha256) --------------------
    if not man.is_done("tokens", lineage, tokens_dir):
        man.start("tokens", lineage, tokens_dir)
        shutil.rmtree(tokens_dir, ignore_errors=True)  # write_parquet appends
        if id_mode == "sorted_rank":
            corpus = load_corpus(corpus_path)
            corpus = zip_with_index(corpus, sort_keys=list(sort_keys), id_column=id_col)
        else:
            corpus = rd.read_parquet(corpus_path, columns=[id_col, text_col])
        # sha256 and tokenize are independent consumers of the corpus —
        # run both Dataset executions CONCURRENTLY (each alone
        # under-utilizes the cluster; wall = max, not sum).  The sha chain
        # is separate so hashes stay OUT of the tokenize lineage.
        import threading

        errs: list[BaseException] = []

        def _sha_job():
            try:
                sha = add_sha256(corpus, text_col=text_col)
                sha_dir = os.path.join(index_dir, "sha256")
                shutil.rmtree(sha_dir, ignore_errors=True)
                sha.select_columns([id_col, "sha256"]).write_parquet(sha_dir)
            except BaseException as e:  # surfaced after join
                errs.append(e)

        sha_thread = None
        if with_sha256:
            sha_thread = threading.Thread(target=_sha_job, daemon=True)
            sha_thread.start()
        tokens = tokenize_stage(corpus, text_col=text_col, id_col=id_col,
                                batch_size=tokenize_batch_size,
                                with_positions=with_positions,
                                exclude_terms=tuple(exclude_terms))
        tokens.write_parquet(tokens_dir)
        if not os.path.isdir(tokens_dir):
            # rows existed but EVERY doc tokenized to nothing (an empty
            # Dataset writes no files): fail loudly — downstream stages
            # would otherwise die in an obscure FileNotFoundError.  A
            # zero-ROW corpus takes the empty-markers fast path above.
            raise ValueError(
                f"corpus {corpus_path!r} has rows but tokenized to zero "
                "tokens — every doc is empty after the token filter; an "
                "index over it would serve nothing")
        if sha_thread is not None:
            sha_thread.join()
            if errs:
                # concurrent Dataset executions can fail transiently under
                # saturation — retry the side job serially once
                errs.clear()
                _sha_job()
                if errs:
                    raise errs[0]
            n_corpus_docs = int(
                pads.dataset(os.path.join(index_dir, "sha256")).count_rows())
        else:
            n_corpus_docs = int(rd.read_parquet(corpus_path).count())
        n_tokens = int(pads.dataset(tokens_dir).count_rows())
        # corpus row count recorded here: docs whose content tokenizes to
        # nothing still count toward BM25's N / avgdl (oracle parity)
        man.finish("tokens", token_rows=n_tokens, corpus_docs=n_corpus_docs)

    return _build_from_tokens(
        index_dir, man, lineage,
        hot_df_frac=hot_df_frac, num_shards=num_shards,
        num_salts=num_salts, num_index_parts=num_index_parts,
        id_col=id_col, with_positions=with_positions,
        exclude_terms=exclude_terms)


def _build_from_tokens(
    index_dir: str,
    man: Manifest,
    lineage: str,
    *,
    hot_df_frac: float,
    num_shards: int,
    num_salts: int,
    num_index_parts: int,
    id_col: str,
    with_positions: bool,
    exclude_terms: tuple[str, ...] = (),
    doc_id_space_floor: int = 0,
) -> dict:
    """Stages 2-7 of the build (vocab/hot → doclen ∥ postings → meta →
    dictionary), starting from an already-written ``index_dir/tokens``
    whose manifest entry records ``corpus_docs``.  Shared by the normal
    build and by delta compaction (pipelines/delta.py), which merges the
    token tables of main + deltas minus tombstones and skips
    re-tokenizing.  ``doc_id_space_floor`` keeps the compacted index's
    id space from shrinking below previously-issued ids (doc-store rows
    and future delta floors stay valid after deletions)."""
    tokens_dir = os.path.join(index_dir, "tokens")
    doclen_dir = os.path.join(index_dir, "doclen")
    dict_dir = os.path.join(index_dir, "dictionary")
    post_dir = os.path.join(index_dir, "postings")
    meta_path = os.path.join(index_dir, "meta.json")

    # read the token table in a BYTES-derived block count: every
    # downstream aggregate's cost scales with input block count
    # (BASELINE.md), so the floor stays at the measured 16-block sweet
    # spot and grows at ~256MB-on-disk per block beyond it (a 100x
    # token table no longer funnels through 16 blocks — round-2
    # verdict #4).  Each consumer reads ONLY its columns (doclen never
    # touches term/pos, vocab never touches pos — column pruning at the
    # read, SURVEY §7.4)
    from .._block import blocks_for_bytes, dir_bytes

    tok_blocks = blocks_for_bytes(dir_bytes(tokens_dir))

    def _tokens(columns, num_blocks=None):
        return rd.read_parquet(
            tokens_dir, columns=columns,
            override_num_blocks=num_blocks or tok_blocks)

    n_docs = int(man.stages["tokens"]["metrics"]["corpus_docs"])

    def _id_space_from_tokens(fallback: int) -> int:
        """Doc-id-space ceiling (max doc_id + 1) from parquet row-group
        statistics — metadata-only, no data scan.  Needed so hot-term
        SALTING stays balanced for column-mode ids that start far above
        the row count (every delta corpus does: its ids begin at the
        main index's doc_id_space, so a row-count-based salt bucketing
        would clip the whole delta into one salt)."""
        import pyarrow.dataset as pads

        mx = None
        try:
            for frag in pads.dataset(tokens_dir).get_fragments():
                md = frag.metadata
                if md is None:
                    return fallback
                ci = md.schema.to_arrow_schema().get_field_index("doc_id")
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    if not rg.num_rows:
                        continue
                    st = rg.column(ci).statistics
                    if st is None or st.max is None:
                        return fallback
                    mx = st.max if mx is None else max(mx, st.max)
        except Exception:
            return fallback
        return (int(mx) + 1) if mx is not None else fallback

    # ---- stage 2: vocab + hot-term sample (postings' only upstream) --
    vocab_dir = os.path.join(index_dir, "vocab")
    if not man.is_done("vocab", lineage, vocab_dir):
        man.start("vocab", lineage, vocab_dir)
        shutil.rmtree(vocab_dir, ignore_errors=True)
        # string-keyed groupby: the combine level pays here; the
        # 16-block floor is the measured sweet spot (16 cpus/250k:
        # nb16+cb8 5.1s vs nb32+cb8 7.0s), bytes take over beyond it
        def _vocab_run():
            vocab_table(_tokens(["doc_id", "term"]),
                        combine_blocks=8).write_parquet(vocab_dir)
        try:
            _vocab_run()
        except Exception:
            # transient worker failures (e.g. ImportError under heavy
            # concurrent executions) — clean retry once
            shutil.rmtree(vocab_dir, ignore_errors=True)
            _vocab_run()
        hot = hot_terms_from_vocab(
            rd.read_parquet(vocab_dir), n_docs, hot_df_frac)
        with open(os.path.join(index_dir, "hot_terms.json"), "w") as f:
            json.dump({str(k): v for k, v in hot.items()}, f)
        with open(os.path.join(index_dir, "hot_terms.json")) as f:
            man.finish("vocab", hot_terms=len(json.load(f)))
    with open(os.path.join(index_dir, "hot_terms.json")) as f:
        hot_ids = {int(k): v for k, v in json.load(f).items()}

    # ---- stages 3-5: (doclen -> meta) ∥ postings ----------------------
    # postings depends only on the hot-term set; doc lengths + meta are
    # independent of it — overlapping them hides the doclen scan behind
    # the posting shuffle entirely (wall = postings at >=8 cpus; at low
    # cpu counts the executor time-slices and wall ~= the work sum)
    import threading

    run_doclen = not man.is_done("doclen", lineage, doclen_dir)
    run_meta = not man.is_done("meta", lineage, meta_path)
    run_post = not man.is_done("postings", lineage, post_dir)
    errs: list[BaseException] = []

    def _doclen_meta_job():
        try:
            if run_doclen:
                shutil.rmtree(doclen_dir, ignore_errors=True)
                # 16-block floor: measured sweet spot between read
                # parallelism and sort-aggregate block-count overhead
                # (16 cpus/250k: nb8 6.6s, nb16 4.5s, nb32 6.2s);
                # bytes-derived beyond it
                doc_lengths(_tokens(["doc_id", "tf"]),
                            combine_blocks=0).write_parquet(doclen_dir)
            if run_meta:
                import pyarrow.compute as pc

                dl_tbl = pads.dataset(doclen_dir).to_table()
                # N counts every corpus row, including docs with zero
                # valid tokens (they appear in no posting list but still
                # shape N and avgdl)
                total_tokens = int(
                    dl_tbl.column("dl").combine_chunks().cast("int64")
                    .sum().as_py() or 0)
                avgdl = total_tokens / n_docs if n_docs else 0.0
                dl_size = (int(pc.max(dl_tbl.column("doc_id")).as_py()) + 1
                           if dl_tbl.num_rows else 0)
                meta = {
                    "num_docs": n_docs,
                    "doc_id_space": max(dl_size, n_docs, doc_id_space_floor),
                    "total_tokens": total_tokens,
                    "avgdl": avgdl,
                    "k1": K1,
                    "b": B,
                    "hot_df_frac": hot_df_frac,
                    "hot_term_ids": {str(k): v for k, v in hot_ids.items()},
                    "num_shards": num_shards,
                    "num_salts": num_salts,
                    "num_index_parts": num_index_parts,
                    "id_col": id_col,
                    "with_positions": with_positions,
                    "exclude_terms": sorted(exclude_terms),
                }
                with open(meta_path + ".tmp", "w") as f:
                    json.dump(meta, f, indent=1)
                os.replace(meta_path + ".tmp", meta_path)
        except BaseException as e:
            errs.append(e)

    def _postings_job():
        try:
            shutil.rmtree(post_dir, ignore_errors=True)
            post_cols = ["doc_id", "term", "tf"] + (
                ["pos"] if with_positions else [])
            post = build_postings(
                _tokens(post_cols),
                hot_term_ids=hot_ids,
                # the SALT bucketing spreads over the id SPACE, not the
                # row count (column-mode/delta ids start above n_docs)
                num_docs=max(n_docs, doc_id_space_floor,
                             _id_space_from_tokens(n_docs)),
                num_shards=num_shards,
                num_salts=num_salts,
                num_index_parts=num_index_parts,
                # tokens already read in 16 blocks; an extra Repartition
                # operator would reserve executor resources for nothing
                coalesce_blocks=0,
            )
            # global term_id sort -> row-group statistics prune
            # query-time term lookups inside each part directory
            post.sort("term_id").write_parquet(
                post_dir, partition_cols=["part"], row_group_size=2048)
        except BaseException as e:
            errs.append(e)

    threads = []
    if run_doclen or run_meta:
        if run_doclen:
            man.start("doclen", lineage, doclen_dir)
        if run_meta:
            man.start("meta", lineage, meta_path)
        threads.append(threading.Thread(target=_doclen_meta_job, daemon=True))
    if run_post:
        man.start("postings", lineage, post_dir)
        threads.append(threading.Thread(target=_postings_job, daemon=True))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        # transient failure under concurrent executions: rerun both
        # serially once before giving up
        errs.clear()
        if run_doclen or run_meta:
            _doclen_meta_job()
        if run_post:
            _postings_job()
        if errs:
            raise errs[0]
    if run_doclen:
        man.finish("doclen", **_partition_metrics(doclen_dir))
    if run_meta:
        man.finish("meta", num_docs=n_docs, hot_terms=len(hot_ids))
    if run_post:
        man.finish("postings", **_partition_metrics(post_dir))

    with open(meta_path) as f:
        meta = json.load(f)

    # ---- stage 7: dictionary (derived from posting rows) -------------
    if not man.is_done("dictionary", lineage, dict_dir):
        man.start("dictionary", lineage, dict_dir)

        def _dict_run():
            shutil.rmtree(dict_dir, ignore_errors=True)
            dictionary_from_postings(
                rd.read_parquet(post_dir, columns=["term_id", "df", "cf"]),
                rd.read_parquet(vocab_dir),
            ).write_parquet(dict_dir)
        try:
            _dict_run()
        except Exception:
            _dict_run()  # clean retry once (transient worker failures)
        man.finish("dictionary", **_partition_metrics(dict_dir))

    return meta
