"""Posting-level merge compaction: fold main + deltas + tombstones into
a fresh standalone index WITHOUT re-shuffling tokens.

The reference's only maintenance path is a from-scratch pipeline rerun
(/root/reference/DyableCommand/DyableCommand.cpp:641-724).  Its on-disk
layout, though, is built for cheap merging — per-term doc-ordered
posting lists — and this module exploits exactly that (the same idea as
Lucene segment merging): every segment's encoded posting rows are
already term-partitioned and doc-ordered, and segment doc-id ranges are
disjoint and ascending (add_documents enforces ids >= the covered
doc_id_space), so compaction is ONE streaming map over posting rows:

- decode each row's doc gaps (vectorized over the whole Arrow batch —
  one decode_varints call per column, no per-row Python),
- drop tombstoned docs,
- re-encode rows that changed; rows untouched by tombstones pass
  through VERBATIM (blob bytes copied, never decoded past doc ids),
- renumber ``salt`` segment-major so each term's sub-rows stay
  doc-range-disjoint and salt-ordered (the reader concatenates a
  term's rows in salt order — query.py posting_rows).

There is NO groupby/sort/all-to-all anywhere: cost is O(index bytes)
streaming, embarrassingly parallel per block, versus the token-level
rebuild's full posting shuffle.  doclen / sha256 / tokens are the same
streaming union+filter; only the dictionary (vocabulary-cardinality)
re-aggregates.

Trade-off (documented, same as Lucene): a term present in K segments
keeps K sub-rows in the compacted index — queries pay a K-way concat
exactly as MergedIndexReader did, but from ONE directory, ONE
dictionary, ONE doclen table, and with tombstones physically gone.  A
token-level rebuild (pipelines/delta.compact_index mode="rebuild")
re-packs every term into minimal rows when that matters.  Measured at
100k docs / 3 segments: merge-compacted BM25 p50 0.43 ms vs rebuilt
0.27 ms, rank-identical (BASELINE.md §4a-r3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import ray
import ray.data as rd

from ..codec import decode_positions, decode_varints, encode_term_partition
from ..state.manifest import Manifest, lineage_fingerprint


class MergeIncompatible(Exception):
    """Segments cannot be merge-compacted (caller may fall back to a
    token-level rebuild)."""


def _slab(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(contiguous byte slab, per-cell offsets) of a binary column.

    Arrow binary cells are adjacent within the values buffer, so the
    slice covering [offs[0], offs[-1]) is the concatenation of every
    cell — one decode_varints call decodes the whole column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off_width = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    raw = np.frombuffer(arr.buffers()[1], dtype=off_width)
    offs = raw[arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    buf = arr.buffers()[2]
    if buf is None:                      # all-empty / zero-row column
        return np.empty(0, np.uint8), offs - (offs[0] if len(offs) else 0)
    data = np.frombuffer(buf, dtype=np.uint8)
    return data[offs[0]:offs[-1]], offs - offs[0]


def _np(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False)


def _merge_batch(batch: pa.Table, tomb_ref, salt_stride: int,
                 out_parts: int, target_schema: pa.Schema) -> pa.Table:
    """One streaming unit of the posting merge (see module docstring)."""
    seg = _np(batch["seg"]).astype(np.int64)
    tid = _np(batch["term_id"]).astype(np.int64)
    salt = _np(batch["salt"]).astype(np.int64)
    dfs = _np(batch["df"]).astype(np.int64)
    new_salt = (seg * salt_stride + salt).astype(np.uint8)
    part = (tid % np.int64(out_parts)).astype(np.int32)

    has_pos = "pos_blob" in batch.column_names
    has_aux = "aux_blob" in batch.column_names

    # decode doc ids (always needed: the tombstone test is per doc)
    doc_bytes, _ = _slab(batch["doc_blob"])
    gaps = decode_varints(doc_bytes)
    row_offs = np.concatenate(([0], np.cumsum(dfs)))
    row_starts = row_offs[:-1]
    c = np.cumsum(gaps, dtype=np.uint64)
    base = np.repeat(c[row_starts] - gaps[row_starts], dfs)
    docs = c - base

    tomb = ray.get(tomb_ref)        # sorted uint64
    if len(tomb):
        idx = np.searchsorted(tomb, docs)
        idx[idx == len(tomb)] = 0   # clamp; compared value then mismatches
        dead = tomb[idx] == docs
    else:
        dead = np.zeros(len(docs), dtype=bool)

    def _passthrough(row_mask: np.ndarray | None = None) -> pa.Table:
        sel = (np.flatnonzero(row_mask) if row_mask is not None
               else np.arange(batch.num_rows))
        cols = {}
        for f in target_schema.names:
            if f == "salt":
                cols[f] = pa.array(new_salt[sel], pa.uint8())
            elif f == "part":
                cols[f] = pa.array(part[sel], pa.int32())
            elif row_mask is not None:
                cols[f] = batch[f].take(pa.array(sel))
            else:
                cols[f] = batch[f]
        return pa.table(cols).cast(target_schema)

    if not dead.any():
        return _passthrough()

    # --- split at ROW granularity: only term rows that actually contain
    # a tombstoned doc re-encode; the rest copy verbatim (at scale,
    # tombstones are sparse but widespread — batch granularity would
    # re-encode nearly every byte).  When MOST rows are dirty (dense
    # tombstones), the split's take/concat/re-sort overhead exceeds its
    # savings — re-encode the whole batch in one pass instead.
    rows_dead = np.add.reduceat(dead.astype(np.int64), row_starts) > 0
    if rows_dead.mean() > 0.5:
        rows_dead = np.ones(len(rows_dead), dtype=bool)
    clean = _passthrough(~rows_dead)

    # --- re-encode path over the dead rows only -------------------------
    # tf/aux/pos decode is restricted to the DEAD rows' blob cells (the
    # clean majority's bytes pass through verbatim, never decoded past
    # doc ids — the sparse-but-widespread tombstone regime would
    # otherwise decode nearly the whole index for nothing)
    dead_idx = np.flatnonzero(rows_dead)
    dfs_dead = dfs[dead_idx]
    in_dead = np.repeat(rows_dead, dfs)
    dead_sub = dead[in_dead]                # per-posting flags, dead rows
    keep_d = ~dead_sub                      # surviving postings of dead rows
    sub_offs = np.concatenate(([0], np.cumsum(dfs_dead)))
    new_dfs = np.add.reduceat(keep_d.astype(np.int64), sub_offs[:-1]) \
        if len(dead_idx) else np.empty(0, np.int64)
    live_rows = new_dfs > 0                 # per dead row

    def _slab_rows(col, rows: np.ndarray) -> np.ndarray:
        data, offs = _slab(col)
        pieces = [data[offs[i]:offs[i + 1]] for i in rows]  # O(dead rows)
        return np.concatenate(pieces) if pieces else np.empty(0, np.uint8)

    docs_dead = docs[in_dead]
    tfs_dead = decode_varints(_slab_rows(batch["tf_blob"], dead_idx))
    aux_dead = (decode_varints(_slab_rows(batch["aux_blob"], dead_idx))
                if has_aux else None)
    pos_dead = None
    if has_pos:
        pos_bytes = _slab_rows(batch["pos_blob"], dead_idx)
        pos_dead, _ = decode_positions(pos_bytes.tobytes(), tfs_dead)
    docs_f, tfs_f = docs_dead[keep_d], tfs_dead[keep_d]
    aux_f = aux_dead[keep_d] if has_aux else None
    pos_f = (pos_dead[np.repeat(keep_d, tfs_dead.astype(np.int64))]
             if has_pos else None)

    term_starts = np.concatenate(([0], np.cumsum(new_dfs[live_rows])))
    cols = encode_term_partition(term_starts, docs_f, tfs_f.astype(np.uint64),
                                 positions=pos_f, aux=aux_f)
    first = term_starts[:-1]
    n_out = len(first)
    cf = (np.add.reduceat(tfs_f.astype(np.int64), first) if n_out
          else np.empty(0, np.int64))
    dead_rows_idx = dead_idx[live_rows]
    out = {
        "term_id": pa.array(tid[dead_rows_idx], pa.int64()),
        "salt": pa.array(new_salt[dead_rows_idx], pa.uint8()),
        "cf": pa.array(cf, pa.int64()),
        "part": pa.array(part[dead_rows_idx], pa.int32()),
        **cols,
    }
    if has_aux:
        out["acf"] = pa.array(
            np.add.reduceat(aux_f.astype(np.int64), first) if n_out
            else np.empty(0, np.int64), pa.int64())
    reenc = pa.table(out).select(target_schema.names).cast(target_schema)
    if clean.num_rows == 0:
        return reenc              # row order unchanged -> already sorted
    # restore (term_id, salt) order within the block so per-file
    # row-group statistics keep pruning term lookups
    return pa.concat_tables([clean, reenc]).sort_by(
        [("term_id", "ascending"), ("salt", "ascending")])


def _segment_postings(seg_dirs: list[str]) -> tuple[rd.Dataset, pa.Schema]:
    """Union of every segment's posting rows + a ``seg`` ordinal column;
    also returns the canonical OUTPUT schema (input schema with the
    hive ``part`` re-typed int32)."""
    schema0 = None
    parts = []
    for i, d in enumerate(seg_dirs):
        post = os.path.join(d, "postings")
        sch = pads.dataset(post, partitioning="hive").schema
        cols = [n for n in sch.names if n != "part"]
        if schema0 is None:
            fields = [sch.field(n) for n in cols]
            # canonical column order: identity, then blobs (matches the
            # fresh-build writer enough for downstream readers, which
            # select by name)
            schema0 = pa.schema(fields).append(pa.field("part", pa.int32()))
        elif set(cols) != set(n for n in schema0.names if n != "part"):
            raise MergeIncompatible(
                f"posting schema mismatch: {d} has {sorted(cols)}, "
                f"expected {sorted(n for n in schema0.names if n != 'part')}")
        ds = rd.read_parquet(post, columns=cols)
        ds = ds.map_batches(
            lambda b, _i=i: b.append_column(
                "seg", pa.array(np.full(b.num_rows, _i, np.int64))),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        parts.append(ds)
    ds = parts[0]
    if len(parts) > 1:
        ds = ds.union(*parts[1:])
    # reorder to identity-first like the fresh build writes
    ident = [n for n in ("term_id", "salt", "cf", "part") if n in schema0.names]
    rest = [n for n in schema0.names if n not in ident]
    target = pa.schema([schema0.field(n) for n in ident + rest])
    return ds, target


def merge_compact_index(main_index_dir: str, out_dir: str,
                        delta_dirs: list[str] | None = None,
                        carry_tokens: bool = True) -> dict:
    """Merge-compact ``main_index_dir`` (+ deltas + tombstones) into a
    fresh standalone index at ``out_dir``; returns the new meta dict.
    Raises MergeIncompatible when segments cannot be blob-merged (the
    caller falls back to the token-level rebuild)."""
    from ..stages.dictionary import dictionary_from_postings, _add_id
    from .build_index import INDEX_FORMAT_VERSION, K1, B, _partition_metrics
    from .delta import _tombstone_path, list_delta_dirs, load_tombstones

    if os.path.abspath(out_dir) == os.path.abspath(main_index_dir):
        raise ValueError("compaction must write to a NEW directory — "
                         "compacting in place would destroy the inputs "
                         "it is still reading")
    if delta_dirs is None:
        delta_dirs = list_delta_dirs(main_index_dir)
    segments = [main_index_dir] + list(delta_dirs)
    metas = []
    for s in segments:
        with open(os.path.join(s, "meta.json")) as f:
            metas.append(json.load(f))
    # empty segments carry no postings dir — drop them from the merge
    live = [(s, m) for s, m in zip(segments, metas)
            if m["num_docs"] > 0
            and os.path.isdir(os.path.join(s, "postings"))]
    if not live:
        raise MergeIncompatible("no non-empty segments to merge")
    main_meta = live[0][1]
    # segment ordinals must follow DOC RANGE, not directory-name order
    # (deltas are auto-discovered by fingerprint name): ranges are
    # disjoint (add_documents enforces the floor), so doc_id_space is a
    # total order — this keeps each term's salt-ordered sub-rows
    # doc-ascending, matching the fresh-build invariant
    live.sort(key=lambda sm: sm[1]["doc_id_space"])
    segments = [s for s, _ in live]
    metas = [m for _, m in live]

    wp = {bool(m.get("with_positions", True)) for m in metas}
    if len(wp) != 1:
        raise MergeIncompatible("segments disagree on with_positions")
    id_cols = {m.get("id_col", "doc_id") for m in metas}
    if len(id_cols) != 1:
        raise MergeIncompatible(f"segments disagree on id_col: {id_cols}")
    salt_stride = max(m["num_salts"] for m in metas)
    if salt_stride * len(segments) > 256:
        raise MergeIncompatible(
            f"{len(segments)} segments x {salt_stride} salts overflows the "
            "uint8 salt channel — rebuild instead (or compact in stages)")

    tomb = load_tombstones(main_index_dir)
    space_floor = max(m["doc_id_space"] for m in metas)
    # the alive count below is a pure subtraction, so a tombstone id
    # outside the covered space would silently skew N/avgdl forever —
    # mirror TombstoneReader's loud range check here
    if tomb:
        lo_t, hi_t = min(tomb), max(tomb)
        if lo_t < 0 or hi_t >= space_floor:
            raise ValueError(
                f"tombstone id {hi_t if hi_t >= space_floor else lo_t} "
                f"outside the segments' doc-id space ({space_floor}); "
                "only indexed doc ids may be deleted")
    alive_docs = sum(m["num_docs"] for m in metas) - len(tomb)
    out_parts = main_meta["num_index_parts"]
    id_col = id_cols.pop()

    lineage = ("merge-compact:v%d:%s" % (INDEX_FORMAT_VERSION,
               lineage_fingerprint(
                   [os.path.join(s, "postings") for s in segments]
                   + [_tombstone_path(main_index_dir)])))
    os.makedirs(out_dir, exist_ok=True)
    man = Manifest.load(os.path.join(out_dir, "manifest.json"))
    tomb_arr = np.sort(np.fromiter(tomb, np.uint64, len(tomb)))
    tomb_ref = ray.put(tomb_arr)

    def _union_filtered(sub: str, filter_ids: bool) -> rd.Dataset | None:
        """Streaming union of one stage dir across segments, tombstoned
        rows dropped (matching on ``id_col``/doc_id)."""
        import pyarrow.compute as pc

        srcs = [os.path.join(s, sub) for s in segments
                if os.path.isdir(os.path.join(s, sub))]
        if not srcs:
            return None
        files = sorted(
            os.path.join(r, f)
            for src in srcs for r, _, fs in os.walk(src) for f in fs
            if f.endswith(".parquet"))
        ds = rd.read_parquet(files)
        if filter_ids and len(tomb):
            ts = pa.array(tomb_arr, pa.uint64())
            # token/doclen tables are ALWAYS keyed "doc_id" (tokenize
            # emits doc_id regardless of id_col); only the sha table
            # carries the source id column
            key = id_col if sub == "sha256" else "doc_id"

            def _drop(b: pa.Table) -> pa.Table:
                return b.filter(pc.invert(pc.is_in(
                    b[key].cast(pa.uint64()), value_set=ts)))

            ds = ds.map_batches(_drop, batch_format="pyarrow",
                                zero_copy_batch=True)
        return ds

    # ---- postings: the one-pass blob merge ----------------------------
    post_dir = os.path.join(out_dir, "postings")
    if not man.is_done("postings", lineage, post_dir):
        man.start("postings", lineage, post_dir)
        shutil.rmtree(post_dir, ignore_errors=True)
        ds, target = _segment_postings(segments)
        merged = ds.map_batches(
            lambda b: _merge_batch(b, tomb_ref, salt_stride, out_parts,
                                   target),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        merged.write_parquet(post_dir, partition_cols=["part"],
                             row_group_size=2048)
        man.finish("postings", **_partition_metrics(post_dir))

    # ---- doclen + meta -------------------------------------------------
    doclen_dir = os.path.join(out_dir, "doclen")
    meta_path = os.path.join(out_dir, "meta.json")
    if not man.is_done("meta", lineage, meta_path):
        man.start("meta", lineage, meta_path)
        shutil.rmtree(doclen_dir, ignore_errors=True)
        _union_filtered("doclen", True).write_parquet(doclen_dir)
        dl_ds = rd.read_parquet(doclen_dir)
        total_tokens = int(dl_ds.sum("dl") or 0)
        # segment-type-specific keys (with_fields, title_len, …) carry
        # over from the main meta; everything recomputable is recomputed
        meta = dict(main_meta)
        meta.update({
            "num_docs": alive_docs,
            "doc_id_space": space_floor,
            "total_tokens": total_tokens,
            "avgdl": total_tokens / alive_docs if alive_docs else 0.0,
            "k1": main_meta.get("k1", K1),
            "b": main_meta.get("b", B),
            "hot_df_frac": main_meta.get("hot_df_frac", 0.25),
            # hot sets were per-segment build-time routing; the merged
            # index keeps each segment's salted sub-rows as-is, so the
            # union of hot ids is advisory metadata only
            "hot_term_ids": {k: v for m in metas
                             for k, v in m.get("hot_term_ids", {}).items()},
            "num_shards": main_meta["num_shards"],
            "num_salts": salt_stride * len(segments),
            "num_index_parts": out_parts,
            "id_col": id_col,
            "with_positions": wp.pop(),
            "exclude_terms": sorted({t for m in metas
                                     for t in m.get("exclude_terms", [])}),
            "compacted_from": len(segments),
        })
        if "adl" in pads.dataset(doclen_dir).schema.names:
            # unified field index: anchor length total must track the
            # surviving docs too (BM25F's avgdlc depends on it)
            meta["total_anchor_tokens"] = int(dl_ds.sum("adl") or 0)
        with open(meta_path + ".tmp", "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(meta_path + ".tmp", meta_path)
        man.finish("meta", num_docs=alive_docs, total_tokens=total_tokens)

    # ---- vocab (union) + dictionary (from merged postings) ------------
    vocab_dir = os.path.join(out_dir, "vocab")
    dict_dir = os.path.join(out_dir, "dictionary")
    if not man.is_done("dictionary", lineage, dict_dir):
        man.start("dictionary", lineage, dict_dir)
        shutil.rmtree(vocab_dir, ignore_errors=True)
        shutil.rmtree(dict_dir, ignore_errors=True)
        from ray.data.aggregate import Sum

        vocab_union = _union_filtered("vocab", False)
        if vocab_union is None:
            # segments without a vocab dir (e.g. the unified field
            # index): synthesize term<->term_id from the segment
            # dictionaries; exact df stands in for the sampled df (the
            # hot set derived from it is advisory routing metadata)
            dicts = _union_filtered("dictionary", False)
            if dicts is not None:
                vocab_union = dicts.map_batches(
                    lambda b: pa.table({"term": b["term"],
                                        "df_sample": b["df"]}),
                    batch_format="pyarrow", batch_size=None,
                    zero_copy_batch=True)
        if vocab_union is not None:
            (vocab_union.groupby("term")
             .aggregate(Sum("df_sample", alias_name="df_sample"))
             .map_batches(_add_id, batch_format="pyarrow", batch_size=None)
             .write_parquet(vocab_dir))
            dictionary_from_postings(
                rd.read_parquet(post_dir, columns=["term_id", "df", "cf"]),
                rd.read_parquet(vocab_dir),
            ).write_parquet(dict_dir)
        man.finish("dictionary", **_partition_metrics(dict_dir))

    # ---- sha256 + tokens: streaming carry-over -------------------------
    # declare the tokens output path ONLY when the stage will create it
    # (carry_tokens=False or no segment has a tokens dir): a declared
    # path that never exists would fail is_done forever and re-run the
    # sha carry-over on every invocation
    tokens_out = (os.path.join(out_dir, "tokens")
                  if carry_tokens and any(
                      os.path.isdir(os.path.join(s, "tokens"))
                      for s in segments)
                  else None)
    if not man.is_done("tokens", lineage, tokens_out):
        man.start("tokens", lineage, tokens_out)
        n_tok = 0
        sha = _union_filtered("sha256", True)
        if sha is not None:
            sha_dir = os.path.join(out_dir, "sha256")
            shutil.rmtree(sha_dir, ignore_errors=True)
            sha.write_parquet(sha_dir)
        if carry_tokens:
            tok = _union_filtered("tokens", True)
            if tok is not None:
                tokens_dir = os.path.join(out_dir, "tokens")
                shutil.rmtree(tokens_dir, ignore_errors=True)
                tok.write_parquet(tokens_dir)
                n_tok = int(pads.dataset(tokens_dir).count_rows())
        # corpus_docs recorded like the build's stage 1 so a later
        # token-level rebuild over this index can resume from here
        man.finish("tokens", token_rows=n_tok, corpus_docs=alive_docs)

    with open(meta_path) as f:
        return json.load(f)


def _doclen_doc_range(index_dir: str) -> tuple[int, int] | None:
    """(min_doc_id, max_doc_id) of a segment from its doclen parquet
    ROW-GROUP STATISTICS — O(file metadata), no data read; None for an
    empty segment."""
    import pyarrow.parquet as pq

    d = os.path.join(index_dir, "doclen")
    lo, hi = None, None
    for f in pads.dataset(d).files:
        md = pq.ParquetFile(f).metadata
        ci = {md.schema.column(i).name: i for i in range(md.num_columns)}
        col = ci["doc_id"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            if st is None or not st.has_min_max:
                # stats missing: fall back to reading just doc_id
                t = pads.dataset(d).to_table(columns=["doc_id"])
                if len(t) == 0:
                    return None
                arr = t.column("doc_id").to_numpy(zero_copy_only=False)
                return int(arr.min()), int(arr.max())
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return None
    return int(lo), int(hi)


def merge_indexes(index_dirs: list[str], out_dir: str) -> dict:
    """Merge INDEPENDENTLY BUILT indexes over disjoint doc-id ranges
    into one standalone index — the parallel-partial-build path at
    scale: shard the corpus by doc-id range, build each shard's index
    in its own job (embarrassingly parallel, no cross-shard traffic),
    then fold the shard indexes together with the same posting-level
    blob merge delta compaction uses (ONE streaming map over posting
    rows, no token shuffle; global N/avgdl/df recomputed exactly).
    The merged index is rank-identical to a single build over the
    whole corpus (asserted in tests/test_compaction_kernel.py).
    Reference analog: the external k-way merge of sorted hit runs
    (SURVEY O3; /root/reference/DyableDatabase sorted-run merging),
    lifted from intra-build runs to whole prebuilt indexes.

    Loud validation (each a silent-corruption risk if skipped):
    - >= 2 segments, none tombstoned (compact those first — this
      merge carries no per-segment tombstone semantics),
    - doc-id ranges pairwise DISJOINT (two rank-derived indexes both
      starting at 0 would interleave, breaking the doc-ascending
      posting invariant the blob merge relies on).
    """
    from .delta import list_delta_dirs

    if len(index_dirs) < 2:
        raise ValueError("merge_indexes needs >= 2 index dirs")
    for d in index_dirs:
        if os.path.exists(os.path.join(d, "tombstones.json")):
            raise ValueError(
                f"{d} has tombstones — compact it first "
                "(compact_index) and merge the compacted result")
        if list_delta_dirs(d):
            raise ValueError(
                f"{d} has pending delta segments (deltas/) — merging "
                "would silently drop those docs; compact it first "
                "(compact_index) and merge the compacted result")
    ranges: list[tuple[int, int, str]] = []
    for d in index_dirs:
        r = _doclen_doc_range(d)
        if r is not None:
            ranges.append((r[0], r[1], d))
    if not ranges:
        raise MergeIncompatible("no non-empty segments to merge")
    ranges.sort()
    for (_, hi_a, a), (lo_b, _, b) in zip(ranges, ranges[1:]):
        if lo_b <= hi_a:
            raise ValueError(
                f"doc-id ranges overlap: {a} ends at {hi_a}, {b} "
                f"starts at {lo_b} — shard indexes must cover disjoint "
                "doc-id ranges (build with explicit id column ranges)")
    # merge_compact_index orders segments by meta doc_id_space (the
    # invariant delta compaction relies on); a segment whose recorded
    # space CEILING overhangs the next segment's live range (e.g. a
    # compacted index keeps its pre-deletion ceiling) would be
    # re-sorted past it, interleaving doc ids and silently corrupting
    # the doc-ascending posting invariant — require space <= next lo.
    spaces = []
    for _, _, d in ranges:
        with open(os.path.join(d, "meta.json")) as f:
            spaces.append(json.load(f)["doc_id_space"])
    for (sp_a, (_, _, a)), (lo_b, _, b) in zip(zip(spaces, ranges),
                                               ranges[1:]):
        if sp_a > lo_b:
            raise ValueError(
                f"{a} records doc_id_space {sp_a} overhanging {b}'s "
                f"range start {lo_b} — its id-space ceiling exceeds its "
                "live docs (e.g. post-deletion compaction kept the old "
                "ceiling); rebuild that shard over a contiguous id "
                "range before merging")
    ordered = [d for _, _, d in ranges]
    return merge_compact_index(ordered[0], out_dir,
                               delta_dirs=ordered[1:])
