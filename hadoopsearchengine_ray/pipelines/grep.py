"""Trigram substring / regex search over the code corpus.

The reference engine retrieves by tokenized words only (hits keyed by
word id, /root/reference/DyableIndex/ hit lists; word lookup
DyableRequest/.../TextStringServer.h) — a user grepping for an exact
code fragment (``"for (int i"``, an identifier substring, a regex) has
no index to use.  This module adds the code-search capability the
input corpus calls for: a Google-Code-Search-style trigram index
(R. Cox, "Regular Expression Matching with a Trigram Index", 2012 —
public write-up of the codesearch.google.com design), expressed
Ray-Data-first:

- **Build**: ``map_batches`` extracts each doc's UNIQUE byte trigrams
  with a fully vectorized numpy kernel (one pass over the Arrow string
  buffer, no per-row Python), then ONE range shuffle
  (``sort(bucket, gram, doc_id)``) co-locates each trigram's postings,
  and a second ``map_batches`` delta-gap varint encodes per-gram doc-id
  runs (reusing the main index's codec).  Output is hive-partitioned
  Parquet (``bucket=gram % NUM_BUCKETS``) with gram-sorted row groups,
  so a query touches only the row groups statistics admit.
- **Skew**: stopword-scale trigrams ("  t", "e  ") are handled two
  ways: a gram's postings may span block boundaries (each block emits
  its own sorted SEGMENT row; the reader merges), so no single task
  ever holds a whole hot gram; and the query planner intersects only
  the ``max_and`` RAREST required trigrams (any subset of required
  grams still yields a candidate SUPERSET), so a hot gram's postings
  are simply never read.  The global df table that drives the planner
  is bounded by the gram space itself (<= 2^24 rows) regardless of
  corpus size.
- **Verify**: trigram candidates are a superset; actual matches are
  confirmed with RE2 (``pyarrow.compute.match_substring[_regex]``),
  size-dispatched: a driver-side pruned fetch for small candidate
  sets, a broadcast-filter ``map_batches`` streaming scan for large
  ones, and a loud full-scan fallback when the pattern yields no
  required trigram (< 3 bytes of required literal).

DuckDB's ``contains`` / ``regexp_matches`` are exact oracles (DuckDB
regexps are RE2 too, so regex semantics agree with the verify stage).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..codec import (
    _binary_from_offsets,
    decode_varints,
    encode_varints,
    varint_sizes,
)

NUM_BUCKETS = 64          # gram % NUM_BUCKETS hive partitions
MAX_AND = 8               # rarest required grams intersected per clause
DRIVER_FETCH_CAP = 65_536  # candidates above this verify distributed


# ---------------------------------------------------------------------------
# build


def _ensure_typed(out_dir: str, schema: pa.Schema) -> None:
    """Guarantee a readable typed dataset even for a token-less corpus
    (the packed_shards empty-schema lesson): if the writer emitted no
    parquet files, park one empty file with the right schema."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for _root, _dirs, files in os.walk(out_dir):
        if any(f.endswith(".parquet") for f in files):
            return
    pq.write_table(schema.empty_table(),
                   os.path.join(out_dir, "empty.parquet"))


def _fold_str(s: str) -> str:
    """Lowercase a pattern with the SAME kernel the build and the
    verify stage use (Arrow ``utf8_lower``, utf8proc simple mapping).
    Using one fold everywhere is what makes the casefolded index sound:
    a build-side ASCII-only fold paired with a Unicode-lower verify
    would prune docs the declared ``contains(lower(text),
    lower(pattern))`` semantics match (e.g. ``RÉSUMÉ`` vs ``résumé``).
    Python's ``str.lower`` is NOT equivalent (full case mapping, e.g.
    ``İ`` -> two codepoints), hence the Arrow round-trip here."""
    import pyarrow.compute as pc

    return pc.utf8_lower(pa.array([s], pa.string()))[0].as_py()


def _trigram_rows_fn(text_col: str, id_col: str, num_buckets: int,
                     casefold: bool = False):
    """Vectorized per-batch (gram, doc_id, bucket) extraction.

    One numpy pass over the shared UTF-8 buffer of the Arrow string
    column: trigram codes are three shifted byte loads; per-doc
    uniqueness is one ``np.unique`` over packed (row, gram) keys."""

    empty = pa.table({
        "gram": pa.array([], pa.int32()),
        "doc_id": pa.array([], pa.int64()),
        "bucket": pa.array([], pa.int32()),
    })

    def _fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return empty
        col = pc.fill_null(batch[text_col].combine_chunks(), "")
        if casefold:
            # fold the TEXT, not the bytes: grams must come from the
            # exact string the verify stage lowercases (utf8_lower)
            col = pc.utf8_lower(col)
        s = col.cast(pa.large_string())
        bufs = s.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64)[
            s.offset: s.offset + len(s) + 1]
        counts = np.maximum(offs[1:] - offs[:-1] - 2, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        cum = np.cumsum(counts)
        row_rep = np.repeat(np.arange(len(s), dtype=np.int64), counts)
        pos = offs[:-1][row_rep] + (np.arange(total) -
                                    np.repeat(cum - counts, counts))
        codes = ((data[pos].astype(np.uint32) << 16)
                 | (data[pos + 1].astype(np.uint32) << 8)
                 | data[pos + 2].astype(np.uint32))
        key = (row_rep << 24) | codes.astype(np.int64)
        uq = np.unique(key)
        row_idx = uq >> 24
        gram = (uq & 0xFFFFFF).astype(np.int32)
        ids = batch[id_col].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "gram": pa.array(gram),
            "doc_id": pa.array(ids[row_idx], pa.int64()),
            "bucket": pa.array(gram % np.int32(num_buckets)),
        })

    return _fn


def _encode_block(batch: pa.Table) -> pa.Table:
    """Encode a (bucket, gram, doc_id)-sorted block into per-gram
    delta-varint posting segments.  A gram split across block
    boundaries yields one segment per block; the reader merges."""
    if batch.num_rows == 0:
        return pa.table({
            "bucket": pa.array([], pa.int32()),
            "gram": pa.array([], pa.int32()),
            "df": pa.array([], pa.int64()),
            "doc_blob": pa.array([], pa.binary()),
        })
    grams = batch["gram"].combine_chunks().to_numpy(zero_copy_only=False)
    docs = batch["doc_id"].combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64)
    run_start = np.flatnonzero(np.diff(grams) != 0) + 1
    starts = np.concatenate(([0], run_start))
    deltas = np.empty_like(docs)
    deltas[1:] = docs[1:] - docs[:-1]
    deltas[starts] = docs[starts]
    sizes = varint_sizes(deltas.astype(np.uint64))
    enc = encode_varints(deltas.astype(np.uint64), sizes)
    byte_cum = np.concatenate(([0], np.cumsum(sizes)))
    cell_offsets = byte_cum[np.concatenate((starts, [len(docs)]))]
    dfs = np.diff(np.concatenate((starts, [len(docs)])))
    return pa.table({
        "bucket": batch["bucket"].combine_chunks().take(
            pa.array(starts, pa.int64())),
        "gram": pa.array(grams[starts], pa.int32()),
        "df": pa.array(dfs, pa.int64()),
        "doc_blob": _binary_from_offsets(enc, cell_offsets),
    })


_POST_SCHEMA = pa.schema([
    ("gram", pa.int32()), ("df", pa.int64()),
    ("doc_blob", pa.binary()), ("bucket", pa.int32())])
_DF_SCHEMA = pa.schema([("gram", pa.int32()), ("df", pa.int64())])
_INGEST_MARKER = "_INGEST_INPROGRESS"
_DF_MARKER = "_DF_INPROGRESS"
_COMPACT_MARKER = "_COMPACT_INPROGRESS"


def _ingest_postings(corpus, index_dir: str, text_col: str, id_col: str,
                     num_buckets: int, casefold: bool) -> str:
    """Extract → range-sort → encode → write posting segments for
    ``corpus`` into ``index_dir/postings`` (the ONE pipeline both the
    full build and the delta append run, so they cannot diverge)."""
    if isinstance(corpus, str):
        ds = rd.read_parquet(corpus, columns=[id_col, text_col])
    else:
        ds = corpus.select_columns([id_col, text_col])
    rows = ds.map_batches(_trigram_rows_fn(text_col, id_col, num_buckets,
                                           casefold=casefold),
                          batch_format="pyarrow", zero_copy_batch=True)
    post_dir = os.path.join(index_dir, "postings")
    (rows.sort(["bucket", "gram", "doc_id"])
     .map_batches(_encode_block, batch_format="pyarrow",
                  zero_copy_batch=True)
     .write_parquet(post_dir, partition_cols=["bucket"]))
    # a token-less earlier build parked a typed empty file at the
    # postings root (_ensure_typed); with real hive-partitioned
    # segments present its inline bucket column would clash with the
    # partition field — drop it (re-park if still nothing real)
    stale = os.path.join(post_dir, "empty.parquet")
    if os.path.exists(stale):
        os.remove(stale)
    _ensure_typed(post_dir, _POST_SCHEMA)
    return post_dir


def _rebuild_df(index_dir: str) -> None:
    """Re-aggregate the global per-gram df table from segment rows —
    bounded by the 2^24 gram space — and publish it near-atomically:
    the new table is staged at ``df.new``, the old dir is renamed
    aside, the new one renamed in, the old one deleted — so a reader
    races two atomic renames, not an rmtree+replace.  The remaining
    crash window (between the two renames) is bracketed by a
    ``_DF_INPROGRESS`` marker: a later ``TrigramIndex`` open refuses
    LOUDLY and names the recovery (``rebuild_trigram_df``, idempotent)
    instead of failing on an opaque missing-dataset error."""
    import shutil

    post_dir = os.path.join(index_dir, "postings")
    df_dir = os.path.join(index_dir, "df")
    tmp = df_dir + ".new"
    old = df_dir + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    (rd.read_parquet(post_dir, columns=["gram", "df"])
     .groupby("gram").sum("df")
     .map_batches(lambda t: t.rename_columns(["gram", "df"]),
                  batch_format="pyarrow")
     .write_parquet(tmp))
    _ensure_typed(tmp, _DF_SCHEMA)
    marker = os.path.join(index_dir, _DF_MARKER)
    with open(marker, "w") as f:
        f.write("df publish in progress; run rebuild_trigram_df() "
                "to recover\n")
    if os.path.exists(df_dir):
        os.replace(df_dir, old)
    os.replace(tmp, df_dir)
    shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)


def rebuild_trigram_df(index_dir: str) -> None:
    """Idempotent recovery/maintenance entry: re-derive and republish
    the df table from the posting segments (the segments are the
    source of truth; df is a planner-ordering hint)."""
    _rebuild_df(index_dir)


def build_trigram_index(corpus, index_dir: str, text_col: str = "text",
                        id_col: str = "doc_id",
                        num_buckets: int = NUM_BUCKETS,
                        casefold: bool = False) -> str:
    """Build the trigram index; returns ``index_dir``.

    ``corpus``: a parquet path (read pruned to the two needed columns)
    or a Dataset.  Exactly ONE all-to-all exchange (the range sort);
    everything else is streaming map_batches.  With ``casefold`` the
    text is ``utf8_lower``-folded before gram extraction and queries
    served from the index are case-insensitive (``contains(lower(text),
    lower(pattern))`` semantics, the same kernel at build, plan and
    verify time)."""
    _ingest_postings(corpus, index_dir, text_col, id_col, num_buckets,
                     casefold)
    _rebuild_df(index_dir)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"text_col": text_col, "id_col": id_col,
                   "num_buckets": num_buckets, "casefold": casefold,
                   "fold": "utf8_lower" if casefold else None,
                   # compaction-trigger denominator (approximate after
                   # deletes; see maybe_compact_trigram_index)
                   "num_docs": _count_docs(corpus)}, f)
    return index_dir


def delete_from_trigram_index(index_dir: str,
                              doc_ids: "list[int]") -> int:
    """Tombstone docs out of a trigram index (the grep analog of the
    main index's ``delete_documents``, pipelines/delta.py).  Posting
    segments are immutable; the SORTED tombstone set is persisted in
    ``tombstones.json`` and subtracted from every candidate set at
    plan time, so deleted docs never reach the verify stage.  Appends
    accumulate (delete-then-delete); a fresh ``build_trigram_index``
    over the surviving corpus drops them (compaction).  Returns the
    total tombstone count."""
    path = os.path.join(index_dir, "tombstones.json")
    have: list[int] = []
    if os.path.exists(path):
        with open(path) as f:
            have = json.load(f)
    merged = sorted(set(have) | {int(d) for d in doc_ids})
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f)
    os.replace(tmp, path)
    return len(merged)


def add_to_trigram_index(corpus, index_dir: str) -> str:
    """Incrementally index NEW docs into an existing trigram index —
    the grep analog of the main index's delta path (pipelines/delta.py).

    The posting layout is per-(bucket, gram) SEGMENTS and the reader
    already np.unique-merges a gram's segments, so ingestion is pure
    append: the shared ``_ingest_postings`` pipeline runs over the new
    docs only and its output files land in the existing
    ``postings/bucket=*`` dirs; the df table is then re-aggregated and
    swapped atomically.  A ``_INGEST_INPROGRESS`` marker brackets the
    whole operation: a crash mid-ingest leaves the marker and every
    later ``TrigramIndex`` open REFUSES loudly instead of serving a
    df table that predates the appended segments (a gram present only
    in delta docs would read df=0 and silently drop all its matches).
    Recovery is simply re-running the SAME delta: duplicate segments
    are harmless (the reader uniques doc ids per gram; df counts are
    planner-ordering hints, not results).  Caller contract: new doc
    ids must not collide with indexed ones (same as delta indexes).
    Build params (columns, casefold) come from the index's own meta."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    marker = os.path.join(index_dir, _INGEST_MARKER)
    with open(marker, "w") as f:
        f.write("delta ingest started; re-run add_to_trigram_index "
                "with the same delta to recover\n")
    _ingest_postings(corpus, index_dir, meta["text_col"], meta["id_col"],
                     meta["num_buckets"],
                     bool(meta.get("casefold", False)))
    _rebuild_df(index_dir)
    if "num_docs" in meta:
        meta["num_docs"] = int(meta["num_docs"]) + _count_docs(corpus)
        _write_meta(index_dir, meta)
    os.remove(marker)
    return index_dir


def _count_docs(corpus) -> int:
    """Row count of a corpus argument — parquet metadata only for a
    path (no data read), ``Dataset.count()`` otherwise.  Feeds the
    ``num_docs`` compaction-trigger denominator."""
    if isinstance(corpus, str):
        import pyarrow.dataset as pads

        return pads.dataset(corpus).count_rows()
    return corpus.count()


def _write_meta(index_dir: str, meta: dict) -> None:
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))


def _decode_segments_fn(drop_ref):
    """Inverse of ``_encode_block`` as a batch fn: posting segments ->
    (gram, doc_id, bucket) rows, minus the broadcast tombstone set.
    Fully vectorized: ONE varint decode over the batch's concatenated
    blob buffer, per-segment absolute ids restored with a cumsum-base
    subtraction (no per-segment Python loop)."""
    import pyarrow.compute as pc

    empty = pa.table({
        "gram": pa.array([], pa.int32()),
        "doc_id": pa.array([], pa.int64()),
        "bucket": pa.array([], pa.int32()),
    })

    def _fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        blob = batch["doc_blob"].combine_chunks()
        offs = np.frombuffer(blob.buffers()[1], np.int32)[
            blob.offset: blob.offset + len(blob) + 1].astype(np.int64)
        data = np.frombuffer(blob.buffers()[2], np.uint8)[
            offs[0]: offs[-1]]
        deltas = decode_varints(data).astype(np.int64)
        dfs = batch["df"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(deltas) != int(dfs.sum()):
            raise ValueError("posting segment decode count mismatch")
        docs = np.cumsum(deltas)
        starts = np.concatenate(([0], np.cumsum(dfs)[:-1]))
        base = docs[starts] - deltas[starts]
        docs = docs - np.repeat(base, dfs)
        grams = np.repeat(
            batch["gram"].combine_chunks().cast(pa.int32())
            .to_numpy(zero_copy_only=False), dfs)
        buckets = np.repeat(
            pc.cast(batch["bucket"].combine_chunks(), pa.int32())
            .to_numpy(zero_copy_only=False), dfs)
        ts = ray.get(drop_ref)
        if len(ts):
            at = np.searchsorted(ts, docs)
            dead = (at < len(ts)) & (ts[np.minimum(at, len(ts) - 1)]
                                     == docs)
            keep = ~dead
            docs, grams, buckets = docs[keep], grams[keep], buckets[keep]
        return pa.table({"gram": pa.array(grams, pa.int32()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "bucket": pa.array(buckets, pa.int32())})

    return _fn


def _dedupe_encode(batch: pa.Table) -> pa.Table:
    """``_encode_block`` with adjacent-duplicate (gram, doc_id) rows
    dropped first: a recovered delta ingest re-appends its segments, so
    a compaction rewrite must collapse them (the live reader uniques at
    decode time; the rewritten single segment would otherwise carry
    delta-0 entries that break ``assume_unique`` intersections).  The
    range sort co-locates duplicates, so an adjacent check suffices
    (a boundary-straddling pair leaves one copy per block — two
    segments, which the reader merges as before)."""
    if batch.num_rows == 0:
        return _encode_block(batch)
    g = batch["gram"].combine_chunks().to_numpy(zero_copy_only=False)
    d = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    keep = np.concatenate(([True], (np.diff(g) != 0) | (np.diff(d) != 0)))
    return _encode_block(batch.filter(pa.array(keep)))


def compact_trigram_index(index_dir: str) -> int:
    """Fold the tombstone set into the posting segments: decode every
    segment (one vectorized pass per batch), drop tombstoned doc ids,
    re-sort and re-encode — the SAME one-range-shuffle shape as the
    build, minus gram extraction — and publish the rewritten postings
    with the two-rename swap the df publish uses.  Clears
    ``tombstones.json``.  Returns the number of tombstones folded in
    (0 = nothing to do).  Crash window is bracketed by a
    ``_COMPACT_INPROGRESS`` marker; recovery = re-run
    ``compact_trigram_index`` (it restores the renamed-aside postings
    first, so the rewrite restarts from intact segments)."""
    import shutil

    post_dir = os.path.join(index_dir, "postings")
    old = post_dir + ".old"
    marker = os.path.join(index_dir, _COMPACT_MARKER)
    if os.path.exists(old) and not os.path.exists(post_dir):
        # crashed between the publish renames: the old segments are
        # the source of truth — put them back and redo the rewrite
        os.replace(old, post_dir)
    if os.path.exists(marker):
        os.remove(marker)
    ts_path = os.path.join(index_dir, "tombstones.json")
    if not os.path.exists(ts_path):
        return 0
    with open(ts_path) as f:
        ts = np.asarray(sorted(json.load(f)), dtype=np.int64)
    if len(ts) == 0:
        os.remove(ts_path)
        return 0

    new = post_dir + ".new"
    shutil.rmtree(new, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    from ray.data.datasource.partitioning import (
        Partitioning,
        PartitionStyle,
    )

    ts_ref = ray.put(ts)
    part = Partitioning(PartitionStyle.HIVE, field_types={"bucket": int})
    (rd.read_parquet(post_dir, partitioning=part)
     .map_batches(_decode_segments_fn(ts_ref), batch_format="pyarrow",
                  zero_copy_batch=True)
     .sort(["bucket", "gram", "doc_id"])
     .map_batches(_dedupe_encode, batch_format="pyarrow",
                  zero_copy_batch=True)
     .write_parquet(new, partition_cols=["bucket"]))
    stale = os.path.join(new, "empty.parquet")
    if os.path.exists(stale):
        os.remove(stale)
    _ensure_typed(new, _POST_SCHEMA)

    with open(marker, "w") as f:
        f.write("compaction publish in progress; re-run "
                "compact_trigram_index() to recover\n")
    os.replace(post_dir, old)
    os.replace(new, post_dir)
    _rebuild_df(index_dir)
    os.remove(ts_path)
    shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if "num_docs" in meta:
        # approximate: tombstones are a subset of ever-indexed ids, so
        # this denominator only feeds the compaction-trigger heuristic
        meta["num_docs"] = max(0, int(meta["num_docs"]) - len(ts))
        _write_meta(index_dir, meta)
    return len(ts)


def should_compact_trigram_index(index_dir: str, frac: float = 0.25,
                                 min_tombstones: int = 1024) -> bool:
    """Ray-free threshold check for ``maybe_compact_trigram_index``:
    true when the tombstone list has grown past both an absolute floor
    and ``frac`` of the indexed doc count.  Split out so a caller (the
    grep-delete CLI) can avoid initializing Ray for a delete that
    won't compact.  Indexes built before ``num_docs`` was recorded
    fall back to the absolute floor alone."""
    ts_path = os.path.join(index_dir, "tombstones.json")
    if not os.path.exists(ts_path):
        return False
    with open(ts_path) as f:
        n_ts = len(json.load(f))
    if n_ts < min_tombstones:
        return False
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    num_docs = meta.get("num_docs")
    if num_docs and n_ts < frac * int(num_docs):
        return False
    return True


def maybe_compact_trigram_index(index_dir: str, frac: float = 0.25,
                                min_tombstones: int = 1024) -> bool:
    """Compact when ``should_compact_trigram_index`` says so (the grep
    analog of the main index's ``maybe_compact``, pipelines/delta.py)
    — keeping the driver-side tombstone JSON bounded instead of
    growing until a manual rebuild."""
    if not should_compact_trigram_index(index_dir, frac=frac,
                                        min_tombstones=min_tombstones):
        return False
    compact_trigram_index(index_dir)
    return True


# ---------------------------------------------------------------------------
# regex -> required-trigram CNF

def _pattern_grams(literal: bytes) -> np.ndarray:
    """Unique trigram codes of a byte string (empty if < 3 bytes).
    Casefolded indexes fold the STRING first (``_fold_str``) so the
    pattern's bytes match the build-side ``utf8_lower`` output."""
    if len(literal) < 3:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(literal, dtype=np.uint8)
    codes = ((b[:-2].astype(np.int64) << 16)
             | (b[1:-1].astype(np.int64) << 8) | b[2:].astype(np.int64))
    return np.unique(codes)


def regex_required_literals(pattern: str) -> list[list[str]]:
    """Required-literal CNF of a regex: a list of clauses, each clause a
    list of alternative literal strings (>= 3 bytes each); every match
    of the regex must contain, for each clause, at least one of its
    alternatives as a substring.  Empty list => no pruning possible.

    A conservative subset of Cox's RegexpQuery analysis: maximal
    LITERAL runs inside a concatenation are required; groups and
    min>=1 repeats recurse; a top-level alternation contributes one
    OR-clause only when EVERY branch yields a required literal
    (otherwise it prunes nothing).  Anything else (classes, ``.``,
    ``*``/``?``, anchors, backrefs) just breaks the current run —
    always sound, sometimes loose.

    Case-insensitivity is handled conservatively: a global ``(?i)``
    yields NO required literals (RE2 matches case variants whose
    trigrams a case-sensitive index stores separately — requiring the
    as-written literal's grams would silently drop those matches), and
    a scoped ``(?i:...)`` group contributes nothing from inside the
    group.  Sound; the verify stage still honors the flag."""
    import re as _re

    try:
        from re import _parser as sre_parse  # py >= 3.11
    except ImportError:  # pragma: no cover - older interpreters
        import sre_parse

    def walk(items) -> list[list[str]]:
        clauses: list[list[str]] = []
        run: list[str] = []

        def flush():
            s = "".join(run)
            run.clear()
            if len(s.encode()) >= 3:
                clauses.append([s])

        for op, av in items:
            name = str(op)
            if name == "LITERAL":
                run.append(chr(av))
            elif name == "SUBPATTERN":
                flush()
                _gid, add_flags, _del_flags, sub = av
                if add_flags & _re.IGNORECASE:
                    continue          # (?i:...): opaque, prunes nothing
                clauses.extend(walk(sub))
            elif name in ("MAX_REPEAT", "MIN_REPEAT"):
                flush()
                lo, _hi, sub = av
                if lo >= 1:
                    clauses.extend(walk(sub))
            elif name == "BRANCH":
                flush()
                alt_lits: list[str] = []
                ok = True
                for branch in av[1]:
                    sub = walk(branch)
                    singles = [c[0] for c in sub if len(c) == 1]
                    if not singles:
                        ok = False
                        break
                    alt_lits.append(max(singles, key=lambda s: len(s.encode())))
                if ok and alt_lits:
                    clauses.append(alt_lits)
            else:
                # AT (anchors), IN (classes), ANY, NOT_LITERAL,
                # GROUPREF, ... : no literal requirement derivable
                flush()
        flush()
        return clauses

    parsed = sre_parse.parse(pattern)
    if parsed.state.flags & _re.IGNORECASE:
        return []                     # global (?i): no sound pruning
    return walk(parsed)


# ---------------------------------------------------------------------------
# reader / planner


class TrigramIndex:
    """Planner + posting reader over a built trigram index.

    Driver-side state is tiny (meta + a pyarrow dataset handle); every
    posting read is bucket- and row-group-pruned to the asked grams."""

    def __init__(self, index_dir: str):
        import pyarrow.dataset as pads

        self.dir = index_dir
        if os.path.exists(os.path.join(index_dir, _INGEST_MARKER)):
            raise ValueError(
                f"trigram index at {index_dir} has a half-finished delta "
                "ingest (its df table predates appended segments, which "
                "would silently drop delta-only matches); re-run "
                "add_to_trigram_index with the same delta to recover")
        if os.path.exists(os.path.join(index_dir, _DF_MARKER)):
            raise ValueError(
                f"trigram index at {index_dir} has a half-published df "
                "table (crash between the publish renames); run "
                "rebuild_trigram_df() to recover — segments are intact")
        if os.path.exists(os.path.join(index_dir, _COMPACT_MARKER)):
            raise ValueError(
                f"trigram index at {index_dir} has a half-published "
                "compaction (crash between the postings renames); "
                "re-run compact_trigram_index() to recover")
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        tpath = os.path.join(index_dir, "tombstones.json")
        if os.path.exists(tpath):
            with open(tpath) as f:
                self.tombstones = np.asarray(sorted(json.load(f)),
                                             dtype=np.int64)
        else:
            self.tombstones = np.empty(0, np.int64)
        self.casefold = bool(self.meta.get("casefold", False))
        if self.casefold and self.meta.get("fold") != "utf8_lower":
            raise ValueError(
                f"casefolded trigram index at {index_dir} predates the "
                "utf8_lower fold format (its grams were ASCII-folded, "
                "which loses non-ASCII case pairs); rebuild it")
        part = pads.partitioning(
            pa.schema([("bucket", pa.int32())]), flavor="hive")
        self._post = pads.dataset(os.path.join(index_dir, "postings"),
                                  partitioning=part)
        self._df = pads.dataset(os.path.join(index_dir, "df"))

    def df(self, grams: np.ndarray) -> dict[int, int]:
        """Global df for each asked gram (0 when absent)."""
        import pyarrow.dataset as pads

        out = {int(g): 0 for g in grams}
        if len(grams) == 0:
            return out
        tbl = self._df.to_table(
            filter=pads.field("gram").isin([int(g) for g in grams]))
        for g, d in zip(tbl["gram"].to_pylist(), tbl["df"].to_pylist()):
            out[int(g)] = int(d)
        return out

    def postings(self, grams: list[int]) -> dict[int, np.ndarray]:
        """Sorted unique doc ids per gram (segments decoded + merged)."""
        import pyarrow.dataset as pads

        out: dict[int, list[np.ndarray]] = {int(g): [] for g in grams}
        if not grams:
            return {}
        buckets = sorted({int(g) % self.meta["num_buckets"] for g in grams})
        filt = (pads.field("bucket").isin(buckets)
                & pads.field("gram").isin([int(g) for g in grams]))
        tbl = self._post.to_table(filter=filt,
                                  columns=["gram", "df", "doc_blob"])
        for g, blob in zip(tbl["gram"].to_pylist(),
                           tbl["doc_blob"].to_pylist()):
            docs = np.cumsum(decode_varints(
                np.frombuffer(blob, dtype=np.uint8)).astype(np.int64))
            out[int(g)].append(docs)
        merged = {}
        for g, segs in out.items():
            if not segs:
                merged[g] = np.empty(0, dtype=np.int64)
            elif len(segs) == 1:
                merged[g] = segs[0]
            else:
                merged[g] = np.unique(np.concatenate(segs))
        return merged

    def _intersect_grams(self, grams: np.ndarray,
                         max_and: int = MAX_AND) -> np.ndarray | None:
        """Candidate doc ids containing ALL the grams (None = no info)."""
        if len(grams) == 0:
            return None
        dfs = self.df(grams)
        if any(d == 0 for d in dfs.values()):
            return np.empty(0, dtype=np.int64)
        chosen = sorted(dfs, key=lambda g: (dfs[g], g))[:max_and]
        posts = self.postings(chosen)
        cand: np.ndarray | None = None
        for g in sorted(chosen, key=lambda g: dfs[g]):
            cand = posts[g] if cand is None else np.intersect1d(
                cand, posts[g], assume_unique=True)
            if len(cand) == 0:
                break
        return cand

    def candidates_literal(self, pattern: str,
                           max_and: int = MAX_AND) -> np.ndarray | None:
        """Superset of docs containing ``pattern``; None when the
        pattern is shorter than one trigram (full scan required).
        On a casefolded index the pattern folds the same way the text
        did at build time (``utf8_lower``)."""
        return self._intersect_grams(
            _pattern_grams(self._fold(pattern).encode()),
            max_and=max_and)

    def _fold(self, pattern: str) -> str:
        return _fold_str(pattern) if self.casefold else pattern

    def candidates_multi(self, patterns: list[str],
                         max_and: int = MAX_AND
                         ) -> dict[str, np.ndarray | None]:
        """Batched planning: candidate sets for MANY literal patterns
        with exactly ONE df read and ONE postings read (the pruned
        filters carry the union of every pattern's chosen grams), so a
        k-pattern batch costs one index round-trip, not k."""
        gsets = {p: _pattern_grams(self._fold(p).encode())
                 for p in patterns}
        nonempty = [g for g in gsets.values() if len(g)]
        all_g = (np.unique(np.concatenate(nonempty)) if nonempty
                 else np.empty(0, dtype=np.int64))
        dfs = self.df(all_g)
        chosen: dict[str, list[int] | None] = {}
        needed: set[int] = set()
        for p, g in gsets.items():
            if len(g) == 0:
                chosen[p] = None          # too short to prune: full scan
                continue
            if any(dfs[int(x)] == 0 for x in g):
                chosen[p] = []            # a required gram absent: empty
                continue
            sel = sorted((int(x) for x in g),
                         key=lambda x: (dfs[x], x))[:max_and]
            chosen[p] = sel
            needed.update(sel)
        posts = self.postings(sorted(needed))
        out: dict[str, np.ndarray | None] = {}
        for p, sel in chosen.items():
            if sel is None:
                out[p] = None
                continue
            cand: np.ndarray | None = np.empty(0, dtype=np.int64) \
                if sel == [] else None
            for g in sorted(sel or [], key=lambda g: dfs[g]):
                cand = posts[g] if cand is None else np.intersect1d(
                    cand, posts[g], assume_unique=True)
                if len(cand) == 0:
                    break
            out[p] = cand
        return out

    def candidates_regex(self, pattern: str,
                         max_and: int = MAX_AND) -> np.ndarray | None:
        """Superset of docs that can match ``pattern`` (None = no
        pruning derivable from the regex).  Required literals are
        planned AS WRITTEN (never case-folded): on a sensitive index
        the fold is the identity anyway, and on a casefolded index the
        served semantics are ``regexp_matches(lower(text), pattern)``
        — a literal the regex requires must appear verbatim inside
        ``lower(text)``, whose grams are exactly what the folded index
        holds, so the unfolded grams are the sound requirement (an
        uppercase literal correctly yields empty candidates: it can
        never occur in lowered text)."""
        clauses = regex_required_literals(pattern)
        cand: np.ndarray | None = None
        for alts in clauses:
            sets = []
            opaque = False
            for lit in alts:
                s = self._intersect_grams(_pattern_grams(lit.encode()),
                                          max_and=max_and)
                if s is None:       # an alternative too short to prune
                    opaque = True
                    break
                sets.append(s)
            if opaque:
                continue
            clause_set = sets[0] if len(sets) == 1 else \
                np.unique(np.concatenate(sets))
            cand = clause_set if cand is None else np.intersect1d(
                cand, clause_set, assume_unique=True)
            if len(cand) == 0:
                return cand
        return cand


# ---------------------------------------------------------------------------
# serving: candidates -> verified matches


def _drop_sorted(tbl: pa.Table, id_col: str,
                 drop_ids: np.ndarray) -> pa.Table:
    """Rows of ``tbl`` whose ``id_col`` is NOT in the SORTED
    ``drop_ids`` (tombstone subtraction on a result table)."""
    if tbl.num_rows == 0 or len(drop_ids) == 0:
        return tbl
    ids = tbl[id_col].combine_chunks().cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    at = np.searchsorted(drop_ids, ids)
    hit = (at < len(drop_ids)) & (drop_ids[np.minimum(at, len(drop_ids)
                                                      - 1)] == ids)
    return tbl.filter(pa.array(~hit))


def _dispatch_verify(corpus_path: str, cand: np.ndarray | None,
                     result_fn, id_col: str, text_col: str,
                     empty: pa.Table, sort_keys,
                     drop_ids: np.ndarray | None = None,
                     output_path: str | None = None,
                     fetch_cap: int | None = None) -> pa.Table:
    """Shared candidates -> verified-matches dispatch behind every grep
    entry point.  ``result_fn`` verifies one pruned/streamed row block
    (a ``pa.Table`` with the id + text columns) and returns result
    rows; ``cand`` is the planner's candidate doc-id superset (None =
    the pattern yielded no trigram to prune by).  ``drop_ids``
    (SORTED): tombstoned docs — subtracted from ``cand`` so deleted
    docs are never even read, and filtered from the result as well so
    the no-trigram full-scan path honors deletions too.
    Size-dispatched:

    - ``cand`` empty: nothing to do.
    - small ``cand``: one pruned driver-side fetch (row-group stats on
      ``id_col`` keep it local to the candidate ranges).
    - large ``cand``: candidates broadcast once via ``ray.put``; a
      streaming ``map_batches`` scan filters + verifies per block.
    - ``cand is None``: full streaming scan, LOUD (stderr) — callers
      relying on index pruning should notice the O(corpus) downgrade.

    ``output_path``: BOUNDED-DRIVER-MEMORY mode — result rows are
    written as (globally sorted) parquet under this directory instead
    of being concatenated on the driver, and the return value is a
    one-row manifest table ``(path, n_rows)``.  This is the scale exit
    for stopword-scale patterns and ``grep_lines`` on hot patterns,
    where the match set itself is too big for one process: the
    streaming scan's verified blocks flow straight to the sink with
    only the sort exchange between them.  The directory is REPLACED
    (rmtree + write — Dataset.write_parquet appends otherwise).
    ``fetch_cap`` overrides ``DRIVER_FETCH_CAP`` (tests/benches force
    the streaming path with 0)."""
    import pyarrow.dataset as pads

    cap = DRIVER_FETCH_CAP if fetch_cap is None else int(fetch_cap)
    if drop_ids is not None and len(drop_ids) == 0:
        drop_ids = None
    if drop_ids is not None and cand is not None and len(cand):
        at = np.searchsorted(drop_ids, cand)
        dead = (at < len(drop_ids)) & (drop_ids[np.minimum(
            at, len(drop_ids) - 1)] == cand)
        cand = cand[~dead]

    def _manifest(n_rows: int) -> pa.Table:
        return pa.table({"path": pa.array([output_path], pa.string()),
                         "n_rows": pa.array([n_rows], pa.int64())})

    def _spill(tbl: pa.Table) -> pa.Table:
        """Park a driver-side result as the single output file (the
        small-candidate path under output mode: same manifest shape,
        no reason to round-trip through a Dataset)."""
        import pyarrow.parquet as pq
        import shutil

        shutil.rmtree(output_path, ignore_errors=True)
        os.makedirs(output_path)
        pq.write_table(tbl, os.path.join(output_path, "part-0.parquet"))
        return _manifest(tbl.num_rows)

    if cand is not None and len(cand) == 0:
        return _spill(empty) if output_path is not None else empty

    def _finish(tbl: pa.Table) -> pa.Table:
        if drop_ids is not None:
            tbl = _drop_sorted(tbl, id_col, drop_ids)
        return tbl.sort_by(sort_keys)

    if cand is not None and len(cand) <= cap:
        tbl = pads.dataset(corpus_path).to_table(
            columns=[id_col, text_col],
            filter=pads.field(id_col).isin([int(d) for d in cand]))
        out = _finish(result_fn(tbl)) if tbl.num_rows else empty
        return _spill(out) if output_path is not None else out

    if cand is None:
        print(f"[grep] pattern yields no required trigram: full "
              f"streaming scan of {corpus_path}", file=sys.stderr)
    cand_ref = ray.put(np.sort(cand)) if cand is not None else None
    drop_ref = ray.put(drop_ids) if (output_path is not None
                                     and drop_ids is not None) else None

    def _scan(batch: pa.Table) -> pa.Table:
        t = batch
        if cand_ref is not None:
            arr = ray.get(cand_ref)
            ids = t[id_col].combine_chunks().cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            at = np.searchsorted(arr, ids, side="left")
            mask = (at < len(arr)) & (arr[np.minimum(at, len(arr) - 1)]
                                      == ids)
            t = t.filter(pa.array(mask))
        if t.num_rows == 0:
            return empty
        out = result_fn(t)
        if drop_ref is not None:
            # output mode finishes distributed: tombstones subtract
            # per block (row-local, so it commutes with the scan)
            out = _drop_sorted(out, id_col, ray.get(drop_ref))
        return out

    # bytes-derived block count: a single-file corpus with one fat row
    # group would otherwise become ONE read task and serialize the
    # whole verify scan (measured 14 s -> ~3 s on a 10-pattern batch);
    # override_num_blocks splits it at row-group granularity.  Only
    # when the local size probe works — a remote (s3/hdfs) path sizes
    # as 0 and must keep Ray's own read sizing, not a 16-block floor
    from .._block import blocks_for_bytes, dir_bytes

    nbytes = dir_bytes(corpus_path)
    split = ({"override_num_blocks": blocks_for_bytes(
                  nbytes, target_bytes=64 << 20)} if nbytes > 0 else {})
    ds = (rd.read_parquet(corpus_path, columns=[id_col, text_col],
                          **split)
          .map_batches(_scan, batch_format="pyarrow",
                       zero_copy_batch=True))
    if output_path is not None:
        import shutil

        shutil.rmtree(output_path, ignore_errors=True)
        (ds.sort([k for k, _ in sort_keys])
           .write_parquet(output_path))
        _ensure_typed(output_path, empty.schema)
        return _manifest(pads.dataset(output_path).count_rows())
    out = ds.to_arrow_refs()
    tables = [t for t in ray.get(out) if t.num_rows]
    if not tables:
        return empty
    return _finish(pa.concat_tables(tables))


def _verified_matches(corpus_path: str, cand: np.ndarray | None,
                      matcher, id_col: str, text_col: str,
                      counter=None, drop_ids=None,
                      output_path=None, fetch_cap=None) -> pa.Table:
    """Docs whose text satisfies ``matcher`` (an Arrow-native predicate
    ``ChunkedArray -> BooleanArray``), restricted to ``cand`` when the
    planner produced one.  With ``counter`` (``ChunkedArray ->
    Int32Array`` occurrence counts) the result carries an
    ``n_matches`` column and keeps rows with count > 0; ``matcher`` is
    ignored.  Dispatch (pruned fetch / broadcast scan / loud full
    scan) is shared with ``grep_multi`` via ``_dispatch_verify``."""
    import pyarrow.compute as pc

    def _result(tbl: pa.Table) -> pa.Table:
        text = pc.fill_null(tbl[text_col], "")
        ids = tbl[id_col].cast(pa.int64())
        if counter is None:
            mask = matcher(text)
            return pa.table({id_col: ids.filter(mask)})
        n = pc.cast(counter(text), pa.int64())
        mask = pc.greater(n, 0)
        return pa.table({id_col: ids.filter(mask),
                         "n_matches": n.filter(mask)})

    empty = _result(pa.table({id_col: pa.array([], pa.int64()),
                              text_col: pa.array([], pa.string())}))
    return _dispatch_verify(corpus_path, cand, _result, id_col, text_col,
                            empty, [(id_col, "ascending")],
                            drop_ids=drop_ids, output_path=output_path,
                            fetch_cap=fetch_cap)


def _literal_matcher(idx: "TrigramIndex", pattern: str):
    """Substring predicate matching the index's case mode.  The
    casefolded mode lowercases BOTH sides with the same utf8_lower
    kernel the build folded with (``contains(lower(text),
    lower(pat))`` — DuckDB-oracle-identical)."""
    import pyarrow.compute as pc

    if idx.casefold:
        pat = _fold_str(pattern)
        return lambda col: pc.match_substring(pc.utf8_lower(col), pat)
    return lambda col: pc.match_substring(col, pattern)


def grep_substring(index_dir: str, corpus_path: str, pattern: str,
                   output_path: str | None = None,
                   fetch_cap: int | None = None) -> pa.Table:
    """Doc ids whose text contains ``pattern``, sorted ascending.
    Case-sensitivity follows the index build (``casefold=True`` ->
    ``contains(lower(text), lower(pattern))`` semantics).  Patterns
    shorter than 3 bytes fall back to a full streaming scan
    (documented cost: no trigram can prune them).  With
    ``output_path`` the match set is written as sorted parquet and a
    (path, n_rows) manifest is returned instead — bounded driver
    memory for stopword-scale patterns (see ``_dispatch_verify``).
    Oracle: ``SELECT doc_id FROM documents WHERE contains(text, ?)``."""
    idx = TrigramIndex(index_dir)
    cand = idx.candidates_literal(pattern)
    return _verified_matches(
        corpus_path, cand, _literal_matcher(idx, pattern),
        idx.meta["id_col"], idx.meta["text_col"],
        drop_ids=idx.tombstones, output_path=output_path,
        fetch_cap=fetch_cap)


def grep_count(index_dir: str, corpus_path: str, pattern: str,
               output_path: str | None = None,
               fetch_cap: int | None = None) -> pa.Table:
    """(doc_id, n_matches) for docs containing ``pattern``, sorted by
    doc id.  Counts are NON-overlapping occurrences — the same
    convention as SQL's replace-length trick
    ``(len(text) - len(replace(text, p, ''))) // len(p)`` and Arrow's
    ``count_substring``, so the DuckDB oracle is value-exact."""
    import pyarrow.compute as pc

    idx = TrigramIndex(index_dir)
    cand = idx.candidates_literal(pattern)
    if idx.casefold:
        pat = _fold_str(pattern)
        counter = lambda col: pc.count_substring(pc.utf8_lower(col), pat)  # noqa: E731
    else:
        counter = lambda col: pc.count_substring(col, pattern)  # noqa: E731
    return _verified_matches(
        corpus_path, cand, None,
        idx.meta["id_col"], idx.meta["text_col"], counter=counter,
        drop_ids=idx.tombstones, output_path=output_path,
        fetch_cap=fetch_cap)


def grep_multi(index_dir: str, corpus_path: str, patterns: list[str],
               output_path: str | None = None,
               fetch_cap: int | None = None) -> pa.Table:
    """(pattern, doc_id) pairs for a BATCH of literal patterns, sorted.

    Planning is batched (``candidates_multi``: one df read + one
    postings read for the whole batch); verification touches each
    corpus row at most once:

    - every pattern provably empty: return immediately;
    - the union of candidate sets small: ONE pruned driver fetch, all
      patterns verified against it (sound — a true match of pattern p
      is always inside p's candidate superset, hence inside the
      union);
    - otherwise one streaming scan that restricts rows to the union
      (or the full corpus when some pattern had no trigram to prune
      by) and emits per-pattern matches.
    """
    import pyarrow.compute as pc

    idx = TrigramIndex(index_dir)
    id_col, text_col = idx.meta["id_col"], idx.meta["text_col"]
    cands = idx.candidates_multi(patterns)
    live = {p: c for p, c in cands.items()
            if c is None or len(c) > 0}
    empty = pa.table({"pattern": pa.array([], pa.string()),
                      id_col: pa.array([], pa.int64())})
    if not live:
        # route through the dispatcher so output mode still gets its
        # (path, n_rows=0) manifest instead of a bare empty table
        return _dispatch_verify(corpus_path, np.empty(0, np.int64),
                                lambda t: empty, id_col, text_col, empty,
                                [("pattern", "ascending"),
                                 (id_col, "ascending")],
                                output_path=output_path,
                                fetch_cap=fetch_cap)

    # folded patterns hoisted once; the casefolded mode lowercases the
    # block's text ONCE for the whole batch of patterns, not per pattern
    pats = {p: idx._fold(p) for p in live}

    def _verify(tbl: pa.Table) -> pa.Table:
        """All live patterns over one fetched/streamed row block."""
        text = pc.fill_null(tbl[text_col], "")
        hay = pc.utf8_lower(text) if idx.casefold else text
        ids = tbl[id_col].cast(pa.int64())
        parts = []
        for p in sorted(live):
            hit = ids.filter(pc.match_substring(hay, pats[p]))
            if len(hit):
                parts.append(pa.table({
                    "pattern": pa.array([p] * len(hit), pa.string()),
                    id_col: hit}))
        return pa.concat_tables(parts) if parts else empty

    full_scan = any(c is None for c in live.values())
    union = (np.unique(np.concatenate([c for c in live.values()
                                       if c is not None]))
             if not full_scan else None)
    return _dispatch_verify(corpus_path, union, _verify, id_col, text_col,
                            empty, [("pattern", "ascending"),
                                    (id_col, "ascending")],
                            drop_ids=idx.tombstones,
                            output_path=output_path, fetch_cap=fetch_cap)


def grep_lines(index_dir: str, corpus_path: str, pattern: str,
               output_path: str | None = None,
               fetch_cap: int | None = None) -> pa.Table:
    """(doc_id, line_no, line) for every LINE containing ``pattern`` —
    the grep presentation layer (1-based line numbers, lines split on
    '\\n').  Candidates come from the trigram planner exactly as in
    ``grep_substring`` (a line containing the pattern implies the doc
    contains it, so the doc-level candidate superset is sound); the
    verify stage explodes candidate docs into lines with one
    vectorized split + offset arithmetic and matches per line.
    Case-sensitivity follows the index build."""
    import pyarrow.compute as pc

    idx = TrigramIndex(index_dir)
    id_col, text_col = idx.meta["id_col"], idx.meta["text_col"]
    cand = idx.candidates_literal(pattern)
    matcher = _literal_matcher(idx, pattern)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "line_no": pa.array([], pa.int64()),
                      "line": pa.array([], pa.string())})

    def _result(tbl: pa.Table) -> pa.Table:
        text = pc.fill_null(tbl[text_col], "").combine_chunks()
        lines = pc.split_pattern(text, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        offs = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base, counts = offs[0], np.diff(offs)
        total = int(counts.sum())
        if total == 0:
            return empty
        flat = lines.values.slice(base, total)   # offset-safe list view
        ids = tbl[id_col].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        doc_rep = np.repeat(ids, counts)
        line_no = np.arange(total) - np.repeat(offs[:-1] - base, counts) + 1
        mask = matcher(flat)
        m = mask.to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(doc_rep[m], pa.int64()),
            "line_no": pa.array(line_no[m], pa.int64()),
            "line": flat.filter(mask),
        })

    return _dispatch_verify(corpus_path, cand, _result, id_col, text_col,
                            empty, [(id_col, "ascending"),
                                    ("line_no", "ascending")],
                            drop_ids=idx.tombstones,
                            output_path=output_path, fetch_cap=fetch_cap)


def grep_regex(index_dir: str, corpus_path: str, pattern: str,
               output_path: str | None = None,
               fetch_cap: int | None = None) -> pa.Table:
    """Doc ids whose text matches ``pattern`` (RE2 search semantics —
    the same engine DuckDB's ``regexp_matches`` uses), sorted ascending.
    The pattern must be valid under both Python ``re`` (parsed for the
    required-literal analysis only) and RE2 (the match engine).

    On a CASEFOLDED index the served semantics are
    ``regexp_matches(lower(text), pattern)`` — write the pattern in
    lowercase to get grep ``-i`` behavior.  That contract is what makes
    folded-gram planning sound (see ``candidates_regex``); blanket
    ``(?i)``-rewriting the pattern instead would be unsound (RE2's
    case-folding orbit, e.g. ``(?i)s`` matching U+017F, reaches text
    the ``utf8_lower`` build fold never produced).  A ``(?i)`` the
    caller writes is honored by the verify stage and planned
    conservatively (the flagged region is opaque to pruning)."""
    import pyarrow.compute as pc

    idx = TrigramIndex(index_dir)
    cand = idx.candidates_regex(pattern)
    if idx.casefold:
        matcher = lambda col: pc.match_substring_regex(  # noqa: E731
            pc.utf8_lower(col), pattern)
    else:
        matcher = lambda col: pc.match_substring_regex(  # noqa: E731
            col, pattern)
    return _verified_matches(
        corpus_path, cand, matcher,
        idx.meta["id_col"], idx.meta["text_col"],
        drop_ids=idx.tombstones, output_path=output_path,
        fetch_cap=fetch_cap)
