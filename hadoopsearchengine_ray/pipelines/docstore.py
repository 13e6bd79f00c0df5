"""Document store + snippet assembly — the serving-side doc database.

Rebuilds the reference's ``CFileStorage`` document DB (append + 3-byte
block/offset lookup stream, /root/reference/FileStorage.h:3375-3630) and
``CDocumentDatabase`` random retrieval (DocumentDatabase.h:17-290) as
range-partitioned Parquet: one directory per doc-id range, so a doc fetch
prunes to one partition + row-group statistics, and a failed write can
resume per range.  Snippets mirror the excerpt assembly of the query
front-end (/root/reference/DyableRequest/ DocumentQuery / HitScore.h
excerpt buffers): a window around the highest-density query-term region.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.dataset as pads
import ray.data as rd

from ..tokenizer import MAX_LEN, MIN_LEN, SPLIT_RE

DEFAULT_RANGE = 65_536  # docs per partition dir


def write_docstore(corpus: rd.Dataset, out_dir: str, id_col: str = "doc_id",
                   range_size: int = DEFAULT_RANGE) -> str:
    """Corpus rows -> range-partitioned parquet doc store."""

    def _with_range(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rng = pc.divide(batch[id_col].cast(pa.int64()), range_size)
        return batch.append_column("doc_range", rng.cast(pa.int32()))

    (corpus.map_batches(_with_range, batch_format="pyarrow",
                        batch_size=None, zero_copy_batch=True)
     .write_parquet(out_dir, partition_cols=["doc_range"]))
    return out_dir


class DocStore:
    """Random-access reader over the range-partitioned store."""

    def __init__(self, store_dir: str, id_col: str = "doc_id",
                 range_size: int = DEFAULT_RANGE):
        self.dir = store_dir
        self.id_col = id_col
        self.range_size = range_size

    def fetch(self, doc_ids: list[int]) -> pa.Table:
        """Fetch full rows for the given ids (partition + row-group pruned)."""
        if not doc_ids:
            return pa.table({})
        parts = sorted({d // self.range_size for d in doc_ids})
        tables = []
        for p in parts:
            part_dir = os.path.join(self.dir, f"doc_range={p}")
            if not os.path.isdir(part_dir):
                continue
            ids = [d for d in doc_ids if d // self.range_size == p]
            tbl = pads.dataset(part_dir).to_table(
                filter=pads.field(self.id_col).isin(ids))
            tables.append(tbl)
        return pa.concat_tables(tables) if tables else pa.table({})


def compact_docstore(store_dir: str, tombstones, id_col: str = "doc_id",
                     range_size: int = DEFAULT_RANGE) -> int:
    """Physically drop tombstoned docs from the store, IN PLACE: only
    partitions whose doc range contains a tombstone rewrite (streamed
    through Ray tasks, one bounded partition each); every other
    partition's files are untouched.  Each rewrite is atomic — filtered
    rows land in a tmp dir swapped in via two renames; a crash between
    the renames leaves the partition parked at ``.old``, which the next
    compact_docstore call restores before proceeding.  Returns the
    number of rows dropped.

    This is the store-side counterpart of index compaction
    (pipelines/compaction.py): after both, tombstoned docs are
    physically gone from serving.  The reference rewrites its whole
    document DB on any maintenance pass (FileStorage.h:3375-3630
    append-only store); range partitioning makes the rewrite
    proportional to the deleted ranges instead."""
    import shutil

    import ray

    by_part: dict[int, list[int]] = {}
    for d in tombstones:
        by_part.setdefault(int(d) // range_size, []).append(int(d))
    if not by_part:
        return 0

    @ray.remote
    def _rewrite(part_dir: str, ids: list[int], id_col: str) -> int:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        tbl = pads.dataset(part_dir).to_table()
        keep = pc.invert(pc.is_in(tbl[id_col].cast(pa.int64()),
                                  value_set=pa.array(ids, pa.int64())))
        out = tbl.filter(keep)
        tmp = part_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(out, os.path.join(tmp, "part.parquet"))
        old = part_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(part_dir, old)
        os.rename(tmp, part_dir)
        shutil.rmtree(old, ignore_errors=True)
        return tbl.num_rows - out.num_rows

    # crash recovery: a partition parked at .old (interrupted swap)
    # restores before this pass filters it again
    for name in os.listdir(store_dir):
        if name.endswith(".old"):
            cur = os.path.join(store_dir, name[:-4])
            if not os.path.isdir(cur):
                os.rename(os.path.join(store_dir, name), cur)
            else:
                shutil.rmtree(os.path.join(store_dir, name))

    refs = []
    for p, ids in sorted(by_part.items()):
        part_dir = os.path.join(store_dir, f"doc_range={p}")
        if os.path.isdir(part_dir):
            refs.append(_rewrite.remote(part_dir, sorted(ids), id_col))
    return int(sum(ray.get(refs)))


_WORD_RE = re.compile(r"[A-Za-z0-9]+")


def make_snippet(content: str, terms: list[str], window: int = 160,
                 mark: str = "**") -> str:
    """Excerpt around the densest query-term region with terms marked.

    Scans word spans on the ORIGINAL string (case-insensitive ASCII
    alnum runs — offsets into ``content.lower()`` would drift when
    lowercasing changes string length, e.g. 'İ' -> 'i̇'), finds the
    window containing the most distinct query terms (first such window
    on ties — deterministic), and returns +-window/2 chars around it
    with matched words wrapped in ``mark``."""
    tset = {t.lower() for t in terms}
    hits: list[tuple[int, int, str]] = []   # (start, end, word)
    for m in _WORD_RE.finditer(content):
        frag = m.group().lower()
        if MIN_LEN <= len(frag) <= MAX_LEN and frag in tset:
            hits.append((m.start(), m.end(), frag))
    if not hits:
        return content[:window] + ("..." if len(content) > window else "")
    # densest window: most distinct terms within `window` chars
    best_i, best_score = 0, -1
    for i in range(len(hits)):
        seen = set()
        for j in range(i, len(hits)):
            if hits[j][0] - hits[i][0] > window:
                break
            seen.add(hits[j][2])
        if len(seen) > best_score:
            best_i, best_score = i, len(seen)
    lo = max(0, hits[best_i][0] - window // 4)
    hi = min(len(content), lo + window)
    out = []
    cur = lo
    for s, e, _ in hits:
        if s < lo or e > hi:
            continue
        out.append(content[cur:s])
        out.append(mark + content[s:e] + mark)
        cur = e
    out.append(content[cur:hi])
    prefix = "..." if lo > 0 else ""
    suffix = "..." if hi < len(content) else ""
    return prefix + "".join(out) + suffix


def proximity_score(content: str, terms: list[str]) -> tuple[int, int]:
    """(matched_term_count, min_window) over the doc's token sequence.

    The re-rank signal of the reference's hit scorer
    (/root/reference/DyableRequest/HitScore.h:139-291: forward runs with
    gap thresholds, priority by unique terms in the run): the smallest
    token window containing every matched query term.  Deterministic;
    window = 10**9 when fewer than 2 terms match."""
    from ..tokenizer import tokenize_py

    tset = {t.lower() for t in terms}
    toks = tokenize_py(content)
    occs = [(i, t) for i, t in enumerate(toks) if t in tset]
    matched = len({t for _, t in occs})
    if matched < 2:
        return matched, 10**9
    best = 10**9
    last_pos: dict[str, int] = {}
    for i, t in occs:
        last_pos[t] = i
        if len(last_pos) == matched:
            best = min(best, i - min(last_pos.values()) + 1)
    return matched, best


def proximity_rerank(index_dir: str, store_dir: str, terms: list[str],
                     k: int = 10, k_prime: int = 50) -> pa.Table:
    """Two-stage retrieval: BM25 top-k' candidates, then proximity
    re-rank by (matched terms desc, min window asc, bm25 desc, doc_id) —
    the reference's multi-key final comparator shape
    (CompileRankedList.h:123-163), computed at serving time from the doc
    store instead of positional postings (positions stay out of the
    index; the candidate set is small)."""
    from .query import BM25Scorer

    scorer = BM25Scorer(index_dir)
    doc_ids, scores = scorer.score(terms, k_prime)
    store = DocStore(store_dir)
    docs = store.fetch([int(d) for d in doc_ids])
    content = {r["doc_id"]: r.get("content", "") for r in docs.to_pylist()} \
        if docs.num_rows else {}
    ranked = []
    for d, s in zip(doc_ids, scores):
        m, w = proximity_score(content.get(int(d), ""), terms)
        ranked.append((-m, w, -float(s), int(d)))
    ranked.sort()
    rows = [{"rank": i + 1, "doc_id": d, "matched_terms": -nm,
             "min_window": w if w < 10**9 else -1, "bm25": -ns}
            for i, (nm, w, ns, d) in enumerate(ranked[:k])]
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"rank": pa.array([], pa.int64())})


def _dedup_by_fingerprint(doc_ids, scores, content: dict,
                          text_col: str = "content"):
    """Keep the highest-ranked doc per token-sequence fingerprint — the
    reference's near-duplicate excerpt removal
    (/root/reference/DyableRequest/DyableQuery/CompileRankedList.h:203-242,
    excerpt checksum HitScore.h:262-267).  Candidates arrive rank-ordered;
    a doc whose fingerprint matches an earlier (higher-ranked) doc is
    dropped.  Returns the surviving (doc_id, score) pairs in rank order."""
    from ..functions.text import fingerprint_py
    from ..tokenizer import tokenize_py

    seen: set[int] = set()
    out = []
    for d, s in zip(doc_ids, scores):
        rec = content.get(int(d))
        if rec is None:
            # doc missing from the store (stale store vs index): its
            # content is UNKNOWN, not empty — treat it as unique rather
            # than collapsing every missing doc onto the empty-string
            # fingerprint and dropping all but the first
            out.append((int(d), float(s)))
            continue
        fp = fingerprint_py(tokenize_py(rec.get(text_col, "") or ""))
        if fp in seen:
            continue
        seen.add(fp)
        out.append((int(d), float(s)))
    return out


def search_dedup(index_dir: str, store_dir: str, terms: list[str],
                 k: int = 10, k_prime: int = 50,
                 text_col: str = "content") -> pa.Table:
    """BM25 top-k with serving-time near-duplicate removal (D2): retrieve
    the top ``k_prime`` candidates, fingerprint each candidate's token
    sequence from the doc store, and keep only the highest-ranked doc per
    fingerprint — duplicate content never reaches the final page.
    Output: (rank, doc_id) int64, first k survivors."""
    from .query import BM25Scorer

    scorer = BM25Scorer(index_dir)
    doc_ids, scores = scorer.score(terms, k_prime)
    store = DocStore(store_dir)
    docs = store.fetch([int(d) for d in doc_ids])
    content = {r["doc_id"]: r for r in docs.to_pylist()} if docs.num_rows else {}
    kept = _dedup_by_fingerprint(doc_ids, scores, content, text_col)[:k]
    return pa.table({
        "rank": pa.array(range(1, len(kept) + 1), pa.int64()),
        "doc_id": pa.array([d for d, _ in kept], pa.int64()),
    })


def search_with_snippets(index_dir: str, store_dir: str, terms: list[str],
                         k: int = 10, drop_near_dups: bool = False,
                         k_prime: int = 50,
                         text_col: str = "content") -> pa.Table:
    """Full serving path: BM25 top-k -> doc fetch -> snippets.

    The batch analog of the reference's CGI flow (query servers ->
    DocumentQuery servers -> rendered excerpts, SURVEY.md §3.3).
    ``drop_near_dups`` applies the D2 fingerprint filter over ``k_prime``
    candidates before the final page is assembled."""
    from .query import BM25Scorer

    scorer = BM25Scorer(index_dir)
    doc_ids, scores = scorer.score(terms, k_prime if drop_near_dups else k)
    store = DocStore(store_dir)
    docs = store.fetch([int(d) for d in doc_ids])
    content = {r["doc_id"]: r for r in docs.to_pylist()} if docs.num_rows else {}
    if drop_near_dups:
        kept = _dedup_by_fingerprint(doc_ids, scores, content, text_col)[:k]
    else:
        kept = [(int(d), float(s)) for d, s in zip(doc_ids, scores)]
    rows = []
    for rank, (d, s) in enumerate(kept, start=1):
        rec = content.get(int(d), {})
        rows.append({
            "rank": rank,
            "doc_id": int(d),
            "score": float(s),
            "repo": rec.get("repo", ""),
            "path": rec.get("path", ""),
            "snippet": make_snippet(rec.get(text_col, ""), terms),
        })
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"rank": pa.array([], pa.int64())})
