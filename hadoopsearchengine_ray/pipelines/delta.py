"""Incremental (delta) indexing: add documents without a full rebuild.

The reference rebuilds from scratch (stage toggling is its only
"resume"); real users of an index need to append documents.  Design:
new docs build a normal SMALL index (same stages, same codec) into a
delta directory; serving merges main + deltas logically:

- doc ids are disjoint by contract (delta ids must be >= the main
  index's doc_id_space — validated loudly);
- BM25 stats merge exactly: N and total_tokens add, df(term) adds, so
  idf/avgdl over the merged reader equal a full rebuild's — merged
  top-k is RANK-IDENTICAL to rebuilding from scratch (tested, and the
  bm25_delta_topk driver query shares the full-corpus SQL oracle);
- posting lists concatenate in reader order = ascending doc ranges, so
  the doc-ordered invariants (delta-gap decode, MaxScore skip blocks)
  hold without re-encoding.

Compaction (``compact_index``) folds main + deltas + tombstones into a
fresh standalone index.  The default strategy is the posting-level blob
merge (pipelines/compaction.py): one streaming pass over the segments'
already-encoded posting rows — no token shuffle, O(index bytes).  The
fallback/re-tuning strategy is a token-level rebuild: union the
checkpointed per-segment token tables minus tombstones and rerun the
standard distributed stages 2-7 (build_index._build_from_tokens),
paying the posting shuffle again but re-packing every term into
minimal rows.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from .build_index import build_index
from .query import BM25Scorer, IndexReader


def _delta_key(corpus_path: str) -> str:
    import hashlib

    return hashlib.sha256(corpus_path.encode()).hexdigest()[:12]


def list_delta_dirs(main_index_dir: str) -> list[str]:
    """Sorted delta dirs under ``main/deltas`` with a COMPLETE build
    (meta.json present) — the single source of delta auto-discovery for
    serving and compaction.  A half-built delta (crashed add_documents)
    is skipped with a warning instead of crashing the caller; it
    resumes on the next add_documents for the same corpus."""
    droot = os.path.join(main_index_dir, "deltas")
    if not os.path.isdir(droot):
        return []
    out = []
    for d in sorted(os.listdir(droot)):
        p = os.path.join(droot, d)
        if os.path.exists(os.path.join(p, "meta.json")):
            out.append(p)
        else:
            print(f"[delta] skipping half-built delta {p} (no meta.json);"
                  " re-run add_documents to finish it", file=sys.stderr)
    return out


class MergedIndexReader:
    """IndexReader-compatible view over a main index + delta indexes.

    ``doc_lo``/``doc_hi`` restrict the view to one GLOBAL doc-id range
    (each segment reader applies the same global slice and returns
    LOCAL ids = global - doc_lo), so a range-pool owner can serve a
    delta-merged index: global stats (N, avgdl, per-term df summed over
    segment dictionaries) are range-independent, so every doc's full
    score still comes from exactly one owner and the per-range top-k
    merge stays exact."""

    def __init__(self, index_dirs: list[str], doc_lo: int = 0,
                 doc_hi: int | None = None):
        readers = [IndexReader(d, doc_lo=doc_lo, doc_hi=doc_hi)
                   for d in index_dirs]
        self.doc_lo = int(doc_lo)
        # order by ascending doc range (posting-list concatenation and
        # positional searchsorted both assume globally ascending doc ids)
        # and fail loudly on overlapping ranges — overlaps would silently
        # double-count dl/df.  Validation runs over the NON-EMPTY readers
        # only, pairwise-adjacent after the sort: an empty segment
        # sorting between two overlapping ranges must not hide them.
        readers.sort(key=lambda r: r.min_doc_id)
        nonempty = [r for r in readers if r.max_doc_id >= 0]
        nonempty.sort(key=lambda r: r.min_doc_id)
        for a, b in zip(nonempty, nonempty[1:]):
            if a.max_doc_id >= b.min_doc_id:
                raise ValueError(
                    f"merged indexes have overlapping doc-id ranges "
                    f"([{a.min_doc_id},{a.max_doc_id}] vs "
                    f"[{b.min_doc_id},{b.max_doc_id}]) — renumber deltas")
        self.readers = readers
        metas = [r.meta for r in self.readers]
        self.N = sum(m["num_docs"] for m in metas)
        total = sum(m["total_tokens"] for m in metas)
        self.avgdl = total / self.N if self.N else 0.0
        self.k1 = metas[0]["k1"]
        self.b = metas[0]["b"]
        self.doc_space = max(r.doc_space for r in self.readers)
        self.dl = np.zeros(self.doc_space, dtype=np.float64)
        for r in self.readers:
            self.dl[: len(r.dl)] += r.dl   # disjoint id ranges by contract

    def lookup(self, term: str):
        tid, df = None, 0
        for r in self.readers:
            ent = r.lookup(term)
            if ent:
                tid = ent[0]
                df += ent[1]
        return (tid, df) if tid is not None else None

    def idf(self, df: int) -> float:
        return float(np.log((self.N - df + 0.5) / (df + 0.5) + 1.0))

    def expand_prefix(self, prefix: str, max_expansions: int = 512) -> list[str]:
        """Wildcard expansion over the UNION of segment dictionaries —
        same loud cap semantics as the single reader's."""
        out: set[str] = set()
        for r in self.readers:
            out.update(r.expand_prefix(prefix, max_expansions))
        if len(out) > max_expansions:
            raise ValueError(
                f"prefix {prefix!r} expands to {len(out)} terms across "
                f"segments (> {max_expansions}); use a longer prefix or "
                "raise max_expansions")
        return sorted(out)

    def posting_rows(self, term: str) -> list[dict]:
        out = []
        for r in self.readers:   # reader order == ascending doc ranges
            out.extend(r.posting_rows(term))
        return out

    def decoded_postings(self, term: str):
        parts = [r.decoded_postings(term) for r in self.readers]
        docs = [p[0] for p in parts if len(p[0])]
        tfs = [p[1] for p in parts if len(p[1])]
        if not docs:
            e = np.empty(0, np.uint64)
            return e, e
        return np.concatenate(docs), np.concatenate(tfs)

    def decoded_positions(self, term: str):
        parts = [r.decoded_positions(term) for r in self.readers]
        docs = [p[0] for p in parts if len(p[0])]
        if not docs:
            e = np.empty(0, np.uint64)
            return e, e, e, np.zeros(1, np.int64)
        tf_all = np.concatenate([p[1] for p in parts if len(p[0])])
        flat = np.concatenate([p[2] for p in parts if len(p[0])])
        offs = np.concatenate(([0], np.cumsum(tf_all))).astype(np.int64)
        return np.concatenate(docs), tf_all, flat, offs


def add_documents(main_index_dir: str, corpus_path: str,
                  text_col: str = "text", id_col: str = "doc_id",
                  **build_kwargs) -> str:
    """Build (or resume) a delta index for ``corpus_path`` under
    ``main_index_dir/deltas/<fingerprint>``; returns the delta dir.

    The new corpus must carry EXPLICIT doc ids disjoint from the main
    index (>= its doc_id_space) — overlapping ids would corrupt merged
    doc lengths and postings, so they fail loudly."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    with open(os.path.join(main_index_dir, "meta.json")) as f:
        main_meta = json.load(f)
    # the floor covers the main index AND every existing delta (each
    # records its own doc_id_space = max id + 1) — adding docs whose ids
    # overlap a PREVIOUS delta must fail just as loudly
    floor = main_meta["doc_id_space"]
    droot = os.path.join(main_index_dir, "deltas")
    if os.path.isdir(droot):
        for d in os.listdir(droot):
            mp = os.path.join(droot, d, "meta.json")
            if os.path.exists(mp) and mp != os.path.join(
                    droot, _delta_key(corpus_path), "meta.json"):
                with open(mp) as f:
                    floor = max(floor, json.load(f)["doc_id_space"])
    # min id from parquet row-group statistics (no driver
    # materialization of the id column); statistics-less files fall
    # back to a column scan of just those fragments
    dset = pads.dataset(corpus_path)
    min_id = None
    for frag in dset.get_fragments():
        frag_min = None
        md = getattr(frag, "metadata", None)
        if md is not None:
            try:
                ci = md.schema.to_arrow_schema().get_field_index(id_col)
                mins = [md.row_group(g).column(ci).statistics.min
                        for g in range(md.num_row_groups)
                        if md.row_group(g).num_rows]
                frag_min = min(mins) if mins else None
            except (AttributeError, TypeError):
                frag_min = None
        if frag_min is None:
            t = frag.to_table(columns=[id_col])
            frag_min = pc.min(t[id_col]).as_py() if t.num_rows else None
        if frag_min is not None:
            min_id = frag_min if min_id is None else min(min_id, frag_min)
    if min_id is not None and min_id < floor:
        raise ValueError(
            f"delta doc ids must be >= the covered doc_id_space "
            f"({floor}, main + existing deltas); got min id {min_id} — "
            "renumber the new docs before indexing")
    # the main index's semantic build knobs propagate to the delta —
    # a delta indexing terms the main amputated (M3 exclude list) would
    # silently diverge from a rebuild's ranking
    if "exclude_terms" not in build_kwargs:
        build_kwargs["exclude_terms"] = tuple(
            main_meta.get("exclude_terms", ()))
    delta_dir = os.path.join(main_index_dir, "deltas", _delta_key(corpus_path))
    build_index(corpus_path, delta_dir, id_mode="column", id_col=id_col,
                text_col=text_col,
                with_positions=main_meta.get("with_positions", True),
                **build_kwargs)
    # record the delta's source corpus: tombstone df-correction for
    # range-pool serving (nrt_serving_stats) re-reads deleted docs'
    # text from it, and id-pruned reads need to know where ids live.
    # tmp + os.replace (the tombstones.json pattern): a crash mid-write
    # must not leave a complete delta with corrupt _SOURCE JSON.
    src_path = os.path.join(delta_dir, "_SOURCE")
    with open(src_path + ".tmp", "w") as f:
        json.dump({"corpus_path": os.path.abspath(corpus_path),
                   "text_col": text_col, "id_col": id_col}, f)
    os.replace(src_path + ".tmp", src_path)
    return delta_dir


def nrt_serving_stats(main_index_dir: str, corpus_path: str | None,
                      delta_dirs: list[str] | None = None,
                      tombstones: set[int] | None = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      cache: dict | None = None):
    """Corrected GLOBAL BM25 stats for tombstoned serving, computed ONCE
    (driver/daemon side) so every range-pool owner scores with identical
    statistics: ``(N_corr, avgdl_corr, deleted_df)``.

    Mirrors ``TombstoneReader``'s lazy arithmetic operation-for-operation
    (same float op order) so pool scores are bit-identical to the
    single merged reader's.  The per-term ``deleted_df`` map comes from
    RE-TOKENIZING just the deleted docs' text (an id-pruned parquet read
    of len(tombstones) rows — O(deleted docs), not O(index)); posting
    membership equals the tokenizer's distinct-term set by construction
    of the index, so ``df - deleted_df[t]`` equals the lazy path's
    survivor count exactly.  Deleted docs are read from the main corpus
    plus each delta's recorded ``_SOURCE``; ids not found in any source
    fail loudly (a stale/moved corpus would silently skew stats).
    Returns None when there are no tombstones."""
    import pyarrow.dataset as pads

    if delta_dirs is None:
        delta_dirs = list_delta_dirs(main_index_dir)
    if tombstones is None:
        tombstones = load_tombstones(main_index_dir)
    if not tombstones:
        return None
    if corpus_path is None:
        raise ValueError(
            "serving a tombstoned index through the range pool needs "
            "the corpus path (deleted docs are re-tokenized for the "
            "exact df correction) — pass corpus_path, or compact the "
            "index (compact_index) and serve the result")
    from ..tokenizer import tokenize_py

    segments = [main_index_dir] + list(delta_dirs)
    metas = []
    for seg in segments:
        with open(os.path.join(seg, "meta.json")) as f:
            metas.append(json.load(f))
    if len(segments) == 1:
        base_n = metas[0]["num_docs"]
        base_avgdl = metas[0]["avgdl"]          # IndexReader reads meta
    else:
        base_n = sum(m["num_docs"] for m in metas)
        total = sum(m["total_tokens"] for m in metas)
        base_avgdl = total / base_n if base_n else 0.0   # MergedIndexReader

    tomb_sorted = sorted(int(t) for t in tombstones)
    # ``cache`` (caller-owned, e.g. the serving daemon's) holds the
    # per-doc I/O products — dl float + distinct-term set — so a stream
    # of one-doc deletes pays corpus/doclen reads and tokenization only
    # for the NEW ids; the final reductions below always run over the
    # full sorted set so the float summation order (and thus avgdl)
    # stays bit-identical to the uncached / lazy-TombstoneReader path.
    if cache is None:
        cache = {}
    dl_by_id: dict[int, float] = cache.setdefault("dl", {})
    terms_by_id: dict[int, frozenset] = cache.setdefault("terms", {})
    need = [t for t in tomb_sorted if t not in terms_by_id]
    need_set = set(need)

    if need:
        sources = [(corpus_path, text_col, id_col)]
        for d in delta_dirs:
            sp = os.path.join(d, "_SOURCE")
            if os.path.exists(sp):
                with open(sp) as f:
                    s = json.load(f)
                sources.append((s["corpus_path"],
                                s.get("text_col", text_col),
                                s.get("id_col", id_col)))
        found: set[int] = set()
        for src, tcol, icol in sources:
            dset = pads.dataset(src)
            names = dset.schema.names
            if tcol not in names and "content" in names:
                tcol = "content"
            if icol not in names:
                raise ValueError(
                    f"corpus {src} has no id column {icol!r} — tombstone "
                    "serving needs corpus-stable doc ids")
            tbl = dset.to_table(columns=[icol, tcol],
                                filter=pads.field(icol).isin(need))
            for i, txt in zip(tbl.column(icol).to_pylist(),
                              tbl.column(tcol).to_pylist()):
                if int(i) in need_set:
                    terms_by_id[int(i)] = frozenset(tokenize_py(txt or ""))
                    found.add(int(i))
        missing = need_set - found
        if missing:
            for i in found:       # partial results must not poison the
                terms_by_id.pop(i, None)   # cache for a later retry
            raise ValueError(
                f"{len(missing)} tombstoned doc ids not found in the "
                f"corpus sources (e.g. {sorted(missing)[:5]}) — corpus "
                "moved or delta _SOURCE missing; compact the index "
                "instead")
        # removed token mass: per-doc dl from the SEGMENT doclen tables
        # (the exact float64 values TombstoneReader sums via
        # base.dl[tomb]); zero-token docs are absent -> 0.0
        for seg in segments:
            dlt = pads.dataset(os.path.join(seg, "doclen")).to_table(
                filter=pads.field("doc_id").isin(need))
            for i, v in zip(dlt.column("doc_id").to_pylist(),
                            dlt.column("dl").to_pylist()):
                dl_by_id[int(i)] = float(np.float64(np.int64(v)))
        for t in need:
            dl_by_id.setdefault(t, 0.0)

    arr = np.array([dl_by_id[t] for t in tomb_sorted], dtype=np.float64)
    removed_dl = float(arr.sum())
    total_f = base_avgdl * base_n
    n_corr = base_n - len(tomb_sorted)
    avgdl_corr = ((total_f - removed_dl) / n_corr) if n_corr else 0.0

    deleted_df: dict[str, int] = {}
    for t in tomb_sorted:
        for term in terms_by_id[t]:
            deleted_df[term] = deleted_df.get(term, 0) + 1
    return n_corr, avgdl_corr, deleted_df


def merged_scorer(main_index_dir: str,
                  delta_dirs: list[str] | None = None) -> BM25Scorer:
    """BM25Scorer over main + deltas (deltas auto-discovered when not
    given), rank-identical to a scorer over a full rebuild.  Tombstoned
    docs (delete_documents) are excluded from results and stats."""
    if delta_dirs is None:
        delta_dirs = list_delta_dirs(main_index_dir)
    reader = MergedIndexReader([main_index_dir] + list(delta_dirs))
    tomb = load_tombstones(main_index_dir)
    if tomb:
        reader = TombstoneReader(reader, tomb)
    return BM25Scorer(main_index_dir, reader=reader)


# ---------------------------------------------------------------------------
# deletion (tombstones)
# ---------------------------------------------------------------------------

def _tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones.json")


def load_tombstones(index_dir: str) -> set[int]:
    p = _tombstone_path(index_dir)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f))


def delete_documents(index_dir: str, doc_ids) -> set[int]:
    """Tombstone doc ids: deleted docs disappear from results AND from
    the BM25 statistics (N, avgdl, df, dl) without touching the posting
    files — the standard soft-delete; compaction = rebuild over the
    surviving corpus.  Idempotent; returns the full tombstone set.

    Contract: every id must be a REAL indexed doc — out-of-range ids
    fail loudly at reader construction; over a SPARSE doc-id space a
    never-indexed in-range id cannot be detected and would skew the
    N/avgdl correction (dense spaces, the default, have no such ids)."""
    tomb = load_tombstones(index_dir) | {int(d) for d in doc_ids}
    tmp = _tombstone_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(sorted(tomb), f)
    os.replace(tmp, _tombstone_path(index_dir))
    return tomb


class TombstoneReader:
    """Reader wrapper excluding tombstoned docs from postings and stats.

    df/N/avgdl corrections make scoring EXACT vs a rebuild over the
    surviving docs: per-term df subtracts the deleted docs found in the
    posting list (computed lazily per looked-up term), N and total
    tokens subtract the deleted docs' lengths."""

    def __init__(self, base, tombstones: set[int], stats=None):
        self._base = base
        self._tomb = np.fromiter(sorted(tombstones), np.int64,
                                 len(tombstones))
        if len(self._tomb) and int(self._tomb[-1]) >= base.doc_space:
            raise ValueError(
                f"tombstone id {int(self._tomb[-1])} outside the doc-id "
                f"space ({base.doc_space}); only indexed doc ids may be "
                "deleted (N/avgdl correction assumes real docs)")
        if stats is None:
            # lazy mode (single full reader): N/avgdl from the base's
            # dl array, per-term df by decoding + counting survivors
            removed_dl = float(base.dl[self._tomb].sum())
            total = base.avgdl * base.N
            self.N = base.N - len(self._tomb)
            self.avgdl = ((total - removed_dl) / self.N) if self.N else 0.0
            self._deleted_df = None
        else:
            # injected mode (range-pool owners): the pool computed the
            # corrected GLOBAL stats once — N, avgdl, and a per-term
            # deleted-doc-count map (from tokenizing the deleted docs'
            # text, nrt_serving_stats) — so every owner scores with
            # identical global statistics without decoding full posting
            # lists; tombstones here are BASE-LOCAL ids (global -
            # doc_lo), matching what _alive compares against
            self.N, self.avgdl, self._deleted_df = stats
        self.k1, self.b = base.k1, base.b
        self.doc_space = base.doc_space
        # MaxScore phase-2 translates global skip-block ids by doc_lo
        self.doc_lo = getattr(base, "doc_lo", 0)
        self.dl = base.dl.copy()
        self.dl[self._tomb] = 0.0
        self._df_cache: dict[str, tuple] = {}
        # byte-budgeted like IndexReader._dec_store: hot-term decoded
        # posting arrays can be MBs each, so an entry-count bound alone
        # could hold GBs before an epoch clear
        self._post_cache: dict[str, tuple] = {}
        self._post_bytes = 0
        self._post_budget = 256 * 1024 * 1024

    def _post_store(self, term: str, value: tuple) -> None:
        nbytes = sum(getattr(v, "nbytes", 0) for v in value)
        if self._post_bytes + nbytes > self._post_budget:
            self._post_cache.clear()   # epoch eviction
            self._post_bytes = 0
        if nbytes <= self._post_budget:
            self._post_cache[term] = value
            self._post_bytes += nbytes

    def _alive(self, docs: np.ndarray) -> np.ndarray:
        if len(self._tomb) == 0:
            return np.ones(len(docs), dtype=bool)
        d = docs.astype(np.int64)
        idx = np.minimum(np.searchsorted(self._tomb, d),
                         len(self._tomb) - 1)
        return self._tomb[idx] != d

    def lookup(self, term: str):
        ent = self._df_cache.get(term)
        if ent is not None:
            return ent if ent != () else None
        base_ent = self._base.lookup(term)
        if base_ent is None:
            self._df_cache[term] = ()
            return None
        tid, base_df = base_ent
        if self._deleted_df is not None:
            # injected mode: df correction is a dict hit (the map counts
            # deleted docs CONTAINING the term — identical to the lazy
            # keep.sum() below because postings membership == the
            # tokenizer's distinct-term set by construction of the index)
            out = (tid, base_df - int(self._deleted_df.get(term, 0)))
            self._df_cache[term] = out
            return out
        d, f = self._base.decoded_postings(term)
        keep = self._alive(d)
        # cache the filtered decode: MaxScore's lookup would otherwise
        # pay a full posting decode AND phase 1 would decode again
        self._post_store(term, (d[keep], f[keep]))
        out = (tid, int(keep.sum()))
        self._df_cache[term] = out
        return out   # df 0 still a valid entry (idf ~ max)

    def idf(self, df: int) -> float:
        return float(np.log((self.N - df + 0.5) / (df + 0.5) + 1.0))

    def expand_prefix(self, prefix: str, max_expansions: int = 512) -> list[str]:
        # expansions whose every doc is tombstoned contribute nothing
        # (filtered postings come back empty), matching a rebuild's
        # absent term — delegation is exact
        return self._base.expand_prefix(prefix, max_expansions)

    def decoded_postings(self, term: str):
        hit = self._post_cache.get(term)
        if hit is not None:
            return hit
        d, f = self._base.decoded_postings(term)
        if len(d) == 0 or len(self._tomb) == 0:
            return d, f
        keep = self._alive(d)
        out = (d[keep], f[keep])
        # injected mode never warms the cache via lookup — store here so
        # hot terms filter once per reader, not once per query
        self._post_store(term, out)
        return out

    def posting_rows(self, term: str) -> list[dict]:
        # rows keep tombstoned entries (block metadata would go stale
        # otherwise); the scorer's dense paths mask via dl=0 and the
        # filtered decoded_postings.  MaxScore uses posting_rows only
        # for block-sliced partial scoring of already-touched docs, and
        # a dl=0 tombstoned doc contributes score only if it was touched
        # — which the filtered phase-1 lists prevent.
        return self._base.posting_rows(term)

    def decoded_positions(self, term: str):
        d, f, flat, offs = self._base.decoded_positions(term)
        if len(d) == 0 or len(self._tomb) == 0:
            return d, f, flat, offs
        keep = self._alive(d)
        fi = f.astype(np.int64)
        flat_keep = np.repeat(keep, fi)
        f2 = f[keep]
        offs2 = np.concatenate(([0], np.cumsum(f2.astype(np.int64))))
        return d[keep], f2, flat[flat_keep], offs2


# ---------------------------------------------------------------------------
# compaction (main + deltas + tombstones -> fresh standalone index)
# ---------------------------------------------------------------------------

def compact_index(main_index_dir: str, out_dir: str,
                  delta_dirs: list[str] | None = None,
                  mode: str = "auto",
                  **build_kwargs) -> dict:
    """Fold ``main_index_dir`` + its deltas + its tombstones into a
    fresh standalone index at ``out_dir``; returns the new meta dict.

    Two strategies (the reference's only compaction is a from-scratch
    pipeline rerun — stage toggling,
    /root/reference/DyableCommand/DyableCommand.cpp:641-724):

    - ``merge`` (pipelines/compaction.py): posting-level blob merge —
      one streaming pass over the segments' encoded posting rows, NO
      token shuffle; tombstoned docs filtered in place, untouched rows
      copied verbatim.  O(index bytes), no all-to-all.
    - ``rebuild``: union the segments' checkpointed token tables (minus
      tombstones) and rerun the standard distributed stages 2-7 — full
      posting shuffle, but re-packs every term into minimal rows and
      honours ``build_kwargs`` re-tuning (hot_df_frac, shard counts).

    ``mode="auto"`` (default) uses merge, falling back to rebuild when
    segments are merge-incompatible or when build_kwargs are passed
    (re-tuning implies re-encoding).  Both are resumable via
    ``out_dir``'s manifest.  Doc ids are NOT renumbered, and the
    compacted ``doc_id_space`` keeps the pre-compaction ceiling so
    doc-store rows and future delta-id floors stay valid.
    """
    if mode not in ("auto", "merge", "rebuild"):
        raise ValueError(f"unknown compaction mode {mode!r}")
    if mode != "rebuild" and not build_kwargs:
        from .compaction import MergeIncompatible, merge_compact_index

        try:
            return merge_compact_index(main_index_dir, out_dir, delta_dirs)
        except MergeIncompatible as e:
            if mode == "merge":
                raise
            print(f"[compact] merge-incompatible ({e}); falling back to "
                  "token-level rebuild", file=sys.stderr)
    elif mode == "merge":
        raise ValueError("mode='merge' does not honour build_kwargs — "
                         "use mode='rebuild' to re-tune the index")
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray.data as rd

    from ..state.manifest import Manifest, lineage_fingerprint
    from .build_index import INDEX_FORMAT_VERSION, _build_from_tokens

    if os.path.abspath(out_dir) == os.path.abspath(main_index_dir):
        raise ValueError("compaction must write to a NEW directory — "
                         "compacting in place would destroy the inputs "
                         "it is still reading")
    if delta_dirs is None:
        delta_dirs = list_delta_dirs(main_index_dir)
    segments = [main_index_dir] + list(delta_dirs)
    metas = []
    for seg in segments:
        with open(os.path.join(seg, "meta.json")) as f:
            metas.append(json.load(f))
    main_meta = metas[0]
    tomb = load_tombstones(main_index_dir)
    space_floor = max((m["doc_id_space"] for m in metas), default=0)
    # delete_documents' contract: every tombstone is a real indexed doc,
    # so the alive count is a pure subtraction (zero-token docs included
    # — they are corpus rows even though they appear in no token row).
    # An out-of-range id would skew N/avgdl forever: fail loudly here,
    # like TombstoneReader does at serving time.
    if tomb:
        lo_t, hi_t = min(tomb), max(tomb)
        if lo_t < 0 or hi_t >= space_floor:
            raise ValueError(
                f"tombstone id {hi_t if hi_t >= space_floor else lo_t} "
                f"outside the segments' doc-id space ({space_floor}); "
                "only indexed doc ids may be deleted")
    alive_docs = sum(m["num_docs"] for m in metas) - len(tomb)
    with_positions = bool(main_meta.get("with_positions", True))
    id_col = main_meta.get("id_col", "doc_id")

    # only segments that indexed at least one doc carry a tokens dir
    tok_srcs = [os.path.join(s, "tokens") for s in segments
                if os.path.isdir(os.path.join(s, "tokens"))]
    sha_srcs = [os.path.join(s, "sha256") for s in segments
                if os.path.isdir(os.path.join(s, "sha256"))]

    lineage = (f"compact:v{INDEX_FORMAT_VERSION}:pos={int(with_positions)}:"
               + lineage_fingerprint(
                   tok_srcs + [_tombstone_path(main_index_dir)]))
    os.makedirs(out_dir, exist_ok=True)
    man = Manifest.load(os.path.join(out_dir, "manifest.json"))
    tokens_dir = os.path.join(out_dir, "tokens")

    tomb_arr = pa.array(sorted(tomb), pa.uint64())

    def _merged(srcs: list[str], key: str) -> rd.Dataset:
        # read_parquet expands a single directory but treats a LIST as
        # file paths — enumerate the segment files explicitly.  ``key``
        # names the doc-id column of THIS table: token tables are
        # always keyed "doc_id" (tokenize emits doc_id regardless of
        # id_col); only the sha table carries the source id column.
        files = sorted(
            os.path.join(r, f)
            for s in srcs for r, _, fs in os.walk(s) for f in fs
            if f.endswith(".parquet"))
        ds = rd.read_parquet(files)
        if tomb:
            def _drop(batch: pa.Table) -> pa.Table:
                return batch.filter(
                    pc.invert(pc.is_in(batch[key].cast(pa.uint64()),
                                       value_set=tomb_arr)))

            ds = ds.map_batches(_drop, batch_format="pyarrow",
                                zero_copy_batch=True)
        return ds

    if not man.is_done("tokens", lineage, tokens_dir):
        man.start("tokens", lineage, tokens_dir)
        shutil.rmtree(tokens_dir, ignore_errors=True)
        _merged(tok_srcs, "doc_id").write_parquet(tokens_dir)
        if sha_srcs:
            sha_dir = os.path.join(out_dir, "sha256")
            shutil.rmtree(sha_dir, ignore_errors=True)
            _merged(sha_srcs, id_col).write_parquet(sha_dir)
        n_tokens = int(pads.dataset(tokens_dir).count_rows())
        man.finish("tokens", token_rows=n_tokens, corpus_docs=alive_docs)

    return _build_from_tokens(
        out_dir, man, lineage,
        hot_df_frac=build_kwargs.get(
            "hot_df_frac", main_meta.get("hot_df_frac", 0.25)),
        num_shards=build_kwargs.get("num_shards", main_meta["num_shards"]),
        num_salts=build_kwargs.get("num_salts", main_meta["num_salts"]),
        num_index_parts=build_kwargs.get(
            "num_index_parts", main_meta["num_index_parts"]),
        id_col=id_col,
        with_positions=with_positions,
        exclude_terms=tuple(main_meta.get("exclude_terms", ())),
        doc_id_space_floor=space_floor,
    )


def maybe_compact(main_index_dir: str, out_dir: str,
                  max_segments: int = 4,
                  max_tombstone_frac: float = 0.1,
                  mode: str = "auto", **build_kwargs) -> dict | None:
    """Tiered maintenance trigger (the merge-policy analog of Lucene's
    segment thresholds): compact when the segment count exceeds
    ``max_segments`` OR tombstones exceed ``max_tombstone_frac`` of the
    indexed docs; otherwise a no-op returning None.  The caller swaps
    ``out_dir`` in for ``main_index_dir`` after a non-None return —
    compaction never mutates its inputs, so serving can keep reading
    the old segments until the swap."""
    delta_dirs = list_delta_dirs(main_index_dir)
    total = 0
    for seg in [main_index_dir] + delta_dirs:
        with open(os.path.join(seg, "meta.json")) as f:
            total += json.load(f)["num_docs"]
    tomb_frac = len(load_tombstones(main_index_dir)) / total if total else 0.0
    if 1 + len(delta_dirs) <= max_segments and tomb_frac <= max_tombstone_frac:
        return None
    return compact_index(main_index_dir, out_dir, delta_dirs,
                         mode=mode, **build_kwargs)
