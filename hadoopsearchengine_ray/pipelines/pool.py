"""Doc-range-partitioned BM25 scorer pool — the reference's distributed
SearchHitItems serving tier.

The reference fans a query out to N servers, each owning one doc-id
range slice (``BoundaryPartion``,
/root/reference/DyableRequest/SearchHitItems/SearchHitItems.h:300-315),
and the front-end merges per-server candidates
(/root/reference/DyableRequest/SearchHitItems/Query.cpp:137-171).  Here
each range owner is a plain Ray ACTOR (raw actors are justified: shared
mutable scorer state — dictionary, doclen slice, posting caches — served
across many queries; the Dataset API has no long-lived server shape)
holding an ``IndexReader(doc_lo, doc_hi)``:

- its doclen read is row-group-filtered to the range,
- posting decode touches only the skip blocks intersecting the range
  (a hot term's salted doc-range sub-shards outside the range never
  decode — the salting scheme and the range partitioning share the same
  axis by design),
- every doc's FULL score is computed by exactly one owner (global
  N/avgdl/df), so the driver's (-score, doc_id) merge of per-range
  top-k lists is exact — rank-identical to the single-reader path
  (asserted in tests/test_pool.py).

At cluster scale each actor holds 1/num_ranges of the doclen array and
decodes 1/num_ranges of every posting list; num_ranges scales with nodes
while the index layout stays fixed.
"""

from __future__ import annotations

import numpy as np
import ray


@ray.remote
class _RangeScorer:
    """One doc-range owner: scores its slice, returns GLOBAL doc ids."""

    def __init__(self, index_dir: str, doc_lo: int, doc_hi: int,
                 delta_dirs: list[str] | None = None,
                 tombstones: list[int] | None = None,
                 nrt_stats: tuple | None = None):
        from .delta import MergedIndexReader, TombstoneReader
        from .query import BM25Scorer, IndexReader

        self.lo = doc_lo
        self.hi = doc_hi
        if delta_dirs:
            # delta-merged range view: global stats (N/avgdl from
            # segment metas, df summed over segment dictionaries) are
            # range-independent, so the per-range merge stays exact
            reader = MergedIndexReader([index_dir] + list(delta_dirs),
                                       doc_lo=doc_lo, doc_hi=doc_hi)
        else:
            reader = IndexReader(index_dir, doc_lo=doc_lo, doc_hi=doc_hi)
        if tombstones:
            # tombstones arrive GLOBAL; the range reader speaks LOCAL
            # ids.  nrt_stats carries the pool-computed corrected
            # (N, avgdl, deleted_df) so this owner never decodes a full
            # posting list to learn a global df.
            local = [t - doc_lo for t in tombstones
                     if doc_lo <= t < doc_hi]
            if nrt_stats is None:
                raise ValueError("range owners need pool-computed "
                                 "global stats to serve tombstones")
            reader = TombstoneReader(reader, set(local), stats=nrt_stats)
        self.scorer = BM25Scorer(index_dir, reader=reader)

    def score(self, terms: list[str], k: int):
        d, s = self.scorer.score(terms, k)
        return d + self.lo, s

    def score_many(self, queries: list[tuple[list[str], int]]):
        """Batched replay (one RPC per query batch, not per query)."""
        return [self.score(t, k) for t, k in queries]

    def score_lm(self, terms: list[str], k: int, mu: float = 2000.0):
        """LM-Dirichlet over this range: collection stats (cf, C) come
        from the GLOBAL dictionary, per-doc tf/dl from the range-local
        postings — each doc fully scored by its one owner, so the
        driver merge is exact (same argument as BM25 ``score``)."""
        d, s = self.scorer.score_lm(terms, k, mu=mu)
        return d + self.lo, s

    def explain(self, terms: list[str], doc_id: int) -> dict:
        """Score breakdown for one GLOBAL doc id (must live in this
        range — the pool routes to the owning actor)."""
        return self.scorer.explain(terms, int(doc_id))

    def score_query(self, qstr: str, k: int):
        """Parsed query-string front-end over this range: required
        intersection / exclusion / wildcard expansion all act on the
        range-local postings (global dictionary, global idf/avgdl), so
        each doc's full score still comes from exactly one owner and
        the driver merge stays exact."""
        d, s = self.scorer.score_query(qstr, k)
        return d + self.lo, s

    def score_after(self, terms: list[str], k: int,
                    after_score: float | None, after_doc: int):
        """Cursor page over this range.  ``after_score=None`` is the
        FIRST page and runs the same dense pass later cuts compare
        against — MaxScore floats (``score``) differ from dense floats
        in the last ULP for multi-term docs, so a cursor minted from a
        MaxScore page would duplicate/drop boundary docs.  The GLOBAL
        cursor doc translates into the local id space (global = local
        + lo is monotone, so the same cut applies)."""
        if after_score is None:
            d, s = self.scorer.score_exact(terms, k)
        else:
            d, s = self.scorer.score_after(terms, k, after_score,
                                           int(after_doc) - self.lo)
        return d + self.lo, s

    def facet_heads(self, terms: list[str], k: int, facet_col: str,
                    parquet_path: str, id_col: str = "doc_id"):
        """Per-facet BM25 top-``k`` over THIS doc range: the range-local
        dense pass scores every matched doc in [lo, hi) (global
        df/avgdl, same per-doc accumulation order as the full reader →
        bit-identical scores), the facet column is fetched with a
        doc-id-range-pruned parquet read, and only facets × k head rows
        leave the owner.  The global per-facet top-k is contained in
        the union of per-owner heads (owners partition the doc space),
        so the driver's facets × k × ranges merge is exact."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.dataset as pads

        d, s = self.scorer.score_exact(terms, 1 << 62)
        empty = pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                              facet_col: pd.array([], dtype="object"),
                              "score": pd.array([], dtype="float64")})
        if len(d) == 0:
            return empty
        gd = (np.asarray(d, np.int64) + self.lo)
        order = np.argsort(gd)
        gd_s = gd[order]
        sc_s = np.asarray(s, np.float64)[order]
        tbl = pads.dataset(parquet_path).to_table(
            columns=[id_col, facet_col],
            filter=((pads.field(id_col) >= int(self.lo))
                    & (pads.field(id_col) < int(self.hi))))
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(gd_s, ids)
        pos[pos == len(gd_s)] = 0
        hit = gd_s[np.minimum(pos, len(gd_s) - 1)] == ids \
            if len(gd_s) else np.zeros(len(ids), bool)
        sub = tbl.filter(pa.array(hit)).to_pandas()
        if sub.empty:
            return empty
        sub = sub.rename(columns={id_col: "doc_id"})
        sub["score"] = sc_s[np.searchsorted(gd_s, ids[hit])]
        sub = sub.sort_values([facet_col, "score", "doc_id"],
                              ascending=[True, False, True])
        return sub.groupby(facet_col, sort=False, dropna=False) \
            .head(k)[["doc_id", facet_col, "score"]]

    def phrase_counts(self, phrase: list[str]):
        """Exact-phrase counts over this range: positions decode only
        from the skip blocks intersecting it (range-local ids), and a
        doc's occurrences live wholly inside one range, so per-range
        results concatenate exactly."""
        from .positional import phrase_counts

        d, c = phrase_counts(self.scorer.rd, phrase)
        return d + self.lo, c

    def near_counts(self, term_a: str, term_b: str, slop: int,
                    ordered: bool):
        """NEAR pair counts over this range (same exactness argument
        as ``phrase_counts``)."""
        from .positional import near_counts

        d, c = near_counts(self.scorer.rd, term_a, term_b, slop=slop,
                           ordered=ordered)
        return d + self.lo, c


class RangePartitionedPool:
    """N range-owner actors + exact driver-side top-k merge.

    Deltas and tombstones are auto-discovered (``serve_live=True``), so
    a pool over an index that has seen ``add_documents`` /
    ``delete_documents`` serves the SAME results as ``merged_scorer``
    — the reference's servers likewise reload the current index
    generation, never a stale one.  Tombstone serving needs
    ``corpus_path`` (the exact df correction re-tokenizes just the
    deleted docs, delta.nrt_serving_stats)."""

    def __init__(self, index_dir: str, num_ranges: int = 4,
                 corpus_path: str | None = None, serve_live: bool = True,
                 nrt_cache: dict | None = None):
        import json
        import os

        from .delta import (
            list_delta_dirs,
            load_tombstones,
            nrt_serving_stats,
        )

        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = json.load(f)
        space = int(meta.get("doc_id_space", meta["num_docs"]))
        live_n = int(meta["num_docs"])
        live_avgdl = float(meta["avgdl"])
        delta_dirs: list[str] = []
        tomb: list[int] = []
        nrt_stats = None
        if serve_live:
            delta_dirs = list_delta_dirs(index_dir)
            total_tokens = int(meta["total_tokens"])
            for d in delta_dirs:
                with open(os.path.join(d, "meta.json")) as f:
                    dm = json.load(f)
                space = max(space,
                            int(dm.get("doc_id_space", dm["num_docs"])))
                live_n += int(dm["num_docs"])
                total_tokens += int(dm["total_tokens"])
            if delta_dirs:
                live_avgdl = total_tokens / live_n if live_n else 0.0
            tomb = sorted(load_tombstones(index_dir))
            if tomb and (tomb[0] < 0 or tomb[-1] >= space):
                # the same loud check TombstoneReader runs for the
                # single reader — a never-indexed id would silently
                # skew every owner's N/avgdl correction otherwise
                bad = tomb[0] if tomb[0] < 0 else tomb[-1]
                raise ValueError(
                    f"tombstone id {bad} outside the served doc-id "
                    f"space ({space}); only indexed doc ids may be "
                    "deleted")
            if tomb:
                nrt_stats = nrt_serving_stats(
                    index_dir, corpus_path, delta_dirs=delta_dirs,
                    tombstones=set(tomb), cache=nrt_cache)
                live_n, live_avgdl = nrt_stats[0], nrt_stats[1]
        self.doc_space = space
        self.live_n = live_n          # docs actually served (deltas in,
        self.live_avgdl = live_avgdl  # tombstones out) — stats op truth
        self.num_deltas = len(delta_dirs)
        self.num_tombstones = len(tomb)
        # broadcast the (possibly large) tombstone list + deleted-df map
        # ONCE via the object store, not once per owner
        tomb_ref = ray.put(tomb) if tomb else None
        stats_ref = ray.put(nrt_stats) if nrt_stats is not None else None
        bounds = np.linspace(0, space, num_ranges + 1).astype(np.int64)
        self.bounds = [(int(lo), int(hi))
                       for lo, hi in zip(bounds[:-1], bounds[1:])
                       if hi > lo]
        self.actors = [
            _RangeScorer.remote(index_dir, lo, hi,
                                delta_dirs=delta_dirs or None,
                                tombstones=tomb_ref,
                                nrt_stats=stats_ref)
            for lo, hi in self.bounds
        ]

    @staticmethod
    def _merge(parts, k: int):
        docs = np.concatenate([p[0] for p in parts]) if parts \
            else np.empty(0, np.int64)
        scores = np.concatenate([p[1] for p in parts]) if parts \
            else np.empty(0, np.float64)
        if len(docs) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        order = np.lexsort((docs.astype(np.int64), -scores))[:k]
        return docs[order].astype(np.int64), scores[order]

    def score(self, terms: list[str], k: int):
        parts = ray.get([a.score.remote(terms, k) for a in self.actors])
        return self._merge(parts, k)

    def score_query(self, qstr: str, k: int):
        """Parsed query-string search through the range tier — same
        exact-merge argument as ``score`` (every doc scored by exactly
        one owner with global stats)."""
        parts = ray.get([a.score_query.remote(qstr, k)
                         for a in self.actors])
        return self._merge(parts, k)

    def score_lm(self, terms: list[str], k: int, mu: float = 2000.0):
        """LM-Dirichlet (Zhai & Lafferty 2001) through the range tier:
        owners score with GLOBAL collection stats (cf/C from the shared
        dictionary), so the per-range top-k merge is exact — same
        argument as BM25 ``score``."""
        parts = ray.get([a.score_lm.remote(terms, k, mu)
                         for a in self.actors])
        return self._merge(parts, k)

    def explain(self, terms: list[str], doc_id: int) -> dict:
        """Per-term score breakdown for one doc, answered by its ONE
        owning range actor (no fan-out): bit-identical to the dense
        pass because the owner explains with the same global stats and
        op order the scorer uses."""
        doc_id = int(doc_id)
        for (lo, hi), a in zip(self.bounds, self.actors):
            if lo <= doc_id < hi:
                return ray.get(a.explain.remote(terms, doc_id))
        raise ValueError(f"doc_id {doc_id} outside the served doc-id "
                         f"space [0, {self.doc_space})")

    def score_after(self, terms: list[str], k: int,
                    after_score: float | None = None,
                    after_doc: int = -1):
        """Cursor pagination through the range tier: every owner
        applies the same global (score, doc_id) cut, so the per-range
        pages merge exactly — stateless deep paging on the serving
        pool.  Mint cursors ONLY from pages of THIS method: page 1 is
        ``score_after(terms, k)`` (no cursor), which runs the dense
        pass the cut compares against.  ``score``'s MaxScore floats
        can differ in the last ULP for docs matching 3+ terms, and a
        cursor from them would duplicate or drop the boundary doc."""
        parts = ray.get([a.score_after.remote(
            terms, k,
            None if after_score is None else float(after_score),
            int(after_doc))
            for a in self.actors])
        return self._merge(parts, k)

    def facet_heads(self, terms: list[str], k: int, facet_col: str,
                    parquet_path: str, id_col: str = "doc_id"):
        """Per-facet top-k candidate rows through the range tier: each
        owner scores its slice and ships only facets × k head rows —
        the driver never holds the matched (doc_id, score) set.  The
        caller finishes with the same deterministic
        (facet, score DESC, doc_id) sort + head the small path uses."""
        import pandas as pd

        parts = ray.get([a.facet_heads.remote(terms, k, facet_col,
                                              parquet_path, id_col)
                         for a in self.actors])
        live = [p for p in parts if len(p)]
        if not live:
            return parts[0] if parts else pd.DataFrame(
                {"doc_id": pd.array([], dtype="int64"),
                 facet_col: pd.array([], dtype="object"),
                 "score": pd.array([], dtype="float64")})
        return pd.concat(live, ignore_index=True)

    def phrase_counts(self, phrase: list[str]):
        """Exact-phrase (doc_id, count) through the range tier: ranges
        partition the doc space, so per-range results concatenate into
        the globally doc-sorted answer — no merge logic needed."""
        parts = ray.get([a.phrase_counts.remote(phrase)
                         for a in self.actors])
        return self._concat_counts(parts)

    def near_counts(self, term_a: str, term_b: str, slop: int = 3,
                    ordered: bool = False):
        """NEAR predicate through the range tier (same concatenation
        argument as ``phrase_counts``)."""
        parts = ray.get([a.near_counts.remote(term_a, term_b, slop,
                                              ordered)
                         for a in self.actors])
        return self._concat_counts(parts)

    @staticmethod
    def _concat_counts(parts):
        live = [p for p in parts if len(p[0])]
        if not live:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return (np.concatenate([p[0] for p in live]).astype(np.int64),
                np.concatenate([p[1] for p in live]).astype(np.int64))

    def replay(self, queries: list[dict]) -> list[tuple[np.ndarray, np.ndarray]]:
        """Replay a query set: ONE batched RPC per actor, merged per
        query on the driver (the bench path)."""
        qs = [(q["terms"], int(q.get("k", 10))) for q in queries]
        per_actor = ray.get([a.score_many.remote(qs) for a in self.actors])
        out = []
        for qi, (_, k) in enumerate(qs):
            out.append(self._merge([pa_[qi] for pa_ in per_actor], k))
        return out

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
