"""Single-process golden oracle (FIXTURES.md §3).

The reference's test strategy is dual implementation: every distributed
stage has a shadow ``CTest*`` class that recomputes the result naively in
memory and compares (e.g. ``CTestHitList``,
/root/reference/DyableCommand/TestHitList.h:35-140).  This module is that
shadow, made rigorous: a pure-Python engine with the same tokenizer, the
same term_id assignment, BM25 ``k1=1.2, b=0.75`` in float64, ties broken by
ascending doc_id (the reference's deterministic multi-key comparators,
/root/reference/DyableRequest/DyableQuery/CompileRankedList.h:123-163).
The Ray engine must match it exactly.
"""

from __future__ import annotations

import hashlib
import json
import math
from collections import Counter

import numpy as np

from .tokenizer import tokenize_py

K1 = 1.2
B = 0.75


def term_id64(term: str) -> int:
    """Deterministic SIGNED 64-bit term id (blake2b-8 two's-complement);
    identical in the engine (signed so Arrow/Ray groupby keys stay int64).

    Replaces the reference's sequential global word ids (division prefix
    sums, /root/reference/DyableLexonWords/LexonWords.cpp:110-153) with an
    order-free deterministic id — no cross-partition dependency."""
    return int.from_bytes(hashlib.blake2b(term.encode(), digest_size=8).digest(), "big", signed=True)


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()


class OracleIndex:
    """In-memory index over a list of (doc_id, content) rows."""

    def __init__(self, docs: list[tuple[int, str]],
                 exclude_terms: tuple[str, ...] = ()):
        # exclude_terms: the reference's stopword amputation
        # (Webpage.h:334-346) — excluded terms vanish before indexing,
        # so dl and positions are over the KEPT token sequence
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.doclen: dict[int, int] = {}
        # per (term, doc): ascending within-doc token positions (0-based) —
        # the positional shadow (reference SWordHit positions)
        self.positions: dict[str, dict[int, list[int]]] = {}
        excl = frozenset(exclude_terms)
        for doc_id, content in docs:
            toks = tokenize_py(content)
            if excl:
                toks = [t for t in toks if t not in excl]
            self.doclen[doc_id] = len(toks)
            for term, tf in sorted(Counter(toks).items()):
                self.postings.setdefault(term, []).append((doc_id, tf))
            for p, term in enumerate(toks):
                self.positions.setdefault(term, {}).setdefault(doc_id, []).append(p)
        for plist in self.postings.values():
            plist.sort()
        self.N = len(self.doclen)
        self.avgdl = (sum(self.doclen.values()) / self.N) if self.N else 0.0

    # --- golden tables -------------------------------------------------
    def dictionary(self) -> list[tuple[str, int, int, int]]:
        """(term, term_id, df, cf) sorted by term."""
        out = []
        for term in sorted(self.postings):
            pl = self.postings[term]
            out.append((term, term_id64(term), len(pl), sum(tf for _, tf in pl)))
        return out

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        if df == 0:
            return 0.0
        return math.log((self.N - df + 0.5) / (df + 0.5) + 1.0)

    def bm25_topk(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        """Exact BM25 over unique query terms; ties broken by doc_id asc.

        Scores are accumulated per-term in sorted-term order so float
        summation order is deterministic (SURVEY.md §7.4)."""
        scores: dict[int, float] = {}
        for term in sorted(set(terms)):
            pl = self.postings.get(term)
            if not pl:
                continue
            w = self.idf(term)
            for doc_id, tf in pl:
                dl = self.doclen[doc_id]
                s = w * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def lm_topk(self, terms: list[str], k: int = 10,
                mu: float = 2000.0) -> list[tuple[int, float]]:
        """Query-likelihood LM with Dirichlet smoothing (Zhai & Lafferty
        2001), per-matched-term decomposition: ln(1 + tf*C/(mu*cf)) +
        ln(mu/(dl+mu)).  Same IEEE op order as BM25Scorer.score_lm;
        sorted-term accumulation, ties broken by doc_id asc."""
        C = float(sum(self.doclen.values()))
        scores: dict[int, float] = {}
        for term in sorted(set(terms)):
            pl = self.postings.get(term)
            if not pl:
                continue
            cf = float(sum(tf for _, tf in pl))
            for doc_id, tf in pl:
                dl = self.doclen[doc_id]
                s = (math.log(1.0 + tf * C / (mu * cf))
                     + math.log(mu / (dl + mu)))
                scores[doc_id] = scores.get(doc_id, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def phrase_counts(self, phrase: list[str]) -> dict[int, int]:
        """Per-doc count of exact phrase occurrences (consecutive valid
        tokens) — shadow of the positional index's phrase scan."""
        if not phrase:
            return {}
        first = self.positions.get(phrase[0], {})
        out: dict[int, int] = {}
        for doc_id, pos0 in first.items():
            n = 0
            for p in pos0:
                if all(p + i in set(self.positions.get(t, {}).get(doc_id, []))
                       for i, t in enumerate(phrase[1:], start=1)):
                    n += 1
            if n:
                out[doc_id] = n
        return out

    def min_window(self, terms: list[str], doc_id: int) -> tuple[int, int]:
        """(matched unique terms, smallest token window covering all
        matched terms) — shadow of the index-driven proximity scorer."""
        occ = []
        for t in set(terms):
            for p in self.positions.get(t, {}).get(doc_id, []):
                occ.append((p, t))
        occ.sort()
        matched = len({t for _, t in occ})
        if matched < 2:
            return matched, 10**9
        best = 10**9
        last: dict[str, int] = {}
        for p, t in occ:
            last[t] = p
            if len(last) == matched:
                best = min(best, p - min(last.values()) + 1)
        return matched, best


def pagerank_oracle(
    src: np.ndarray, dst: np.ndarray, weight: np.ndarray, num_nodes: int,
    cycles: int = 20,
) -> np.ndarray:
    """PulseRank semantics (no damping teleport; normalize by net score),
    matching /root/reference/DyableWebGraph/DyablePuleRank/
    AccumulateHashDivision/AccumulateHashDivision.cpp:83-105 and
    PULSE_RANK_CYCLES=20 (DyableCommand.cpp:37).  Nodes with no inbound
    mass keep score 0 after the first cycle; a uniform epsilon seed keeps
    the iteration from collapsing (reference seeds each node with 1)."""
    score = np.ones(num_nodes, dtype=np.float64)
    src = src.astype(np.int64)
    dst = dst.astype(np.int64)
    w = weight.astype(np.float64)
    for _ in range(cycles):
        contrib = score[src] * w
        nxt = np.bincount(dst, weights=contrib, minlength=num_nodes)
        net = nxt.sum()
        if net > 0:
            nxt = nxt * (num_nodes / net)
        score = nxt
    return score


def make_queries(index: OracleIndex, n_total: int = 200, seed: int = 42,
                 k: int = 10) -> list[dict]:
    """Fixed query set drawn from the index dictionary (FIXTURES.md §2):
    80 single-term (40 mid-df / 20 high-df / 20 rare), 80 two-term,
    30 three-to-five-term, 10 with unknown terms."""
    terms = sorted(index.postings)
    dfs = np.array([len(index.postings[t]) for t in terms])
    return queries_from_dictionary(terms, dfs, n_total, seed, k)


def queries_from_dictionary(terms: list[str], dfs: np.ndarray,
                            n_total: int = 200, seed: int = 42,
                            k: int = 10) -> list[dict]:
    """Same query-set recipe, driven by a (term, df) dictionary table —
    used by the bench where the oracle index would be too large."""
    rng = np.random.Generator(np.random.PCG64(seed))
    order = np.argsort(dfs)
    n = len(terms)
    rare = [terms[i] for i in order[: max(1, n // 10)]]
    mid = [terms[i] for i in order[n // 3: 2 * n // 3]]
    high = [terms[i] for i in order[-max(1, n // 20):]]

    def pick(pool, m):
        idx = rng.integers(0, len(pool), m)
        return [pool[i] for i in idx]

    queries: list[dict] = []
    qid = 0
    for pool, m in ((mid, 40), (high, 20), (rare, 20)):
        for t in pick(pool, m):
            queries.append({"qid": qid, "terms": [t], "k": k}); qid += 1
    for _ in range(80):
        queries.append({"qid": qid, "terms": pick(mid, 1) + pick(high + mid, 1), "k": k}); qid += 1
    for _ in range(30):
        m = int(rng.integers(3, 6))
        queries.append({"qid": qid, "terms": pick(mid + high + rare, m), "k": k}); qid += 1
    for j in range(10):
        queries.append({"qid": qid, "terms": [f"zzqqxxnotaterm{j}"], "k": k}); qid += 1
    return queries[:n_total]


def write_queries(path: str, queries: list[dict]) -> None:
    with open(path, "w") as f:
        for q in queries:
            f.write(json.dumps(q) + "\n")
