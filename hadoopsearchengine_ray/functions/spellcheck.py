"""Spell correction over the index dictionary (T5 analog).

The reference builds a permutation index over the lexicon for query-time
spelling suggestions (``CSpellCheck``,
/root/reference/FileStorage.h:798-1150).  This is the modern equivalent:
a SymSpell-style deletion index — every dictionary term is indexed under
each of its 1-deletion variants, so edit-distance<=1 (and most distance-2)
lookups are O(len(term)) dictionary probes instead of a scan.  Built once
per scorer actor (``__init__`` state), suggestions ranked by collection
frequency descending, term ascending (deterministic).
"""

from __future__ import annotations

from collections import defaultdict


def _deletions(term: str) -> set[str]:
    return {term[:i] + term[i + 1:] for i in range(len(term))} | {term}


def _edit_distance_le(a: str, b: str, cap: int = 2) -> int:
    """Banded Levenshtein, early-exit above cap."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = cap + 1
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
            lo = min(lo, cur[j])
        if lo > cap:
            return cap + 1
        prev = cur
    return prev[-1]


class SpellIndex:
    """Deletion-variant index over (term, cf) pairs."""

    def __init__(self, terms: list[str], cfs: list[int]):
        self.cf = dict(zip(terms, cfs))
        self.delindex: dict[str, list[str]] = defaultdict(list)
        for t in terms:
            for d in _deletions(t):
                self.delindex[d].append(t)

    @classmethod
    def from_index_dir(cls, index_dir: str) -> "SpellIndex":
        import os

        import pyarrow.dataset as pads

        tbl = pads.dataset(os.path.join(index_dir, "dictionary")).to_table(
            columns=["term", "cf"])
        return cls(tbl.column("term").to_pylist(), tbl.column("cf").to_pylist())

    def _candidates(self, word: str) -> set[str]:
        """Dictionary terms sharing a 1-deletion variant with ``word``
        — the SymSpell candidate pool ``suggest`` and
        ``within_distance`` both filter."""
        cands: set[str] = set()
        for d in _deletions(word):
            cands.update(self.delindex.get(d, ()))
        return cands

    def suggest(self, word: str, max_suggestions: int = 5,
                max_distance: int = 2) -> list[str]:
        """Nearest dictionary terms: exact -> distance-ranked candidates."""
        if word in self.cf:
            return [word]
        cands = self._candidates(word)
        scored = []
        for c in cands:
            dist = _edit_distance_le(word, c, max_distance)
            if dist <= max_distance:
                scored.append((dist, -self.cf[c], c))
        scored.sort()
        return [c for _, _, c in scored[:max_suggestions]]

    def within_distance(self, word: str, max_distance: int = 1) -> list[str]:
        """ALL dictionary terms with plain Levenshtein distance <=
        ``max_distance`` from ``word`` (including ``word`` itself when
        indexed), sorted ascending — the fuzzy-query expansion set.
        Complete for ``max_distance=1`` by the SymSpell 1-deletion
        guarantee (both deletion sets include the identity); the
        1-deletion index only gives PARTIAL distance-2 recall, so
        fuzzy search keeps the bound at 1."""
        if max_distance > 1:
            raise ValueError("within_distance is complete only for "
                             "max_distance=1 over a 1-deletion index")
        cands = self._candidates(word)
        return sorted(
            c for c in cands
            if _edit_distance_le(word, c, max_distance) <= max_distance)

    def correct_query(self, terms: list[str]) -> list[str]:
        """Replace unknown terms by their best suggestion (or keep as-is
        when nothing is near — the empty-result contract stays reachable)."""
        out = []
        for t in terms:
            s = self.suggest(t, 1)
            out.append(s[0] if s else t)
        return out
