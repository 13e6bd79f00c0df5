"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Replaces the reference's WARC/TREC ingest
(/root/reference/DyableParseTREC/DyableParseHTML/DyableParseHTML.cpp:19-116)
with a seeded generator for the Parquet corpus table
``(repo, path, commit, lang, content)`` from BASELINE.json's input_hint.

Every row is a pure function of ``(seed, row_index)`` so generation can be
fanned out with ``ray.data.range(n).map_batches(...)`` — the same content
is produced at any parallelism.  Row keys ``(repo, path, commit)`` are
constructed to be lexicographically increasing in row index, so the dense
``doc_id`` (rank over sorted keys, FIXTURES.md §1) equals the row index —
verified by tests against a real distributed rank.

Skew fixture: per-language keywords are injected at ~15% token rate, so
each keyword lands in >40% of documents — the analog of the reference's
stopword-heavy term distribution (its answer was to amputate stopwords,
Webpage.h:334-346; ours is lossless salted-key merge).
Duplicate fixture: rows with ``i % 100 == 99`` repeat row ``i-1``'s content.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

SEED = 42
VOCAB_SIZE = 30_000
ZIPF_S = 1.1

LANGS = ["py", "js", "java", "c", "cpp", "go", "rs", "rb"]
KEYWORDS = {
    "py": ["def", "return", "import", "class", "self", "if", "else", "for"],
    "js": ["function", "var", "const", "let", "return", "if", "else", "new"],
    "java": ["public", "static", "void", "class", "return", "new", "if", "else"],
    "c": ["int", "char", "void", "return", "if", "else", "for", "while"],
    "cpp": ["int", "void", "class", "return", "if", "else", "template", "const"],
    "go": ["func", "return", "if", "else", "for", "range", "var", "type"],
    "rs": ["fn", "let", "mut", "return", "if", "else", "match", "impl"],
    "rb": ["def", "end", "return", "if", "else", "do", "class", "module"],
}
# natural-language comment words, including tokenizer edge cases:
# 1-char (dropped by the 2..16 length gate), >16 chars (dropped),
# all-digit tokens (kept only when 4-5 digits long).
COMMENT_WORDS = [
    "the", "and", "of", "to", "in", "a", "i", "is", "this", "that",
    "handles", "returns", "value", "input", "output", "note", "todo",
    "supercalifragilisticexpialidocious", "1", "42", "2024", "65535", "123456",
]

_SYL = ["ba", "co", "de", "fi", "ga", "hu", "ki", "lo", "mi", "nu",
        "pa", "qu", "re", "si", "ta", "ve", "wo", "xe", "ya", "zo"]


def _build_vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic pseudo-identifier vocabulary (no RNG needed)."""
    vocab = []
    i = 0
    while len(vocab) < size:
        parts = []
        j = i
        for _ in range(2 + (i % 3)):
            parts.append(_SYL[j % len(_SYL)])
            j //= len(_SYL)
        vocab.append("".join(parts) + (str(i % 97) if i % 7 == 0 else ""))
        i += 1
    return vocab


_VOCAB: list[str] | None = None
_ZIPF_CDF: np.ndarray | None = None


def _vocab_and_cdf():
    global _VOCAB, _ZIPF_CDF
    if _VOCAB is None:
        _VOCAB = _build_vocab()
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        p = ranks ** (-ZIPF_S)
        p /= p.sum()
        _ZIPF_CDF = np.cumsum(p)
    return _VOCAB, _ZIPF_CDF


def _raw_content(i: int, seed: int = SEED) -> tuple[str, str]:
    """(lang, content) for row i, ignoring the duplicate fixture."""
    vocab, cdf = _vocab_and_cdf()
    rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
    lang = LANGS[i % len(LANGS)]
    kws = KEYWORDS[lang]
    n = int(np.clip(np.exp(rng.normal(np.log(300), 0.8)), 50, 2000))
    u = rng.random(n)
    body_idx = np.searchsorted(cdf, rng.random(n))
    kw_mask = u < 0.15
    comment_mask = (u >= 0.15) & (u < 0.22)
    toks = [vocab[j] for j in body_idx]
    kw_pos = np.flatnonzero(kw_mask)
    kw_pick = rng.integers(0, len(kws), len(kw_pos))
    for p, k in zip(kw_pos, kw_pick):
        toks[p] = kws[k]
    cm_pos = np.flatnonzero(comment_mask)
    cm_pick = rng.integers(0, len(COMMENT_WORDS), len(cm_pos))
    for p, k in zip(cm_pos, cm_pick):
        toks[p] = COMMENT_WORDS[k]
    # format as pseudo-code lines: ident ident(ident, ident) = ident; ...
    seps = [" ", " ", "(", ", ", ") ", " = ", ".", ";\n"]
    sep_pick = rng.integers(0, len(seps), n)
    out = []
    for t, s in zip(toks, sep_pick):
        out.append(t)
        out.append(seps[s])
    return lang, "".join(out)


def gen_rows(indices: np.ndarray, seed: int = SEED) -> pa.Table:
    """Generate corpus rows for the given row indices (vector of int)."""
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in map(int, indices):
        if i % 100 == 99 and i > 0:
            lang, content = _raw_content(i - 1, seed)
        else:
            lang, content = _raw_content(i, seed)
        repo = f"org{i // 512:07d}/repo{(i // 64) % 8:02d}"
        path = f"src/m{(i % 64):04d}/f{i:012d}.{lang}"
        commit = hashlib.blake2b(
            f"{seed}:{repo}:{path}".encode(), digest_size=20
        ).hexdigest()
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(content)
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def corpus_dataset(num_docs: int, seed: int = SEED, parallelism: int = -1):
    """Distributed corpus generation: range(n) -> map_batches(gen_rows)."""
    import ray.data as rd

    base = rd.range(num_docs, override_num_blocks=parallelism if parallelism > 0 else None)

    def _gen(batch: pa.Table) -> pa.Table:
        return gen_rows(batch["id"].to_numpy(), seed)

    return base.map_batches(_gen, batch_format="pyarrow", batch_size=2048)


def write_corpus(out_dir: str, num_docs: int, seed: int = SEED) -> str:
    """Materialize the corpus as partitioned Parquet under out_dir."""
    ds = corpus_dataset(num_docs, seed)
    ds.write_parquet(out_dir)
    return out_dir


def links_table(num_docs: int, seed: int = SEED) -> pa.Table:
    """Synthetic link table (FIXTURES.md §1.3): out-degree ~ Poisson(5),
    preferential-attachment targets (low doc ids are hubs — the scatter-skew
    fixture for PageRank, analog of DistributePulseScores.cpp:34-65)."""
    rng = np.random.Generator(np.random.PCG64(seed * 7 + 1))
    outdeg = rng.poisson(5.0, num_docs)
    src = np.repeat(np.arange(num_docs, dtype=np.uint64), outdeg)
    u = rng.random(len(src))
    dst = np.floor(num_docs * u * u).astype(np.uint64)  # quadratic skew -> hubs at low ids
    keep = dst != src
    src, dst = src[keep], dst[keep]
    w = np.zeros(num_docs, dtype=np.float32)
    cnt = np.bincount(src.astype(np.int64), minlength=num_docs)
    nz = cnt > 0
    w[nz] = 1.0 / cnt[nz]
    weight = w[src.astype(np.int64)]
    return pa.table(
        {
            "src": pa.array(src, pa.uint64()),
            "dst": pa.array(dst, pa.uint64()),
            "weight": pa.array(weight, pa.float32()),
        }
    )
