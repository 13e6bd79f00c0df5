"""Text normalizers: suffix-strip stemmer (M4) and HTML stripper (M1).

The reference marks SUFFIX hits by stripping suffixes against a list
(/root/reference/FileStorage.h:712-724, suffix list loaded at :567-569)
and segments HTML into text vs tag regions
(/root/reference/DyableParseTREC/DyableParseHTML/DyableParseHTML.cpp:123-151,
``RemoveHTMLTag`` DocumentInstance.h:160-204).  Both are rebuilt as pure
Arrow-vectorized maps with rule sets mirrored 1:1 in the DuckDB oracle
SQL (see __ray_entry__): stemming = strip the longest listed suffix when
the remaining stem keeps >= MIN_STEM chars; HTML stripping = drop
<...> tag spans and collapse the text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# longest-match-first; a standard English inflection list (public
# knowledge — the reference's GlobalData suffix list is data, not code)
SUFFIXES = ["ations", "ingly", "ation", "ments", "ness", "ings",
            "ions", "ment", "able", "ible", "tion", "ally",
            "ies", "ing", "ion", "ers", "est", "ous",
            "ed", "er", "es", "ly", "al", "s"]
MIN_STEM = 3


def stem_py(term: str) -> str:
    """Reference (oracle) stemmer — longest listed suffix stripped when
    the remainder keeps >= MIN_STEM chars."""
    for suf in sorted(SUFFIXES, key=len, reverse=True):
        if term.endswith(suf) and len(term) - len(suf) >= MIN_STEM:
            return term[: -len(suf)]
    return term


def stem_column(terms: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized stemmer over a string column: one regex pass per
    suffix LENGTH class is avoided by a single alternation anchored at
    end-of-string, longest alternative first (RE2 alternation is
    leftmost-longest here because alternatives are listed longest
    first), guarded by the MIN_STEM lookbehind-free prefix ``...``."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    alt = "|".join(sorted(SUFFIXES, key=len, reverse=True))
    # .{3,}? before the suffix enforces MIN_STEM on the remaining stem
    return pc.replace_substring_regex(
        terms, f"^(.{{{MIN_STEM},}}?)({alt})$", r"\1")


def stemmed_token_table(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """(doc_id, stem, tf) — token table with stemmed terms (int64 tf)."""
    from ..tokenizer import tokenize_column

    def _tok(batch: pa.Table) -> pa.Table:
        from .._tokflat import doc_term_counts, flat_token_view

        toks = tokenize_column(batch[text_col])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        _, d, codes, doc_idx = flat_token_view(
            toks, flat=stem_column(toks.flatten()))
        u_doc, u_code, cnt = doc_term_counts(codes, doc_idx)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[u_doc], pa.int64()),
            "stem": d.dictionary.take(
                pa.array(u_code.astype(np.int32))).cast(pa.string()),
            "tf": pa.array(cnt, pa.int64()),
        })

    return docs.map_batches(_tok, batch_format="pyarrow", zero_copy_batch=True)


TAG_RE = r"<[^>]*>"


def strip_html_py(html: str) -> str:
    """Reference (oracle) HTML stripper: tags -> space, whitespace
    collapsed, trimmed."""
    import re

    text = re.sub(TAG_RE, " ", html)
    return re.sub(r"\s+", " ", text).strip()


def strip_html_column(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized: drop <...> spans, collapse whitespace, trim."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    text = pc.replace_substring_regex(html, TAG_RE, " ")
    text = pc.replace_substring_regex(text, r"\s+", " ")
    return pc.utf8_trim_whitespace(text)


def strip_html_table(docs: rd.Dataset, html_col: str = "html",
                     id_col: str = "doc_id") -> rd.Dataset:
    """(doc_id, text) — tag-stripped text per doc."""

    def _strip(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "text": strip_html_column(batch[html_col]),
        })

    return docs.map_batches(_strip, batch_format="pyarrow", zero_copy_batch=True)
