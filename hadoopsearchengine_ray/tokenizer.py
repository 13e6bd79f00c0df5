"""The engine's single tokenizer spec — shared by the Ray stages, the
pure-Python oracle, and the DuckDB oracle SQL, so all three agree exactly.

Mirrors the reference tokenizer's behavior class
(``ScanTextSegment``/``ProcessNextWord``,
/root/reference/DyableDocument/DyableIndex/DocumentInstance.h:50-158):
lowercase, split on non-alphanumeric, keep words of length 2..16
(length gate at :94), and drop all-digit tokens unless they are 4-5 digits
long (the numeric gate at :105-109).

Rules (normative):
  1. lowercase the text
  2. split on the regex ``[^a-z0-9]+``
  3. keep tokens with ``2 <= len(token) <= 16``
  4. drop tokens matching ``^[0-9]+$`` unless ``4 <= len <= 5``

Equivalent DuckDB SQL fragment over a text column ``t`` (see
``__ray_entry__.oracle_sql``)::

    SELECT ... FROM (
      SELECT unnest(string_split_regex(lower(t), '[^a-z0-9]+')) AS term ...
    ) WHERE length(term) BETWEEN 2 AND 16
      AND (NOT regexp_full_match(term, '[0-9]+') OR length(term) BETWEEN 4 AND 5)
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPLIT_RE = r"[^a-z0-9]+"
MIN_LEN, MAX_LEN = 2, 16
NUM_MIN, NUM_MAX = 4, 5

_PY_SPLIT = re.compile(SPLIT_RE)
_PY_DIGITS = re.compile(r"^[0-9]+$")


def tokenize_py(text: str) -> list[str]:
    """Reference (oracle) tokenizer — one doc -> list of terms in order."""
    out = []
    for t in _PY_SPLIT.split(text.lower()):
        n = len(t)
        if n < MIN_LEN or n > MAX_LEN:
            continue
        if t.isdigit() and not (NUM_MIN <= n <= NUM_MAX):
            continue
        out.append(t)
    return out


def tokenize_column(texts: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """Vectorized Arrow tokenizer: string column -> list<string> column.

    Pure pyarrow.compute: lower -> regex split -> flatten -> gates -> regroup.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lowered = pc.utf8_lower(texts)
    split = pc.split_pattern_regex(lowered, SPLIT_RE)
    flat = pc.list_flatten(split)
    lens = pc.utf8_length(flat)
    keep = pc.and_(pc.greater_equal(lens, MIN_LEN), pc.less_equal(lens, MAX_LEN))
    is_num = pc.match_substring_regex(flat, r"^[0-9]+$")
    num_ok = pc.and_(pc.greater_equal(lens, NUM_MIN), pc.less_equal(lens, NUM_MAX))
    keep = pc.and_(keep, pc.or_(pc.invert(is_num), num_ok))
    # regroup the filtered flat tokens back into one list per document
    keep_np = keep.to_numpy(zero_copy_only=False)
    offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    kept_per_doc = np.add.reduceat(
        np.concatenate([keep_np.astype(np.int64), [0]]), offsets[:-1]
    )
    kept_per_doc[offsets[:-1] == offsets[1:]] = 0  # empty docs
    new_offsets = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32)
    kept_tokens = pc.array_filter(flat, keep)
    return pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), kept_tokens)
