"""Relational operator library — the reference's MapReduce primitives.

The reference exposes 9 generic primitives dispatched by name
(/root/reference/DyableMapReduce/DyableCommand/DyableCommand.cpp:277-307,
ProcessSet.h:792-1117).  Each function here is the Ray-Data-native
equivalent, used by the driver-facing ``queries()`` entries and reusable
as library operators:

  KeyOccurrence        (ProcessSet.h:870-902)  -> key_occurrence
  DuplicateKeyOccurr.  (ProcessSet.h:912-956)  -> annotate_key_count
  KeyWeight            (ProcessSet.h:966-1043) -> key_weight
  MergeSet/MergeSorted (ProcessSet.h:1055-1117)-> merge_set
  ExternalHashMap join (ProcessSet.h:831-860)  -> broadcast_join
  ExternalRadixSort    (FileStorage.h:4347+)   -> Dataset.sort (not rebuilt)
  KthOrderStat         (MapReduce.h:15-300)    -> kth_percentile
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def key_occurrence(ds: rd.Dataset, key: str | list[str],
                   alias: str = "n") -> rd.Dataset:
    """Count per unique key (KeyOccurrence primitive)."""
    return ds.groupby(key).aggregate(Count(alias_name=alias))


def key_weight(ds: rd.Dataset, key: str | list[str], weight_col: str,
               alias: str = "w") -> rd.Dataset:
    """Sum of weights per key (KeyWeight primitive)."""
    return ds.groupby(key).aggregate(Sum(weight_col, alias_name=alias))


def annotate_key_count(ds: rd.Dataset, key: str, alias: str = "n") -> rd.Dataset:
    """Annotate EVERY row with its key's global count, rows preserved
    (DuplicateKeyOccurrence).  The count table is the small side: built by
    a groupby, broadcast once via ``ray.put``, and joined map-side —
    no second shuffle of the big table."""
    counts = ds.groupby(key).aggregate(Count(alias_name=alias)).to_pandas()
    lookup_ref = ray.put(dict(zip(counts[key], counts[alias])))

    def _annotate(batch: pa.Table) -> pa.Table:
        lut = ray.get(lookup_ref)
        vals = [lut[v] for v in batch[key].to_pylist()]
        return batch.append_column(alias, pa.array(vals, pa.int64()))

    return ds.map_batches(_annotate, batch_format="pyarrow", zero_copy_batch=True)


def merge_set(ds: rd.Dataset, key: str, value_col: str,
              alias: str = "vals") -> rd.Dataset:
    """Co-locate and sort all values of a key into one comma-joined string
    (MergeSortedSet).  String form keeps the result hash-comparable with
    DuckDB's ordered string_agg."""

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(g[value_col].to_numpy())
        return pd.DataFrame({key: [g[key].iloc[0]],
                             alias: [",".join(map(str, vals))]})

    return ds.groupby(key).map_groups(_merge, batch_format="pandas")


def broadcast_join(big: rd.Dataset, small: pd.DataFrame, on: str,
                   how: str = "inner") -> rd.Dataset:
    """Hash equi-join with a broadcast small side (ExternalHashMap shape):
    one ``ray.put`` of the dimension table, pandas merge per batch."""
    small_ref = ray.put(small)

    def _join(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(small_ref)
        return batch.merge(s, on=on, how=how)

    return big.map_batches(_join, batch_format="pandas")


def top_k(ds: rd.Dataset, sort_cols: list[str], descending: list[bool],
          k: int) -> rd.Dataset:
    """Global top-k via distributed sort + limit (the reference's
    CLimitedPQ / RankURLs shape, DyableSort/RankURLs/RankURLs.cpp:30-51)."""
    return ds.sort(sort_cols, descending=descending).limit(k)


def kth_percentile(ds: rd.Dataset, col: str, q: float) -> float:
    """Exact discrete percentile (KthOrderStat / FindOccurrenceThreshold,
    /root/reference/DyableLexonWords/LexonWords.cpp:87-102).

    Two-pass exact selection matched to DuckDB's ``quantile_disc``:
    value at sorted index ceil(q*n) - 1 (q in (0,1]).  The column is
    reduced to per-value counts first (groupby — dictionary-cardinality,
    tiny next to the input), so no full materialization."""
    counts = ds.groupby(col).aggregate(Count(alias_name="cnt")).to_pandas()
    counts = counts.sort_values(col).reset_index(drop=True)
    n = int(counts["cnt"].sum())
    target = max(0, int(np.ceil(q * n)) - 1)
    cum = counts["cnt"].cumsum()
    idx = int(np.searchsorted(cum.to_numpy(), target + 1))
    return counts[col].iloc[idx]
