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
              alias: str = "vals", num_buckets: int = 32) -> rd.Dataset:
    """Co-locate and sort all values of a key into one comma-joined string
    (MergeSortedSet).  String form keeps the result hash-comparable with
    DuckDB's ordered string_agg.

    Keys are hash-bucketed so the shuffle sees ``num_buckets`` groups;
    the per-key joins run vectorized inside each bucket (a map_groups per
    key pays ~1ms of overhead per group — BASELINE.md)."""
    import pyarrow as pa

    def _bucket(batch: pa.Table) -> pa.Table:
        k = batch[key]
        h = pd.util.hash_array(k.to_pandas().to_numpy())
        return batch.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, value_col])
        out = (g.groupby(key, sort=True)[value_col]
               .agg(lambda v: ",".join(map(str, v)))
               .reset_index())
        return out.rename(columns={value_col: alias})

    return (ds.map_batches(_bucket, batch_format="pyarrow", batch_size=None)
            .groupby("__bucket")
            .map_groups(_merge, batch_format="pandas"))


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


def asof_join(left: rd.Dataset, right: rd.Dataset, by: str, on: str,
              value_cols: list[str], combine_blocks: int = 16) -> rd.Dataset:
    """As-of join: for each left row, the latest right row with the same
    ``by`` key and ``right.on <= left.on``.

    Ray Data has no native as-of join; this is the documented composition
    (ray_guide "As-of / range join"): co-partition both sides by the
    ``by`` key via one groupby over the union (sides tagged), then
    ``pd.merge_asof`` per group on the sorted ``on`` column.  Partitioning
    assumption: one key's rows fit one task (salt by time range if not)."""
    import pyarrow as pa

    def _tag(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            cols = {c: batch[c] for c in batch.column_names}
            cols["__side"] = pa.array(np.full(batch.num_rows, side, np.int8))
            return pa.table(cols)
        return _t

    lt = left.map_batches(_tag(0), batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(_tag(1), batch_format="pyarrow", batch_size=None)
    both = lt.union(rt)

    left_cols = left.schema().names

    def _asof(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][left_cols].sort_values(on)
        rg = g[g["__side"] == 1][[by, on] + value_cols].sort_values(on)
        if len(lg) == 0:
            return pd.DataFrame(columns=left_cols + value_cols)
        if len(rg) == 0:
            out = lg.copy()
            for c in value_cols:
                out[c] = pd.NA
            return out
        rg = rg.rename(columns={on: "__r_on"})
        out = pd.merge_asof(lg, rg.drop(columns=[by]), left_on=on,
                            right_on="__r_on", direction="backward")
        return out.drop(columns=["__r_on"])

    return both.groupby(by).map_groups(_asof, batch_format="pandas")


def sessionize(events: rd.Dataset, key: str, ts_col: str,
               gap_seconds: int = 1800,
               tiebreak: str | None = None) -> rd.Dataset:
    """Session ids per key: a new session starts when the gap since the
    previous event exceeds ``gap_seconds`` (the streaming-window analog,
    SURVEY.md §2.10 — Ray Data has no event-time windows, so windows are
    per-key sorted ``map_groups``; ordering contract: sorted by
    (ts, tiebreak) within key).  Gap compares native microseconds — no
    truncation, exact parity with SQL ``epoch_us`` arithmetic."""
    gap_us = gap_seconds * 1_000_000

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        order = [ts_col] + ([tiebreak] if tiebreak else [])
        g = g.sort_values(order).reset_index(drop=True)
        ts = g[ts_col].astype("int64")  # microseconds
        new = (ts.diff().fillna(0) > gap_us).astype("int64")
        g["session_id"] = new.cumsum()
        return g

    return events.groupby(key).map_groups(_sessions, batch_format="pandas")


def top_k_per_group(ds: rd.Dataset, key: str, sort_col: str, k: int,
                    descending: bool = True,
                    num_buckets: int = 32) -> rd.Dataset:
    """Top-k rows per key (window row_number <= k analog): per-key sort
    with (sort_col, then remaining columns) deterministic order.  Keys are
    hash-bucketed; the per-key heads run vectorized inside each bucket."""
    import pyarrow as pa

    def _bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(batch[key].to_pandas().to_numpy())
        return batch.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def _heads(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__bucket"])
        other = [c for c in g.columns if c not in (sort_col, key)]
        g = g.sort_values([key, sort_col] + other,
                          ascending=[True, not descending] + [True] * len(other))
        return g.groupby(key, sort=False).head(k)

    return (ds.map_batches(_bucket, batch_format="pyarrow", batch_size=None)
            .groupby("__bucket")
            .map_groups(_heads, batch_format="pandas"))


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
