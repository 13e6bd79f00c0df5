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


def annotate_key_count(ds: rd.Dataset, key: str, alias: str = "n",
                       broadcast_limit: int = 2_000_000) -> rd.Dataset:
    """Annotate EVERY row with its key's global count, rows preserved
    (DuplicateKeyOccurrence).  Up to ``broadcast_limit`` distinct keys the
    count table is the small side: broadcast once via ``ray.put`` and
    probed map-side with a vectorized ``Series.map`` — no second shuffle
    of the big table.  Above the limit (high-cardinality key) it falls
    back to the co-partitioned ``hash_join``."""
    counts = ds.groupby(key).aggregate(Count(alias_name=alias)).materialize()
    if counts.count() > broadcast_limit:
        return hash_join(ds, counts, on=key)
    pdf = counts.to_pandas()
    lookup_ref = ray.put(pd.Series(pdf[alias].to_numpy(),
                                   index=pdf[key].to_numpy()))

    def _annotate(batch: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(lookup_ref)
        batch[alias] = batch[key].map(lut).astype("int64")
        return batch

    return ds.map_batches(_annotate, batch_format="pandas")


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

    return (_coalesce_for_buckets(
                ds.map_batches(_bucket, batch_format="pyarrow",
                               batch_size=None), num_buckets)
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


# rows per side under which ``join`` picks the broadcast plan
BROADCAST_JOIN_MAX_ROWS = 2_000_000


def _coalesce_for_buckets(ds: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """Coalesce pre-shuffle blocks to the bucket count.  The sort shuffle
    behind ``groupby`` creates ~B output ranges for B input blocks and
    B×R partition objects; with only ``num_buckets`` distinct group keys,
    anything past ~num_buckets blocks is pure scheduling overhead
    (measured 3.4× on range_join at 128 tiny input blocks).  Block size
    becomes ≈ total/num_buckets — the same one-bucket-per-task assumption
    these operators already document, so raising ``num_buckets`` for
    bigger inputs keeps blocks bounded too."""
    return ds.repartition(num_buckets)


def _as_arrow_schema(schema) -> pa.Schema:
    """Ray's Dataset.schema() wraps the Arrow schema; unwrap it.  Pandas
    block schemas convert dtype-by-dtype; a column whose "type" is an
    object exemplar (e.g. an ndarray cell) maps to a list type when the
    exemplar is an ndarray, else to string (best effort — callers only
    use this for null padding and dtype restore)."""
    base = getattr(schema, "base_schema", schema)
    if isinstance(base, pa.Schema):
        return base
    if base is None:
        raise ValueError(
            "dataset has no schema (empty aggregate?); materialize and "
            "handle the empty case before joining")
    fields = []
    for n, t in zip(base.names, base.types):
        try:
            fields.append((n, pa.from_numpy_dtype(t)))
        except (TypeError, pa.ArrowNotImplementedError):
            if isinstance(t, np.ndarray):
                fields.append((n, pa.list_(pa.from_numpy_dtype(t.dtype))))
            elif isinstance(t, (bytes, bytearray)):
                fields.append((n, pa.binary()))
            else:
                fields.append((n, pa.string()))
    return pa.schema(fields)


def hash_join(left: rd.Dataset, right: rd.Dataset, on: str | list[str],
              how: str = "inner", num_buckets: int = 64,
              restore_order_col: str | None = None) -> rd.Dataset:
    """Large×large shuffle equi-join — the general ExternalHashMap
    (/root/reference/ProcessSet.h:831-860): both sides are tagged and
    co-partitioned by key hash in ONE shuffle (union -> groupby(bucket)),
    then each bucket runs a single vectorized pandas merge.  Neither side
    is materialized on the driver or broadcast.

    ``restore_order_col``: optional column to sort the result by — the
    analog of the reference's OrderMappedSets original-order restore
    (callers carry their own row-index column; Datasets are unordered).

    Partitioning assumption: one bucket's rows fit one task; raise
    ``num_buckets`` for bigger inputs (buckets ~ total_rows / 5M)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    lschema = _as_arrow_schema(left.schema())
    rschema = _as_arrow_schema(right.schema())
    lcols, rcols = list(lschema.names), list(rschema.names)
    overlap = (set(lcols) & set(rcols)) - set(on_cols)
    if overlap:
        raise ValueError(f"hash_join requires disjoint non-key columns; "
                         f"rename {sorted(overlap)} first")
    types = {f.name: f.type for f in lschema}
    types.update({f.name: f.type for f in rschema})
    all_cols = lcols + [c for c in rcols if c not in lcols]
    # side-0 dtypes restored after the union (nulls from the other side
    # promote int64 -> float64 in pandas blocks)
    ldtypes = {n: lschema.field(n).type.to_pandas_dtype() for n in lcols}
    rdtypes = {n: rschema.field(n).type.to_pandas_dtype() for n in rcols}

    def _tag(side: int, have: list[str]):
        # SQL join semantics: a NULL key never matches.  Right-side
        # null-key rows can never contribute (inner or left); left-side
        # ones only survive a left join (emitted unmatched, which the
        # pandas merge then does naturally since the right NaNs are
        # gone — pandas would otherwise pair NaN==NaN).
        drop_null_keys = side == 1 or how == "inner"

        def _t(batch: pa.Table) -> pa.Table:
            if drop_null_keys:
                import pyarrow.compute as _pc

                mask = _pc.is_valid(batch[on_cols[0]])
                for c in on_cols[1:]:
                    mask = _pc.and_(mask, _pc.is_valid(batch[c]))
                batch = batch.filter(mask)
            n = batch.num_rows
            cols = {c: (batch[c] if c in have else pa.nulls(n, types[c]))
                    for c in all_cols}
            cols["__side"] = pa.array(np.full(n, side, np.int8))
            h = pd.util.hash_pandas_object(
                batch.select(on_cols).to_pandas(), index=False).to_numpy()
            cols["__bucket"] = pa.array((h % num_buckets).astype(np.int64))
            return pa.table(cols)
        return _t

    lt = left.map_batches(_tag(0, lcols), batch_format="pyarrow",
                          batch_size=None)
    rt = right.map_batches(_tag(1, rcols), batch_format="pyarrow",
                           batch_size=None)

    out_cols = lcols + [c for c in rcols if c not in on_cols]

    def _join(g: pa.Table) -> pd.DataFrame:
        if g.num_rows == 0 or "__side" not in g.column_names:
            return pd.DataFrame({c: pd.Series(dtype=ldtypes.get(c, rdtypes.get(c)))
                                 for c in out_cols})
        # split sides IN ARROW and select each side's own columns before
        # any pandas conversion: the tagged union pads the other side's
        # columns with nulls, and a null-padded int64 column converted to
        # pandas promotes to float64 — int64 values >= 2^53 (blake2b ids,
        # uint64-derived hashes) would silently lose precision and
        # mis-join.  Own columns have no padding nulls, so dtypes survive.
        import pyarrow.compute as _pc

        side = g["__side"]
        lg = g.filter(_pc.equal(side, 0)).select(lcols).to_pandas()
        rg = g.filter(_pc.equal(side, 1)).select(rcols).to_pandas()
        return lg.merge(rg, on=on_cols, how=how)

    out = (_coalesce_for_buckets(lt.union(rt), num_buckets)
           .groupby("__bucket")
           .map_groups(_join, batch_format="pyarrow"))
    if restore_order_col is not None:
        out = out.sort(restore_order_col)
    return out


def join(left: rd.Dataset, right: rd.Dataset, on: str | list[str],
         how: str = "inner", num_buckets: int = 64) -> rd.Dataset:
    """Size-dispatching equi-join: broadcast the right side when its row
    count is under ``BROADCAST_JOIN_MAX_ROWS`` (one shuffle saved), else
    the co-partitioned ``hash_join``."""
    right = right.materialize()
    if how in ("inner", "left") and right.count() <= BROADCAST_JOIN_MAX_ROWS:
        key = [on] if isinstance(on, str) else list(on)
        return broadcast_join(left, right.to_pandas(),
                              on=key[0] if len(key) == 1 else key, how=how)
    return hash_join(left, right, on, how=how, num_buckets=num_buckets)


def cumsum_per_key(ds: rd.Dataset, key: str, order_cols: list[str],
                   value_col: str, alias: str = "running_total",
                   num_buckets: int = 32) -> rd.Dataset:
    """Running per-key sum — SQL ``SUM(v) OVER (PARTITION BY key ORDER
    BY order_cols ROWS UNBOUNDED PRECEDING)``.  Ray Data has no window
    functions; this is the bucket composition: hash-bucket the key (all
    of a key's rows meet in one task, num_buckets groups — the
    sessionize discipline), then per bucket ONE lexsort + segmented
    cumsum (cumsum minus each segment's starting offset), no per-key
    loop.  Callers needing exact float parity should pre-scale to
    integers (the driver query uses cents)."""
    def _bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.select([key]).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def _cumsum(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        df = g.to_pandas()
        df = df.sort_values([key] + order_cols, kind="stable") \
               .reset_index(drop=True)
        v = df[value_col].to_numpy()
        if len(v) == 0:
            df[alias] = v
            return df
        # factorize treats all NULL keys as ONE code (SQL's NULL
        # partition); raw != comparison would split them since NaN != NaN
        k = pd.factorize(df[key], use_na_sentinel=False)[0]
        cum = np.cumsum(v)
        # subtract the cumulative total just before each key's segment
        # (segment-id indexing — valid for negative values too, unlike
        # a maximum.accumulate of the offsets)
        new_seg = np.r_[True, k[1:] != k[:-1]]
        seg = np.cumsum(new_seg) - 1
        starts = np.flatnonzero(new_seg)
        seg_offset = np.zeros(len(starts), dtype=cum.dtype)
        seg_offset[1:] = cum[starts[1:] - 1]
        df[alias] = cum - seg_offset[seg]
        return df

    return (_coalesce_for_buckets(
                ds.map_batches(_bucket, batch_format="pyarrow",
                               batch_size=None), num_buckets)
            .groupby("__bucket")
            .map_groups(_cumsum, batch_format="pyarrow"))


def lag_per_key(ds: rd.Dataset, key: str, order_cols: list[str],
                value_col: str, offset: int = 1, alias: str = "lagged",
                num_buckets: int = 32) -> rd.Dataset:
    """SQL ``LAG(value, offset) OVER (PARTITION BY key ORDER BY ...)``
    (negative ``offset`` = LEAD).  Same bucket composition as
    ``cumsum_per_key``: one lexsort per bucket, then a vectorized
    segment-safe shift — rows whose lag crosses a key boundary get
    null."""
    if offset == 0:
        raise ValueError("offset must be nonzero (0 is the value itself)")

    def _bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.select([key]).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def _lag(g: pa.Table) -> pd.DataFrame:
        df = g.drop_columns(["__bucket"]).to_pandas()
        df = df.sort_values([key] + order_cols, kind="stable") \
               .reset_index(drop=True)
        if len(df) == 0:
            df[alias] = df[value_col]
            return df
        # factorized codes: NULL keys are one partition (SQL LAG
        # semantics); NaN != NaN would null every in-partition lag
        k = pd.factorize(df[key], use_na_sentinel=False)[0]
        shifted = df[value_col].shift(offset)
        # null out values pulled across a key boundary
        ksh = pd.Series(k).shift(offset).to_numpy()
        shifted[~(ksh == k)] = None
        df[alias] = shifted
        return df

    return (_coalesce_for_buckets(
                ds.map_batches(_bucket, batch_format="pyarrow",
                               batch_size=None), num_buckets)
            .groupby("__bucket")
            .map_groups(_lag, batch_format="pyarrow"))


def rank_per_key(ds: rd.Dataset, key: str, order_col: str,
                 descending: bool = True,
                 num_buckets: int = 32) -> rd.Dataset:
    """SQL ``RANK()`` + ``DENSE_RANK() OVER (PARTITION BY key ORDER BY
    order_col [DESC])`` in one pass — appends int64 ``rnk`` (ties share
    the min rank, gaps after) and ``drnk`` (no gaps) columns.  Same
    bucket composition as the other window ops: one hash shuffle, one
    lexsort + two vectorized pandas ranks per bucket.

    NULL ``order_col`` values are REJECTED (ValueError): pandas rank()
    would NaN them and the int64 cast would raise obscurely, and SQL
    engines disagree on NULL placement (DuckDB: NULLS LAST for DESC);
    callers with nullable order columns must fill or filter first so
    the semantics stay explicit."""

    def _bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.select([key]).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def _rank(g: pa.Table) -> pd.DataFrame:
        df = g.drop_columns(["__bucket"]).to_pandas()
        if df[order_col].isna().any():
            raise ValueError(
                f"rank_per_key: NULL values in order column "
                f"{order_col!r}; fill or filter them first (see "
                "docstring — NULL ordering is engine-specific)")
        # dropna=False: NULL keys form one partition (SQL PARTITION BY
        # semantics); the default would NaN their ranks and break the
        # int64 cast
        grp = df.groupby(key, dropna=False)[order_col]
        df["rnk"] = grp.rank(method="min",
                             ascending=not descending).astype("int64")
        df["drnk"] = grp.rank(method="dense",
                              ascending=not descending).astype("int64")
        return df

    return (_coalesce_for_buckets(
                ds.map_batches(_bucket, batch_format="pyarrow",
                               batch_size=None), num_buckets)
            .groupby("__bucket")
            .map_groups(_rank, batch_format="pyarrow"))


def rollup_aggregate(ds: rd.Dataset, keys: list[str], value_col: str,
                     alias: str = "total") -> rd.Dataset:
    """SQL ``GROUP BY ROLLUP(keys)``: one sum per prefix granularity
    (full keys, each shorter prefix, grand total), finer-level nulls in
    the rolled-up key columns.  Each level is its own small groupby over
    the SAME input — Ray caches nothing across them, but every level
    after the first could also be derived from the finest aggregate;
    since the finest result is dictionary-cardinality (tiny next to the
    input), this derives coarser levels from it map-side: ONE
    input-scale shuffle total."""
    from ray.data.aggregate import Sum

    finest = (ds.groupby(keys)
              .aggregate(Sum(value_col, alias_name=alias))).materialize()
    fsch = _as_arrow_schema(finest.schema())
    ktypes = {c: fsch.field(c).type for c in keys}
    vtype = fsch.field(alias).type

    def _pad(b: pa.Table) -> pa.Table:
        return pa.table({
            **{c: (b[c] if c in b.column_names
                   else pa.nulls(b.num_rows, ktypes[c])) for c in keys},
            alias: b[alias].cast(vtype),
        })

    levels = [finest.map_batches(_pad, batch_format="pyarrow",
                                 batch_size=None)]
    for depth in range(len(keys) - 1, -1, -1):
        kept = keys[:depth]
        if kept:
            lvl = (finest.select_columns(kept + [alias])
                   .groupby(kept).aggregate(Sum(alias, alias_name=alias))
                   .map_batches(_pad, batch_format="pyarrow",
                                batch_size=None))
        else:
            tot = finest.to_pandas()[alias].sum()
            lvl = rd.from_arrow(pa.table({
                **{c: pa.nulls(1, ktypes[c]) for c in keys},
                alias: pa.array([tot]).cast(vtype),
            }))
        levels.append(lvl)

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def anti_join(left: rd.Dataset, right: rd.Dataset, on: str,
              num_buckets: int = 64) -> rd.Dataset:
    """Rows of ``left`` with NO match in ``right[on]`` (SQL NOT EXISTS:
    a NULL left key never matches, so it is KEPT; right NULL keys are
    ignored).  The set-difference side of the ExternalHashMap primitive
    (/root/reference/ProcessSet.h:831-860) — the reference's
    "non-spidered URL" path (IndexLogFile.h:70-102) is this shape.

    Scale shape: both sides tagged and co-partitioned by key hash in ONE
    shuffle (the ``hash_join`` pattern); each bucket is a vectorized
    ``isin`` mask.  Neither side is broadcast or driver-materialized."""
    import pyarrow.compute as _pc

    lschema = _as_arrow_schema(left.schema())
    lcols = list(lschema.names)
    ltypes = {f.name: f.type for f in lschema}

    def _tag(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            if side == 1:
                batch = pa.table({on: batch[on].cast(ltypes[on])})
                batch = batch.filter(_pc.is_valid(batch[on]))
            n = batch.num_rows
            cols = {c: (batch[c] if c in batch.column_names
                        else pa.nulls(n, ltypes[c])) for c in lcols}
            cols["__side"] = pa.array(np.full(n, side, np.int8))
            h = pd.util.hash_pandas_object(
                batch.select([on]).to_pandas(), index=False).to_numpy()
            cols["__bucket"] = pa.array((h % num_buckets).astype(np.int64))
            return pa.table(cols)
        return _t

    lt = left.map_batches(_tag(0), batch_format="pyarrow", batch_size=None)
    rt = right.select_columns([on]).map_batches(
        _tag(1), batch_format="pyarrow", batch_size=None)

    def _anti(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__side" not in g.column_names:
            return pa.table({c: pa.array([], ltypes[c]) for c in lcols})
        side = g["__side"]
        lg = g.filter(_pc.equal(side, 0)).select(lcols)
        seen = g.filter(_pc.equal(side, 1))[on].to_pandas()
        keys = lg[on].to_pandas()
        keep = ~keys.isin(seen).to_numpy() | keys.isna().to_numpy()
        return lg.filter(pa.array(keep))

    return (_coalesce_for_buckets(lt.union(rt), num_buckets)
            .groupby("__bucket")
            .map_groups(_anti, batch_format="pyarrow"))


def bloom_semi_join(big: rd.Dataset, keys: rd.Dataset, on: str,
                    num_bits: int = 1 << 23, num_hashes: int = 7,
                    num_buckets: int = 64) -> rd.Dataset:
    """Semi-join: rows of ``big`` whose ``on`` appears in ``keys[on]`` —
    with a Bloom-filter pre-filter so non-matching rows never enter the
    join shuffle.

    Scale shape: the keys side folds to a ``num_bits``-bit OR-merged
    bitset (no shuffle), ships ONCE via ``ray.put``, and prunes ``big``
    map-side; only the ~matching rows (plus <1% false positives at 10
    bits/key) pay the exchange.  Exactness is restored by a real join
    against the DISTINCT keys: false positives drop there, and Bloom
    filters have no false negatives, so the result equals the plain
    semi-join.  NULL keys never match (SQL IN semantics)."""
    from ..functions.sketch import bloom_build, bloom_filter_batches

    import pyarrow.compute as _pc

    kd = keys.select_columns([on]).map_batches(
        lambda b: b.filter(_pc.is_valid(b[on])),
        batch_format="pyarrow", batch_size=None)
    distinct = kd.groupby(on).aggregate(Count(alias_name="__n")) \
                 .drop_columns(["__n"]).materialize()
    bits = bloom_build(distinct, on, num_bits=num_bits,
                       num_hashes=num_hashes)
    pruned = bloom_filter_batches(big, on, bits, num_hashes=num_hashes)
    return join(pruned, distinct, on=on, how="inner",
                num_buckets=num_buckets)


def top_k(ds: rd.Dataset, sort_cols: list[str], descending: list[bool],
          k: int) -> rd.Dataset:
    """Global top-k via distributed sort + limit (the reference's
    CLimitedPQ / RankURLs shape, DyableSort/RankURLs/RankURLs.cpp:30-51)."""
    return ds.sort(sort_cols, descending=descending).limit(k)


def asof_join(left: rd.Dataset, right: rd.Dataset, by: str, on: str,
              value_cols: list[str], num_buckets: int = 32) -> rd.Dataset:
    """As-of join: for each left row, the latest right row with the same
    ``by`` key and ``right.on <= left.on``.

    Ray Data has no native as-of join; this is the documented composition
    (ray_guide "As-of / range join"): tag both sides, hash-BUCKET the
    ``by`` key (num_buckets groups, not one tiny map_groups per key —
    the BASELINE.md pattern), then ONE vectorized ``pd.merge_asof(by=)``
    per bucket over the time-sorted sides.  Partitioning assumption: one
    bucket's rows fit one task (raise num_buckets / salt by time range
    if not)."""

    lschema = _as_arrow_schema(left.schema())
    rschema = _as_arrow_schema(right.schema())
    left_cols = list(lschema.names)
    right_cols = [by, on] + value_cols
    types = {f.name: f.type for f in lschema}
    types.update({f.name: f.type for f in rschema})
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    # both sides padded to ONE schema with typed nulls (hash_join's
    # pattern): the pre-groupby coalesce concatenates blocks from both
    # sides, which requires schema-aligned blocks
    def _tag(side: int, have: list[str]):
        def _t(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {c: (batch[c] if c in have else pa.nulls(n, types[c]))
                    for c in all_cols}
            cols["__side"] = pa.array(np.full(n, side, np.int8))
            h = pd.util.hash_array(batch[by].to_pandas().to_numpy())
            cols["__bucket"] = pa.array((h % num_buckets).astype(np.int64))
            return pa.table(cols)
        return _t

    lt = left.map_batches(_tag(0, left_cols), batch_format="pyarrow",
                          batch_size=None)
    rt = right.map_batches(_tag(1, right_cols), batch_format="pyarrow",
                           batch_size=None)
    both = lt.union(rt)

    def _asof(g: pa.Table) -> pd.DataFrame:
        # split sides IN ARROW and select own columns first: padding
        # nulls from the other side would promote int64 -> float64 in a
        # whole-group pandas frame (the hash_join precision hazard)
        import pyarrow.compute as _pc

        if g.num_rows == 0 or "__side" not in g.column_names:
            return pd.DataFrame(columns=left_cols + value_cols)
        side = g["__side"]
        lg = (g.filter(_pc.equal(side, 0)).select(left_cols).to_pandas()
              .sort_values(on, kind="mergesort"))
        rg = (g.filter(_pc.equal(side, 1)).select(right_cols).to_pandas()
              .rename(columns={on: "__r_on"})
              .sort_values("__r_on", kind="mergesort"))
        if len(lg) == 0:
            return pd.DataFrame(columns=left_cols + value_cols)
        if len(rg) == 0:
            out = lg.copy()
            for c in value_cols:
                out[c] = pd.NA
            return out
        out = pd.merge_asof(lg, rg, left_on=on, right_on="__r_on",
                            by=by, direction="backward")
        return out.drop(columns=["__r_on"])

    return (_coalesce_for_buckets(both, num_buckets)
            .groupby("__bucket")
            .map_groups(_asof, batch_format="pyarrow"))


def sessionize(events: rd.Dataset, key: str, ts_col: str,
               gap_seconds: int = 1800, tiebreak: str | None = None,
               num_buckets: int = 32) -> rd.Dataset:
    """Session ids per key: a new session starts when the gap since the
    previous event exceeds ``gap_seconds`` (the streaming-window analog,
    SURVEY.md §2.10 — Ray Data has no event-time windows).

    Keys are hash-bucketed (num_buckets groups, not one ~1ms map_groups
    per key — the BASELINE.md pattern); inside each bucket ONE vectorized
    pass sorts by (key, ts, tiebreak) and numbers sessions with cumsum
    minus the per-key base.  The timestamp is explicitly normalized to
    datetime64[us] before the int64 view, so the gap threshold is in
    microseconds regardless of the inbound unit (ns vs us) — exact
    parity with SQL ``epoch_us`` arithmetic."""
    gap_us = gap_seconds * 1_000_000

    def _bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(batch[key].to_pandas().to_numpy())
        return batch.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or key not in g.columns:
            return g
        g = g.drop(columns=["__bucket"])
        order = [key, ts_col] + ([tiebreak] if tiebreak else [])
        g = g.sort_values(order, kind="mergesort").reset_index(drop=True)
        ts = (g[ts_col].astype("datetime64[us]").astype("int64")).to_numpy()
        keys = g[key].to_numpy()
        n = len(g)
        same = np.zeros(n, bool)
        same[1:] = keys[1:] == keys[:-1]
        new = np.zeros(n, np.int64)
        new[1:] = ((ts[1:] - ts[:-1]) > gap_us) & same[1:]
        cum = np.cumsum(new)
        # session resets per key: subtract the cumsum at the key's first row
        first_idx = np.maximum.accumulate(
            np.where(~same, np.arange(n), 0))
        g["session_id"] = cum - cum[first_idx]
        return g

    return (_coalesce_for_buckets(
                events.map_batches(_bucket, batch_format="pyarrow",
                                   batch_size=None), num_buckets)
            .groupby("__bucket")
            .map_groups(_sessions, batch_format="pandas"))


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

    return (_coalesce_for_buckets(
                ds.map_batches(_bucket, batch_format="pyarrow",
                               batch_size=None), num_buckets)
            .groupby("__bucket")
            .map_groups(_heads, batch_format="pandas"))


def stratified_sample(ds: rd.Dataset, key: str, id_col: str, n: int,
                      num_buckets: int = 32) -> rd.Dataset:
    """Deterministic per-key quota sample: for every distinct ``key``,
    keep the ``n`` rows whose md5-low-63 hash of ``str(id_col)`` ranks
    smallest — the class-balancing downsample of a training-data
    pipeline, reproducible across runs/cluster sizes because the sample
    is a pure function of the ids.

    The hash is DuckDB's ``md5_number_lower(CAST(id AS VARCHAR)) %
    2^63`` exactly, so the SQL oracle (QUALIFY row_number() OVER
    (PARTITION BY key ORDER BY hash, id) <= n) selects the same rows.
    Scale shape: one bucketed shuffle (``top_k_per_group``); per-key
    state never leaves its bucket."""
    from .._tokflat import md5_low64

    def _rank(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = np.fromiter(
            (md5_low64(str(i)) & 0x7FFFFFFFFFFFFFFF for i in ids),
            np.int64, len(ids))
        return batch.append_column("__rk", pa.array(h, pa.int64()))

    ranked = ds.map_batches(_rank, batch_format="pyarrow", batch_size=None)
    out = top_k_per_group(ranked, key, "__rk", n, descending=False,
                          num_buckets=num_buckets)
    return out.drop_columns(["__rk"])


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


def range_join(points: rd.Dataset, intervals: rd.Dataset, on: str,
               start_col: str, end_col: str, by: str | None = None,
               num_buckets: int = 32, bucket_width_us: int | None = None,
               warn_pairs_per_bucket: int = 5_000_000) -> rd.Dataset:
    """Interval-containment join: every (point, interval) pair with
    ``start <= point.on < end`` — optionally also matching an equality
    key ``by`` (the attribution-window join).  Ray Data has no non-equi
    join; this is the documented composition (ray_guide "As-of / range
    join"), same bucket discipline as ``asof_join``.

    Partitioning:
    - ``by`` given: both sides hash-bucket on the key; per bucket ONE
      pandas key-merge + a vectorized containment filter.  A hot key
      with P points and I intervals materializes P*I candidate rows
      before the filter — warned loudly past ``warn_pairs_per_bucket``
      (the bucket still computes: dropping rows would be wrong, unlike
      the dedup candidate caps).
    - ``by`` None: the TIME axis is bucketed (width = max interval
      length unless given, so an interval spans <= 2 buckets); points
      land in floor(ts/W), intervals replicate to every bucket they
      overlap.  Each qualifying pair meets in exactly one bucket (the
      point's), so no dedup pass is needed.

    Timestamps normalize to microseconds (``datetime64[us]``) before
    comparison, like ``sessionize`` — a ns input cannot silently shift
    the window 1000x.  Non-key output columns must be disjoint."""
    pschema = _as_arrow_schema(points.schema())
    ischema = _as_arrow_schema(intervals.schema())
    pcols, icols = list(pschema.names), list(ischema.names)
    shared = (set(pcols) & set(icols)) - ({by} if by else set())
    if shared:
        raise ValueError(f"range_join requires disjoint non-key columns; "
                         f"rename {sorted(shared)} first")
    out_cols = pcols + [c for c in icols if c not in pcols]
    types = {f.name: f.type for f in pschema}
    types.update({f.name: f.type for f in ischema})
    dtypes = {c: types[c].to_pandas_dtype() for c in out_cols}

    def _typed_empty() -> pd.DataFrame:
        # hash_join's typed-empty pattern: an untyped
        # pd.DataFrame(columns=...) block would carry object dtypes into
        # downstream schema unification
        return pd.DataFrame({c: pd.Series(dtype=dtypes[c])
                             for c in out_cols})

    def _notnull(batch: pa.Table, cols: list[str]) -> pa.Table:
        # SQL comparison semantics: a NULL key or NULL timestamp can
        # never satisfy the join predicate — drop those rows up front
        # (pandas merge would otherwise match NaN==NaN, and a null
        # timestamp would promote the int64 bucket column to float64)
        import pyarrow.compute as _pc

        mask = None
        for c in cols:
            v = _pc.is_valid(batch[c])
            mask = v if mask is None else _pc.and_(mask, v)
        return batch.filter(mask) if mask is not None else batch

    def _pad(batch: pa.Table, have: list[str]) -> dict:
        # both sides padded to ONE schema with typed nulls so the
        # pre-groupby coalesce can concatenate blocks from either side
        n = batch.num_rows
        return {c: (batch[c] if c in have else pa.nulls(n, types[c]))
                for c in out_cols}

    def _us(s: pd.Series) -> np.ndarray:
        return s.astype("datetime64[us]").astype("int64").to_numpy()

    def _containment(merged: pd.DataFrame) -> pd.DataFrame:
        ts = _us(merged[on])
        keep = (ts >= _us(merged[start_col])) & (ts < _us(merged[end_col]))
        return merged[keep]

    def _split(g: pa.Table):
        # Arrow-side split + own-column select before pandas: padding
        # nulls would promote the other side's int64 columns to float64
        # (the hash_join precision hazard)
        import pyarrow.compute as _pc

        side = g["__side"]
        return (g.filter(_pc.equal(side, 0)).select(pcols).to_pandas(),
                g.filter(_pc.equal(side, 1)).select(icols).to_pandas())

    if by is not None:
        def _tag(side: int, have: list[str]):
            need = [by, on] if side == 0 else [by, start_col, end_col]

            def _t(batch: pa.Table) -> pa.Table:
                batch = _notnull(batch, need)
                cols = _pad(batch, have)
                cols["__side"] = pa.array(
                    np.full(batch.num_rows, side, np.int8))
                h = pd.util.hash_array(batch[by].to_pandas().to_numpy())
                cols["__bucket"] = pa.array((h % num_buckets).astype(np.int64))
                return pa.table(cols)
            return _t

        both = (points.map_batches(_tag(0, pcols), batch_format="pyarrow",
                                   batch_size=None)
                .union(intervals.map_batches(_tag(1, icols),
                                             batch_format="pyarrow",
                                             batch_size=None)))

        def _rjoin(g: pa.Table) -> pd.DataFrame:
            if g.num_rows == 0 or "__side" not in g.column_names:
                return _typed_empty()
            lg, rg = _split(g)
            if len(lg) == 0 or len(rg) == 0:
                return _typed_empty()
            lc = lg[by].value_counts()
            rc = rg[by].value_counts()
            est = int((lc * rc).dropna().sum())
            if est > warn_pairs_per_bucket:
                import sys
                print(f"[range_join] bucket materializes ~{est} candidate "
                      f"pairs (> {warn_pairs_per_bucket}); raise num_buckets "
                      "or pre-filter the hot keys", file=sys.stderr)
            return _containment(lg.merge(rg, on=by))[out_cols]

        return (_coalesce_for_buckets(both, num_buckets)
                .groupby("__bucket")
                .map_groups(_rjoin, batch_format="pyarrow"))

    # keyless: time-axis bucketing
    if bucket_width_us is None:
        # the max-length scan consumes the intervals pipeline once and
        # _ibucket consumes it again — pin it so the upstream chain
        # doesn't execute twice
        intervals = intervals.materialize()
        def _maxlen(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            s = batch[start_col].cast(pa.timestamp("us")).cast(pa.int64())
            e = batch[end_col].cast(pa.timestamp("us")).cast(pa.int64())
            d = pc.subtract(e, s)
            m = pc.max(d).as_py() if batch.num_rows else None
            return pa.table({"len_us": pa.array(
                [m if m is not None else 0], pa.int64())})
        bucket_width_us = max(int(intervals.map_batches(
            _maxlen, batch_format="pyarrow").max("len_us") or 1), 1)
    W = np.int64(bucket_width_us)

    def _pbucket(batch: pa.Table) -> pa.Table:
        batch = _notnull(batch, [on])
        cols = _pad(batch, pcols)
        ts = batch[on].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        cols["__side"] = pa.array(np.full(batch.num_rows, 0, np.int8))
        cols["__bucket"] = pa.array(ts // W)
        return pa.table(cols)

    def _ibucket(batch: pa.Table) -> pa.Table:
        batch = _notnull(batch, [start_col, end_col])
        s = batch[start_col].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        e = batch[end_col].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        valid = e > s
        s, e = s[valid], e[valid]
        tbl = batch.filter(pa.array(valid))
        b0 = s // W
        cnt = (e - 1) // W - b0 + 1
        idx = np.repeat(np.arange(len(s)), cnt)
        off = np.arange(len(idx)) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        take = pa.array(idx)
        cols = {c: (tbl[c].take(take) if c in icols
                    else pa.nulls(len(idx), types[c]))
                for c in out_cols}
        cols["__side"] = pa.array(np.full(len(idx), 1, np.int8))
        cols["__bucket"] = pa.array(b0[idx] + off)
        return pa.table(cols)

    both = (points.map_batches(_pbucket, batch_format="pyarrow",
                               batch_size=None)
            .union(intervals.map_batches(_ibucket, batch_format="pyarrow",
                                         batch_size=None)))

    def _rjoin_t(g: pa.Table) -> pd.DataFrame:
        if g.num_rows == 0 or "__side" not in g.column_names:
            return _typed_empty()
        lg, rg = _split(g)
        if len(lg) == 0 or len(rg) == 0:
            return _typed_empty()
        if len(lg) * len(rg) > warn_pairs_per_bucket:
            import sys
            print(f"[range_join] time bucket materializes "
                  f"{len(lg) * len(rg)} candidate pairs "
                  f"(> {warn_pairs_per_bucket}); shrink bucket_width_us",
                  file=sys.stderr)
        merged = lg.merge(rg, how="cross")
        return _containment(merged)[out_cols]

    return (_coalesce_for_buckets(both, num_buckets)
            .groupby("__bucket")
            .map_groups(_rjoin_t, batch_format="pyarrow"))


def hopping_window_agg(events: rd.Dataset, ts_col: str, key: str,
                       value_col: str, size_s: int, hop_s: int) -> rd.Dataset:
    """Hopping (sliding) event-time window aggregate: count + sum per
    (window_start, key); an event at t belongs to every window
    [ws, ws+size) with ws = k*hop covering t.  The tumbling case
    (size == hop) degenerates to the events_hourly shape.

    Ray Data has no event-time windows (SURVEY.md §2.10); this is the
    batch expression: each row fans out to its size/hop windows inside
    ``map_batches`` (vectorized repeat — no per-row loop), then one
    groupby.  Exact parity with the SQL range()-unnest oracle."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Count, Sum

    size_us = size_s * 1_000_000
    hop_us = hop_s * 1_000_000

    def _expand(batch: pa.Table) -> pa.Table:
        ts_arr = batch[ts_col]
        if pa.types.is_timestamp(ts_arr.type):
            # normalize the unit before the int64 cast: a timestamp[ns]
            # column (common after pandas round-trips) cast directly to
            # int64 yields nanoseconds — window starts off by 1000x.
            # Same hazard sessionize normalizes explicitly.
            ts_arr = ts_arr.cast(pa.timestamp("us"))
        ts = ts_arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        k0 = np.floor_divide(ts - size_us, hop_us) + 1
        k1 = np.floor_divide(ts, hop_us)
        counts = (k1 - k0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ts)), counts)
        # window ordinal per expanded row: k0[row] + position-within-row
        starts = np.cumsum(counts) - counts
        offs = np.arange(len(idx)) - starts[idx]
        ws = (k0[idx] + offs) * hop_s
        return pa.table({
            "window_start": pa.array(ws.astype(np.int64), pa.int64()),
            key: batch[key].take(pa.array(idx)),
            value_col: batch[value_col].take(pa.array(idx)),
        })

    agg = (events.map_batches(_expand, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
           .groupby(["window_start", key])
           .aggregate(Count(alias_name="n"),
                      Sum(value_col, alias_name="total")))

    def _round(b: pa.Table) -> pa.Table:
        return b.set_column(b.schema.get_field_index("total"), "total",
                            _pc.round(b["total"], 2))

    return agg.map_batches(_round, batch_format="pyarrow", batch_size=None)


def cube_aggregate(ds: rd.Dataset, keys: list[str], value_col: str,
                   alias: str = "total") -> rd.Dataset:
    """SQL ``GROUP BY CUBE(keys)``: one sum per key SUBSET (2^k
    granularities; ROLLUP's prefix chain is the special case), rolled-
    away key columns null.  Same one-shuffle scale shape as
    ``rollup_aggregate``: the finest groupby is the only input-scale
    exchange; every coarser subset re-aggregates the dictionary-
    cardinality finest result map-side.  The reference reaches this
    shape by chaining KeyWeight passes, one full MapReduce per
    granularity (/root/reference/ProcessSet.h:966-1043) — here the
    input is scanned once."""
    from itertools import combinations

    from ray.data.aggregate import Sum

    finest = (ds.groupby(keys)
              .aggregate(Sum(value_col, alias_name=alias))).materialize()
    fsch = _as_arrow_schema(finest.schema())
    ktypes = {c: fsch.field(c).type for c in keys}
    vtype = fsch.field(alias).type

    def _pad(b: pa.Table) -> pa.Table:
        return pa.table({
            **{c: (b[c] if c in b.column_names
                   else pa.nulls(b.num_rows, ktypes[c])) for c in keys},
            alias: b[alias].cast(vtype),
        })

    levels = [finest.map_batches(_pad, batch_format="pyarrow",
                                 batch_size=None)]
    for depth in range(len(keys) - 1, -1, -1):
        for kept in combinations(keys, depth):
            kept = list(kept)
            if kept:
                lvl = (finest.select_columns(kept + [alias])
                       .groupby(kept)
                       .aggregate(Sum(alias, alias_name=alias))
                       .map_batches(_pad, batch_format="pyarrow",
                                    batch_size=None))
            else:
                tot = finest.to_pandas()[alias].sum()
                lvl = rd.from_arrow(pa.table({
                    **{c: pa.nulls(1, ktypes[c]) for c in keys},
                    alias: pa.array([tot]).cast(vtype),
                }))
            levels.append(lvl)

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def ntile_per_key(ds: rd.Dataset, key: str, order_cols: list[str],
                  n_tiles: int, descending: bool | list[bool] = False,
                  alias: str = "tile", num_buckets: int = 32) -> rd.Dataset:
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY ...)``: each
    key's rows split into ``n_tiles`` ranked buckets, the first
    ``count % n`` buckets one row larger (the SQL-standard fill rule).
    ``order_cols`` must order each partition UNIQUELY — with ties the
    bucket boundary falls between equal rows and every engine places
    them differently, so duplicates raise instead of guessing.  Same
    bucket composition as the other window ops: one hash shuffle, one
    lexsort + a closed-form vectorized tile assignment per bucket."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    desc = ([descending] * len(order_cols) if isinstance(descending, bool)
            else list(descending))

    def _bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.select([key]).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "__bucket", pa.array((h % num_buckets).astype(np.int64)))

    def _ntile(g: pa.Table) -> pd.DataFrame:
        df = g.drop_columns(["__bucket"]).to_pandas()
        if df.empty:
            df[alias] = pd.Series([], dtype="int64")
            return df
        df = df.sort_values([key] + order_cols,
                            ascending=[True] + [not d for d in desc],
                            kind="stable").reset_index(drop=True)
        if df.duplicated(subset=[key] + order_cols).any():
            raise ValueError(
                f"ntile_per_key: duplicate ({key}, {order_cols}) rows — "
                "NTILE over ties is engine-defined; add a tiebreak column")
        codes = pd.factorize(df[key], use_na_sentinel=False)[0]
        counts = np.bincount(codes)
        starts = np.cumsum(counts) - counts
        pos = np.arange(len(df)) - starts[codes]
        n = counts[codes]
        q, r = n // n_tiles, n % n_tiles
        big = r * (q + 1)           # rows covered by the larger buckets
        tile = np.where(pos < big,
                        pos // np.maximum(q + 1, 1),
                        r + (pos - big) // np.maximum(q, 1)) + 1
        df[alias] = tile.astype(np.int64)
        return df

    return (_coalesce_for_buckets(
                ds.map_batches(_bucket, batch_format="pyarrow",
                               batch_size=None), num_buckets)
            .groupby("__bucket")
            .map_groups(_ntile, batch_format="pyarrow"))


def corr_regr_per_key(ds: rd.Dataset, key: str, x: str, y: str,
                      round_to: int = 6) -> rd.Dataset:
    """Per-key Pearson correlation + least-squares line of y on x (SQL
    ``corr`` / ``regr_slope`` / ``regr_intercept``), as
    ``(key, n, corr, slope, intercept)`` rounded to ``round_to``.

    Two passes, both map-side partial then one key-cardinality
    aggregate: pass 1 computes per-key n/Σx/Σy (means, broadcast via
    ``ray.put``); pass 2 sums CENTERED cross-moments (the textbook
    two-pass algorithm — numerically agrees with the engines'
    single-pass updating formulas to ~1e-12 relative, where raw
    moments can lose half the mantissa).  Rows with NULL x or y drop
    pairwise (SQL aggregate semantics).  Degenerate keys (n < 2 or a
    zero-variance side) yield SQL NULLs."""

    def _clean(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([key, x, y]).to_pandas()
        return df.dropna(subset=[x, y])

    def _p1(batch: pa.Table) -> pa.Table:
        df = _clean(batch)
        g = df.groupby(key, dropna=False)
        out = g.size().rename("n").to_frame()
        out["sx"] = g[x].sum()
        out["sy"] = g[y].sum()
        return pa.Table.from_pandas(out.reset_index(),
                                    preserve_index=False)

    from ray.data.aggregate import Sum

    p1 = (ds.map_batches(_p1, batch_format="pyarrow", batch_size=None)
          .groupby(key)
          .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                     Sum("sy", alias_name="sy"))).to_pandas()
    p1["mx"] = p1["sx"] / p1["n"]
    p1["my"] = p1["sy"] / p1["n"]
    means_ref = ray.put(p1.set_index(key)[["mx", "my"]])

    def _p2(batch: pa.Table) -> pd.DataFrame:
        df = _clean(batch)
        m = ray.get(means_ref)
        dx = df[x].to_numpy(np.float64) - m["mx"].reindex(
            df[key]).to_numpy(np.float64)
        dy = df[y].to_numpy(np.float64) - m["my"].reindex(
            df[key]).to_numpy(np.float64)
        part = pd.DataFrame({key: df[key].to_numpy(),
                             "sxx": dx * dx, "syy": dy * dy,
                             "sxy": dx * dy})
        return pa.Table.from_pandas(
            part.groupby(key, dropna=False, as_index=False).sum(),
            preserve_index=False)

    p2 = (ds.map_batches(_p2, batch_format="pyarrow", batch_size=None)
          .groupby(key)
          .aggregate(Sum("sxx", alias_name="sxx"),
                     Sum("syy", alias_name="syy"),
                     Sum("sxy", alias_name="sxy"))).to_pandas()
    out = p1.merge(p2, on=key)
    ok = (out["n"] > 1) & (out["sxx"] > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = np.where(ok & (out["syy"] > 0),
                        out["sxy"] / np.sqrt(out["sxx"] * out["syy"]),
                        np.nan)
        slope = np.where(ok, out["sxy"] / out["sxx"], np.nan)
        intercept = np.where(ok, out["my"] - slope * out["mx"], np.nan)
    res = pd.DataFrame({
        key: out[key],
        "n": out["n"].astype("int64"),
        "corr": np.round(corr, round_to),
        "slope": np.round(slope, round_to),
        "intercept": np.round(intercept, round_to),
    }).sort_values(key).reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(res, preserve_index=False))


def pivot_counts(ds: rd.Dataset, row_key: str, pivot_col: str,
                 prefix: str = "n_",
                 max_pivot_values: int = 1000) -> rd.Dataset:
    """SQL PIVOT (conditional aggregation): one int64 count column per
    distinct ``pivot_col`` value, one row per ``row_key``.  The pivot
    dictionary is aggregated first — it becomes the OUTPUT SCHEMA, so
    it must be small; more than ``max_pivot_values`` distinct values
    raises (wide schemas don't scale; use the long groupby form).
    Each batch emits per-key partial count VECTORS (one crosstab), so
    the single shuffle carries key-cardinality pre-aggregated rows.
    NULL pivot values drop (SQL ``CASE WHEN col = v`` never matches
    NULL); NULL row keys also drop (crosstab semantics) — filter or
    fill first if they must be kept."""
    from ray.data.aggregate import Sum

    vals = (ds.groupby(pivot_col).aggregate(Count(alias_name="__n"))
            .to_pandas()[pivot_col].dropna().tolist())
    if len(vals) > max_pivot_values:
        raise ValueError(
            f"pivot_counts: {len(vals)} distinct {pivot_col!r} values "
            f"(> {max_pivot_values}); pivot output schema would be "
            "unmanageably wide — keep the long form")
    vals = sorted(str(v) for v in vals)
    cols = [f"{prefix}{v}" for v in vals]

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select([row_key, pivot_col]).to_pandas()
        ct = pd.crosstab(df[row_key], df[pivot_col].astype(str),
                         dropna=False)
        ct = ct.reindex(columns=vals, fill_value=0).astype("int64")
        ct.columns = cols
        ct.index.name = row_key
        # arrow block, not pandas: Ray's sort-aggregate on pandas
        # blocks measured 10x slower on the same partials
        return pa.Table.from_pandas(ct.reset_index(),
                                    preserve_index=False)

    return (ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(row_key)
            .aggregate(*[Sum(c, alias_name=c) for c in cols]))
