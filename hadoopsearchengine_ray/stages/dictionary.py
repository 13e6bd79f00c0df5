"""Dictionary stages: vocab, hot-term detection, and the final
(term, term_id, df, cf) table.

Collapses the reference's stages 3-5 (per-division dictionaries +
occurrence maps + global prefix-sum ids,
/root/reference/DyableHitList/DyableLogFile/WordLogEntry.h:100-125,
DyableLexonWords/LexonWords.cpp:110-153).  Term ids are deterministic
blake2b-64 hashes (oracle.term_id64) instead of sequential division
offsets — no cross-partition ordering dependency.

The build's critical path never shuffles term strings:
  - ``vocab_table``: distinct (term, term_id) from per-block uniques —
    vocabulary-cardinality, tiny next to the token table;
  - ``detect_hot_terms``: sampled df counts -> skewed term-id set;
  - ``dictionary_from_postings``: exact df/cf summed from the (numeric)
    posting rows, term strings re-attached from the broadcast vocab.
Aggregations use the two-level combine pattern throughout (the sort-based
aggregate's cost scales with input block count — measured in BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .postings import term_ids_for


def dict_partials(tokens: rd.Dataset) -> rd.Dataset:
    """Per-batch partial (term, df, cf): df = #(doc,term) rows, cf = sum tf."""

    def _partial(batch: pa.Table) -> pa.Table:
        dict_arr = batch["term"].combine_chunks().dictionary_encode()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(dict_arr.dictionary)
        df = np.bincount(codes, minlength=n).astype(np.int64)
        cf = np.bincount(codes, weights=tf, minlength=n).astype(np.int64)
        return pa.table({
            "term": dict_arr.dictionary.cast(pa.string()),
            "df": pa.array(df, pa.int64()),
            "cf": pa.array(cf, pa.int64()),
        })

    return tokens.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)


def _combine_partials(batch: pa.Table) -> pa.Table:
    """Second-level map-side combine (cuts the aggregate's input blocks)."""
    d = batch["term"].combine_chunks().dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    df = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    cf = batch["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(d.dictionary)
    return pa.table({
        "term": d.dictionary.cast(pa.string()),
        "df": pa.array(np.bincount(codes, weights=df, minlength=n).astype(np.int64)),
        "cf": pa.array(np.bincount(codes, weights=cf, minlength=n).astype(np.int64)),
    })


def _add_id(batch: pa.Table) -> pa.Table:
    tid = term_ids_for(batch["term"].combine_chunks().to_pylist())
    return batch.append_column("term_id", pa.array(tid, pa.int64()))


def build_dictionary(tokens: rd.Dataset, combine_blocks: int = 32) -> rd.Dataset:
    """Token rows -> (term, term_id, df, cf) via direct aggregation (used
    by the generic text operators; the index build derives its dictionary
    from posting rows instead — dictionary_from_postings)."""
    agg = (
        dict_partials(tokens)
        .repartition(combine_blocks)
        .map_batches(_combine_partials, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
    )
    return agg.map_batches(_add_id, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)


def vocab_table(tokens: rd.Dataset, combine_blocks: int = 8,
                sample_mod: int = 16) -> rd.Dataset:
    """ONE scan producing both the distinct vocab AND the sampled-df
    column used for hot-term detection: (term, term_id, df_sample).

    ``df_sample`` counts docs with ``doc_id % sample_mod == 0`` — a
    DETERMINISTIC sample (same docs at any parallelism -> same hot set,
    required for build determinism).  Terms seen only outside the sample
    still appear (df_sample = 0), so this is the complete vocabulary.
    blake2b ids are computed once per distinct term AFTER dedup, not per
    block."""

    def _partial(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = doc % np.uint64(sample_mod) == 0
        d = batch["term"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d.dictionary)
        df = np.bincount(codes[keep], minlength=n).astype(np.int64)
        return pa.table({
            "term": d.dictionary.cast(pa.string()),
            "df_sample": pa.array(df, pa.int64()),
        })

    def _combine(batch: pa.Table) -> pa.Table:
        d = batch["term"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        df = batch["df_sample"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d.dictionary)
        return pa.table({
            "term": d.dictionary.cast(pa.string()),
            "df_sample": pa.array(
                np.bincount(codes, weights=df, minlength=n).astype(np.int64)),
        })

    ds = tokens.map_batches(_partial, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)
    if combine_blocks:  # needed when the input arrives in many blocks
        ds = (ds.repartition(combine_blocks)
              .map_batches(_combine, batch_format="pyarrow", batch_size=None))
    return (ds.groupby("term")
            .aggregate(Sum("df_sample", alias_name="df_sample"))
            .map_batches(_add_id, batch_format="pyarrow", batch_size=None))


def hot_terms_from_vocab(vocab: rd.Dataset, num_docs: int, hot_df_frac: float,
                         sample_mod: int = 16) -> dict[int, int]:
    """Skewed term-id set from the vocab table's sampled df.

    Borderline misclassification is safe: a missed hot term just skips
    salting (performance), a false positive just adds salt rows
    (correctness unaffected)."""
    cut = max(2.0, hot_df_frac * num_docs / sample_mod)
    hot_tbl = vocab.filter(expr=f"df_sample >= {cut}").to_pandas()
    if "term_id" not in hot_tbl.columns:  # empty result loses the schema
        return {}
    return {int(t): i for i, t in enumerate(sorted(hot_tbl["term_id"]))}


def dictionary_from_postings(postings: rd.Dataset,
                             vocab: rd.Dataset) -> rd.Dataset:
    """Exact (term, term_id, df, cf): summed over the salted sub-rows of
    the already-built posting table (vocabulary-cardinality input — no
    second pass over the token table), term strings re-attached from the
    broadcast vocab table."""
    small = postings.select_columns(["term_id", "df", "cf"])

    def _cast(batch: pa.Table) -> pa.Table:
        return pa.table({
            "term_id": batch["term_id"],
            "df": batch["df"].cast(pa.int64()),
            "cf": batch["cf"].cast(pa.int64()),
        })

    agg = (small.map_batches(_cast, batch_format="pyarrow", batch_size=None)
           .groupby("term_id")
           .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf")))

    # term strings re-attach via a broadcast pd.Series probe (vectorized
    # hashtable map, not a per-row loop) up to ``broadcast_limit``
    # distinct terms; above it — a vocabulary too big to broadcast —
    # fall back to the co-partitioned hash join
    vocab = vocab.materialize()
    broadcast_limit = 2_000_000
    if vocab.count() > broadcast_limit:
        from ..pipelines.relational import hash_join

        return hash_join(agg, vocab.select_columns(["term_id", "term"]),
                         on="term_id")
    import pandas as pd

    vocab_pdf = vocab.to_pandas()
    lut_ref = ray.put(pd.Series(vocab_pdf["term"].to_numpy(),
                                index=vocab_pdf["term_id"].astype(np.int64)))

    def _attach_term(batch: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(lut_ref)
        batch["term"] = batch["term_id"].map(lut)
        return batch

    return agg.map_batches(_attach_term, batch_format="pandas",
                           batch_size=None)
