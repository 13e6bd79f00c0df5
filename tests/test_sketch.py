"""Sketch operators (functions/sketch.py): Space-Saving heavy hitters
and HyperLogLog distinct counting against exact computations."""

import collections

import numpy as np
import pyarrow as pa
import ray.data as rd

from hadoopsearchengine_ray.functions.sketch import (
    hll_distinct,
    term_heavy_hitters,
)
from hadoopsearchengine_ray.tokenizer import tokenize_py


def _doc_ds(texts, parts=1):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    return ds.repartition(parts) if parts > 1 else ds


def _zipf_texts(n_docs=80, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"term{i:03d}" for i in range(120)]
    weights = 1.0 / np.arange(1, 121) ** 1.2
    weights /= weights.sum()
    return [" ".join(rng.choice(vocab, size=60, p=weights))
            for _ in range(n_docs)]


def test_heavy_hitters_exact_regime():
    texts = _zipf_texts()
    out = term_heavy_hitters(_doc_ds(texts, parts=6), k=20,
                             capacity=100_000).to_pandas()
    cf = collections.Counter(t for x in texts for t in tokenize_py(x))
    exp = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(out["term"], out["cf"])) == exp


def test_heavy_hitters_truncated_keeps_heavy_terms_exact():
    # a term kept in EVERY partial's top-m survives every truncation, so
    # its merged count is exact — the Space-Saving merge guarantee for
    # genuinely heavy hitters
    texts = _zipf_texts(n_docs=60, seed=9)
    out = term_heavy_hitters(_doc_ds(texts, parts=8), k=5,
                             capacity=32).to_pandas()
    cf = collections.Counter(t for x in texts for t in tokenize_py(x))
    exp = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = list(zip(out["term"], out["cf"]))
    assert got == exp
    # and no sketch count can exceed the truth
    for term, c in got:
        assert c <= cf[term]


def test_hll_distinct_accuracy():
    n = 50_000
    ds = rd.range(n).map_batches(
        lambda b: pa.table({"v": pa.array([f"value-{i}" for i in b["id"]],
                                          pa.string())}),
        batch_format="pyarrow")
    est = hll_distinct(ds, "v", p=14)
    assert abs(est / n - 1) < 0.03
    # determinism: same input -> same estimate
    assert hll_distinct(ds, "v", p=14) == est


def test_hll_distinct_small_cardinality():
    ds = rd.from_arrow(pa.table({"v": pa.array(
        [f"x{i % 37}" for i in range(2000)], pa.string())}))
    est = hll_distinct(ds, "v", p=12)
    assert abs(est / 37 - 1) < 0.05
