"""Sketch operators (functions/sketch.py): Space-Saving heavy hitters
and HyperLogLog distinct counting against exact computations."""

import collections

import numpy as np
import pyarrow as pa
import ray.data as rd

from hadoopsearchengine_ray.functions.sketch import (
    bloom_build,
    bloom_filter_batches,
    hll_distinct,
    quantile_sketch,
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


def _val_ds(vals, parts=4):
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    return ds.repartition(parts)


def test_quantile_sketch_exact_regime_matches_quantile_disc():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 500, size=3000).astype(float)
    qs = [0.1, 0.5, 0.95, 1.0]
    got = quantile_sketch(_val_ds(list(vals), parts=7), "x", qs,
                          capacity=100_000)
    s = np.sort(vals)
    exp = [s[max(0, int(np.ceil(q * len(s))) - 1)] for q in qs]
    assert got == exp


def test_quantile_sketch_truncated_rank_error_bounded():
    rng = np.random.default_rng(11)
    vals = rng.normal(size=20_000)
    got = quantile_sketch(_val_ds(list(vals), parts=16), "x",
                          [0.25, 0.5, 0.9], capacity=512)
    s = np.sort(vals)
    for q, v in zip([0.25, 0.5, 0.9], got):
        rank = np.searchsorted(s, v, side="right") / len(s)
        assert abs(rank - q) < 0.03, (q, v, rank)
    # determinism
    assert quantile_sketch(_val_ds(list(vals), parts=16), "x",
                           [0.25, 0.5, 0.9], capacity=512) == got


def test_grouped_quantiles_exact_regime():
    from hadoopsearchengine_ray.functions.sketch import grouped_quantiles

    rng = np.random.default_rng(5)
    keys = rng.choice(["a", "b", "c"], size=5000)
    vals = rng.integers(0, 200, size=5000).astype(float)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.string()),
        "x": pa.array(vals, pa.float64()),
    })).repartition(6)
    out = (grouped_quantiles(ds, "k", "x", [0.5, 0.9], capacity=100_000)
           .to_pandas().sort_values("k").reset_index(drop=True))
    for i, kv in enumerate(["a", "b", "c"]):
        s = np.sort(vals[keys == kv])
        for q, col in [(0.5, "q_0_5"), (0.9, "q_0_9")]:
            exp = s[max(0, int(np.ceil(q * len(s))) - 1)]
            assert out.loc[i, col] == exp, (kv, q)


def test_bloom_no_false_negatives_and_low_fp():
    keys = rd.from_arrow(pa.table({"k": pa.array(
        [i * 3 for i in range(5000)], pa.int64())}))
    bits = bloom_build(keys, "k", num_bits=1 << 17)
    probe = rd.from_arrow(pa.table({"k": pa.array(
        list(range(30000)), pa.int64())})).repartition(4)
    kept = bloom_filter_batches(probe, "k", bits).to_pandas()["k"].to_numpy()
    member = set(i * 3 for i in range(5000))
    assert member <= set(kept.tolist())          # no false negatives
    fp = len(set(kept.tolist()) - member) / (30000 - len(member))
    assert fp < 0.02, fp


def test_bloom_semi_join_matches_plain_semi_join():
    from hadoopsearchengine_ray.pipelines.relational import bloom_semi_join

    big = rd.from_arrow(pa.table({
        "k": pa.array([i % 100 for i in range(4000)], pa.int64()),
        "v": pa.array(range(4000), pa.int64()),
    })).repartition(5)
    keys = rd.from_arrow(pa.table({
        # duplicates + a null: distinct-fold and SQL IN semantics
        "k": pa.array([1, 2, 2, 3, 50, 50, 99, None], pa.int64()),
    }))
    out = bloom_semi_join(big, keys, on="k", num_bits=1 << 13).to_pandas()
    exp = {1, 2, 3, 50, 99}
    assert set(out["k"]) == exp
    assert len(out) == 4000 // 100 * len(exp)
    assert sorted(out.columns) == ["k", "v"]


def test_null_semantics_windows_and_sketches(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from hadoopsearchengine_ray.functions import sketch as sk
    from hadoopsearchengine_ray.pipelines.relational import (
        cumsum_per_key,
        lag_per_key,
        rank_per_key,
    )

    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a", None, None, "a"], pa.string()),
        "id": pa.array([0, 1, 2, 3], pa.int64()),
        "v": pa.array([10.0, 5.0, 7.0, 20.0]),
    }))
    # NULL keys form ONE partition everywhere (SQL PARTITION BY/GROUP BY)
    r = rank_per_key(ds, "k", "v").to_pandas().sort_values("id")
    assert list(r["rnk"]) == [2, 2, 1, 1]
    c = cumsum_per_key(ds, "k", ["id"], "v").to_pandas().sort_values("id")
    assert list(c["running_total"]) == [10.0, 5.0, 12.0, 30.0]
    lg = lag_per_key(ds, "k", ["id"], "v").to_pandas().sort_values("id")
    assert lg["lagged"].iloc[2] == 5.0 and lg["lagged"].iloc[3] == 10.0
    h = sk.hll_distinct_per_key(ds, "k", "v", p=12).to_pandas()
    assert len(h) == 2          # the NULL-key group survives
    q = sk.grouped_quantiles(ds, "k", "v", [0.5]).to_pandas()
    assert len(q) == 2
    # count(DISTINCT col) ignores NULL values
    g = sk.hll_distinct(rd.from_arrow(pa.table(
        {"x": pa.array(["a", None, None], pa.string())})), "x", p=12)
    assert round(g) == 1
