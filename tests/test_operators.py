"""Operator-library checks: dedup / similarity / text / relational /
multimodal against independent in-process computations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from hadoopsearchengine_ray.functions import dedup, multimodal, similarity, text
from hadoopsearchengine_ray.pipelines import relational as rel
from hadoopsearchengine_ray.tokenizer import tokenize_py


def _doc_ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta",
    "alpha beta gamma delta epsilon zeta eta theta",          # exact dup of 0
    "alpha beta gamma delta epsilon zeta eta iota",           # near dup of 0
    "completely different words nothing shared here at all",
    "the quick brown fox jumps over the lazy dog again",
    "le chat et la souris et les des la le",                  # french-ish
]


def test_exact_dedup():
    out = dedup.exact_dedup(_doc_ds(TEXTS)).to_pandas().sort_values("doc_id")
    got = dict(zip(out.doc_id, out.n_dups))
    assert got[0] == 2 and 1 not in got
    assert got[2] == 1 and got[3] == 1


def test_minhash_finds_near_dups():
    out = dedup.minhash_lsh_pairs(_doc_ds(TEXTS), n=2, jaccard_threshold=0.5).to_pandas()
    pairs = set(zip(out.d1, out.d2))
    assert (0, 1) in pairs          # exact dup -> jaccard 1.0
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup
    assert not any(3 in p for p in pairs)


def test_simhash_near_dups():
    out = dedup.simhash_dup_pairs(_doc_ds(TEXTS), max_hamming=10).to_pandas()
    pairs = set(zip(out.d1, out.d2))
    assert (0, 1) in pairs
    ham = dict(zip(zip(out.d1, out.d2), out.hamming))
    assert ham[(0, 1)] == 0


def test_shingle_overlap_pairs():
    out = dedup.shingle_overlap_pairs(
        _doc_ds(TEXTS), n=3, min_common=3, max_df=50).to_pandas()
    pairs = {(a, b): c for a, b, c in zip(out.d1, out.d2, out.common)}
    # docs 0,1 identical: all 6 shingles shared (each shingle has df=2 <= cap)
    assert pairs.get((0, 1)) == 6


def test_ngram_jaccard_matches_bruteforce():
    out = dedup.ngram_jaccard_pairs(
        _doc_ds(TEXTS), n=2, threshold=0.3, min_common=1, max_df=50).to_pandas()
    got = {(a, b): j for a, b, j in zip(out.d1, out.d2, out.jaccard)}
    # brute force over distinct 2-gram sets (df cap inactive at df<=50)
    sets = []
    for t in TEXTS:
        toks = tokenize_py(t)
        sets.append({tuple(toks[i:i + 2]) for i in range(len(toks) - 1)})
    want = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            if inter:
                jac = inter / len(sets[i] | sets[j])
                if jac >= 0.3:
                    want[(i, j)] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12, k
    assert got[(0, 1)] == 1.0


def test_ngram_jaccard_join_path_matches_broadcast():
    kw = dict(n=2, threshold=0.3, min_common=1, max_df=50)
    a = dedup.ngram_jaccard_pairs(_doc_ds(TEXTS), **kw).to_pandas()
    b = dedup.ngram_jaccard_pairs(_doc_ds(TEXTS), broadcast_max_docs=0,
                                  **kw).to_pandas()
    cols = ["d1", "d2", "jaccard"]
    a = a[cols].sort_values(["d1", "d2"]).reset_index(drop=True)
    b = b[cols].sort_values(["d1", "d2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_range_join_keyed_and_keyless_match_bruteforce():
    rng = np.random.default_rng(11)
    n_p, n_i = 400, 60
    base = np.datetime64("2024-01-01", "us")
    p_ts = base + rng.integers(0, 10**7, n_p).astype("timedelta64[us]")
    p_k = rng.integers(0, 8, n_p)
    s = base + rng.integers(0, 10**7, n_i).astype("timedelta64[us]")
    e = s + rng.integers(1, 5 * 10**5, n_i).astype("timedelta64[us]")
    i_k = rng.integers(0, 8, n_i)
    pts = rd.from_arrow(pa.table({
        "pid": pa.array(range(n_p), pa.int64()),
        "k": pa.array(p_k, pa.int64()),
        "ts": pa.array(p_ts),
    }))
    ivs = rd.from_arrow(pa.table({
        "iid": pa.array(range(n_i), pa.int64()),
        "k": pa.array(i_k, pa.int64()),
        "s": pa.array(s),
        "e": pa.array(e),
    }))
    contain = (p_ts[:, None] >= s[None, :]) & (p_ts[:, None] < e[None, :])
    keyed_want = {(p, i) for p, i in zip(*np.nonzero(
        contain & (p_k[:, None] == i_k[None, :])))}
    keyless_want = {(p, i) for p, i in zip(*np.nonzero(contain))}

    out = rel.range_join(pts, ivs, on="ts", start_col="s", end_col="e",
                         by="k").to_pandas()
    assert set(zip(out.pid, out.iid)) == keyed_want

    out2 = rel.range_join(pts.select_columns(["pid", "ts"]),
                          ivs.select_columns(["iid", "s", "e"]),
                          on="ts", start_col="s", end_col="e").to_pandas()
    assert set(zip(out2.pid, out2.iid)) == keyless_want

    # ns-unit points must normalize to us, not shift the window 1000x
    pts_ns = rd.from_arrow(pa.table({
        "pid": pa.array(range(n_p), pa.int64()),
        "ts": pa.array(p_ts.astype("datetime64[ns]")),
    }))
    out3 = rel.range_join(pts_ns, ivs.select_columns(["iid", "s", "e"]),
                          on="ts", start_col="s", end_col="e").to_pandas()
    assert set(zip(out3.pid, out3.iid)) == keyless_want


def test_token_count_matches_python_re():
    import re

    texts = TEXTS + ["", "  x12 3.14 foo_bar!!  ", "def f(x): return x+1"]
    out = (text.token_count_table(_doc_ds(texts)).to_pandas()
           .set_index("doc_id").sort_index())
    ws = re.compile(r"\S+")
    bpe = re.compile(r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+")
    for i, t in enumerate(texts):
        assert out.loc[i, "n_ws"] == len(ws.findall(t))
        assert out.loc[i, "n_bpe"] == len(bpe.findall(t))


def test_stratified_sample_deterministic_quota():
    import hashlib

    rng = np.random.default_rng(7)
    n = 500
    keys = rng.integers(0, 20, n)
    ids = rng.permutation(n)
    ds = rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "k": pa.array(keys, pa.int64()),
    }))
    out = rel.stratified_sample(ds, key="k", id_col="id", n=3).to_pandas()
    assert "__rk" not in out.columns and "__bucket" not in out.columns

    def h(i):
        return int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:16],
                              "little") & 0x7FFFFFFFFFFFFFFF

    want = set()
    df = pd.DataFrame({"id": ids, "k": keys})
    for k, g in df.groupby("k"):
        picked = sorted(g["id"], key=lambda i: (h(i), i))[:3]
        want.update((k, i) for i in picked)
    assert set(zip(out.k, out.id)) == want
    # rerun is identical (pure function of ids)
    out2 = rel.stratified_sample(ds, key="k", id_col="id", n=3).to_pandas()
    assert set(zip(out2.k, out2.id)) == want


def test_joins_null_key_sql_semantics():
    # SQL: NULL keys never match (pandas merge would pair NaN==NaN)
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, None], pa.int64()),
        "a": pa.array([10, 20, 30], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, None], pa.int64()),
        "b": pa.array([100, 200], pa.int64()),
    }))
    inner = rel.hash_join(left, right, on="k", num_buckets=4).to_pandas()
    assert set(zip(inner.k, inner.a, inner.b)) == {(1, 10, 100)}
    lj = rel.hash_join(left, right, on="k", how="left",
                       num_buckets=4).to_pandas()
    assert len(lj) == 3  # null-key left row kept, but UNMATCHED
    assert lj[lj.a == 30]["b"].isna().all()


def test_anti_join_not_exists_semantics():
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, None], pa.int64()),
        "a": pa.array([10, 20, 30, 40], pa.int64()),
    })).repartition(2)
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 2, None, 9], pa.int64()),
    }))
    out = rel.anti_join(left, right, on="k", num_buckets=4).to_pandas()
    # NOT EXISTS: null left key KEPT (never matches); right nulls ignored
    assert set(out["a"]) == {10, 30, 40}
    assert sorted(out.columns) == ["a", "k"]


def test_cumsum_per_key_matches_window_sum():
    rng = np.random.default_rng(13)
    n = 3000
    keys = rng.integers(0, 40, size=n)
    # negative values too: the segment-offset subtraction must not
    # assume a monotone running total
    vals = rng.integers(-50, 100, size=n)
    order = rng.permutation(n)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "o": pa.array(order, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })).repartition(5)
    out = rel.cumsum_per_key(ds, key="k", order_cols=["o"], value_col="v",
                             alias="rt").to_pandas()
    import pandas as pd
    df = pd.DataFrame({"k": keys, "o": order, "v": vals})
    df["rt"] = df.sort_values(["k", "o"]).groupby("k")["v"].cumsum()
    exp = df.sort_values(["k", "o"]).reset_index(drop=True)
    got = out.sort_values(["k", "o"]).reset_index(drop=True)[exp.columns]
    assert got.equals(exp)


def test_lag_per_key_matches_window_lag():
    rng = np.random.default_rng(17)
    n = 2000
    keys = rng.integers(0, 30, size=n)
    vals = rng.integers(0, 1000, size=n)
    order = rng.permutation(n)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "o": pa.array(order, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })).repartition(4)
    import pandas as pd
    for off in (1, -1, 2):
        out = rel.lag_per_key(ds, key="k", order_cols=["o"], value_col="v",
                              offset=off, alias="lg").to_pandas()
        df = pd.DataFrame({"k": keys, "o": order, "v": vals})
        df = df.sort_values(["k", "o"]).reset_index(drop=True)
        df["lg"] = df.groupby("k")["v"].shift(off)
        got = out.sort_values(["k", "o"]).reset_index(drop=True)[df.columns]
        assert got["lg"].fillna(-1).tolist() == df["lg"].fillna(-1).tolist()


def test_rollup_aggregate_levels():
    ds = rd.from_arrow(pa.table({
        "a": pa.array(["x", "x", "y", "y"], pa.string()),
        "b": pa.array(["p", "q", "p", "p"], pa.string()),
        "v": pa.array([1, 2, 3, 4], pa.int64()),
    }))
    out = rel.rollup_aggregate(ds, ["a", "b"], "v", alias="t").to_pandas()
    rows = {(r.a, r.b): r.t for r in out.itertuples()}
    assert rows == {("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 7,
                    ("x", None): 3, ("y", None): 7, (None, None): 10}


def test_hll_distinct_per_key():
    from hadoopsearchengine_ray.functions.sketch import hll_distinct_per_key

    rng = np.random.default_rng(3)
    keys, vals = [], []
    for k, card in [("a", 5), ("b", 700), ("c", 1)]:
        draws = rng.integers(0, card, size=4000)
        keys += [k] * len(draws)
        vals += [f"{k}-{d}" for d in draws]
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.string()),
        "v": pa.array(vals, pa.string()),
    })).repartition(6)
    out = hll_distinct_per_key(ds, "k", "v", p=12).to_pandas() \
        .set_index("k")["n_distinct_est"]
    for k, card in [("a", 5), ("b", 700), ("c", 1)]:
        true = len({v for kk, v in zip(keys, vals) if kk == k})
        assert abs(out[k] / true - 1) < 0.05, (k, out[k], true, card)


def test_range_join_null_rows_dropped():
    base = np.datetime64("2024-01-01", "us")
    m = np.timedelta64(60_000_000, "us")
    pts = rd.from_arrow(pa.table({
        "pid": pa.array([0, 1, 2], pa.int64()),
        "k": pa.array([1, 1, None], pa.int64()),
        "ts": pa.array([base, None, base]),
    }))
    ivs = rd.from_arrow(pa.table({
        "iid": pa.array([0, 1], pa.int64()),
        "k": pa.array([1, None], pa.int64()),
        "s": pa.array([base - m, None]),
        "e": pa.array([base + m, base]),
    }))
    out = rel.range_join(pts, ivs, on="ts", start_col="s", end_col="e",
                         by="k").to_pandas()
    assert set(zip(out.pid, out.iid)) == {(0, 0)}
    # keyless: null ts / null interval bounds drop, valid pairs remain
    out2 = rel.range_join(pts.select_columns(["pid", "ts"]),
                          ivs.select_columns(["iid", "s", "e"]),
                          on="ts", start_col="s", end_col="e").to_pandas()
    assert set(zip(out2.pid, out2.iid)) == {(0, 0), (2, 0)}


def test_dedup_clusters_connected_components():
    # chain 0-1-2, pair 5-6, singleton 3,4
    pairs = rd.from_arrow(pa.table({
        "d1": pa.array([0, 1, 5], pa.int64()),
        "d2": pa.array([1, 2, 6], pa.int64()),
    }))
    lab = dedup.dedup_clusters(pairs, 7)
    assert lab.tolist() == [0, 0, 0, 3, 4, 5, 5]


def test_knn_cosine_matches_bruteforce():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((300, 16))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    }))
    q = m[:3]
    out = similarity.knn_cosine(emb, q, k=5, vec_col="embedding")
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    m32 = np.asarray(np.asarray(m, dtype=np.float32), dtype=np.float64)
    m32n = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    for qi in range(3):
        sims = m32n @ m32n[qi]
        exp = np.lexsort((np.arange(300), -sims))[:5]
        got = out[out.qid == qi].sort_values("rank").vec_id.to_numpy()
        assert list(got) == list(exp), qi


def test_text_metrics_match_python():
    ds = _doc_ds(TEXTS)
    q = text.quality_table(ds).to_pandas().set_index("doc_id")
    fp = text.fingerprint_table(ds).to_pandas().set_index("doc_id")
    for i, t in enumerate(TEXTS):
        toks = tokenize_py(t)
        assert q.loc[i, "n_tokens"] == len(toks)
        assert q.loc[i, "total_chars"] == sum(len(x) for x in toks)
        assert q.loc[i, "n_distinct"] == len(set(toks))
    # identical docs -> identical fingerprints; different docs differ
    assert fp.loc[0, "fingerprint"] == fp.loc[1, "fingerprint"]
    assert fp.loc[0, "fingerprint"] != fp.loc[3, "fingerprint"]


def test_lang_id():
    out = text.lang_id_table(_doc_ds(TEXTS)).to_pandas().set_index("doc_id")
    assert out.loc[4, "lang_pred"] == "en"
    assert out.loc[5, "lang_pred"] == "fr"
    assert out.loc[0, "lang_pred"] == "und"


def test_bigram_table():
    out = text.bigram_table(_doc_ds(["aa bb aa bb", "aa bb"]), k=10).to_pandas()
    top = dict(zip(out.bigram, out.n))
    assert top["aa bb"] == 3 and top["bb aa"] == 1


def test_pmi_bigrams_matches_bruteforce():
    """PMI ranking + exact count columns vs a pure-Python recompute
    (same tokenizer, same lift formula and op order)."""
    import collections
    import math

    texts = ["aa bb cc aa bb", "cc dd aa bb", "dd cc dd cc aa",
             "bb aa bb aa", "cc aa dd bb cc dd"] * 3
    out = text.pmi_bigrams(_doc_ds(texts), min_count=2, k=10)

    uni, big = collections.Counter(), collections.Counter()
    for t in texts:
        toks = t.split()
        uni.update(toks)
        big.update(" ".join(p) for p in zip(toks, toks[1:]))
    n1, n2 = sum(uni.values()), sum(big.values())
    scored = sorted(
        ((-(c * n1 * n1) / (n2 * uni[g.split()[0]] * uni[g.split()[1]]),
          g, c) for g, c in big.items() if c >= 2))
    want = [(g, c) for _, g, c in scored][:10]
    assert list(zip(out.bigram, out.n_ab)) == want
    assert out["rank"].tolist() == list(range(1, len(want) + 1))
    for _, r in out.iterrows():
        a, b = r.bigram.split()
        assert (r.n_a, r.n_b) == (uni[a], uni[b])
    # PMI sanity: the top pair's lift exceeds 1 (ln(lift) > 0)
    top = out.iloc[0]
    assert math.log((top.n_ab * n1 * n1)
                    / (n2 * top.n_a * top.n_b)) > 0


def test_pmi_bigrams_empty_and_threshold():
    assert len(text.pmi_bigrams(_doc_ds([]), min_count=2, k=5)) == 0
    # every bigram under the count floor -> typed empty frame
    out = text.pmi_bigrams(_doc_ds(["aa bb", "cc dd"]), min_count=3, k=5)
    assert len(out) == 0 and list(out.columns) == [
        "rank", "bigram", "n_ab", "n_a", "n_b"]


def test_relational_primitives():
    df = pa.table({
        "k": pa.array([1, 1, 2, 2, 2, 3], pa.int64()),
        "w": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], pa.float64()),
    })
    ds = rd.from_arrow(df)
    occ = rel.key_occurrence(ds, "k").to_pandas().set_index("k")["n"].to_dict()
    assert occ == {1: 2, 2: 3, 3: 1}
    kw = rel.key_weight(ds, "k", "w").to_pandas().set_index("k")["w"].to_dict()
    assert kw == {1: 3.0, 2: 12.0, 3: 6.0}
    ann = rel.annotate_key_count(ds, "k").to_pandas()
    assert len(ann) == 6 and set(ann[ann.k == 2].n) == {3}
    ms = rel.merge_set(ds, "k", "w").to_pandas().set_index("k")["vals"].to_dict()
    assert ms[2] == "3.0,4.0,5.0"
    assert rel.kth_percentile(ds, "w", 0.5) == 3.0


def test_kth_percentile_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 1000, 777).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    con = duckdb.connect()
    for q in (0.5, 0.9, 0.95, 0.99):
        exp = con.execute(
            "SELECT quantile_disc(v, ?) FROM (SELECT unnest(?) AS v)",
            [q, vals.tolist()],
        ).fetchone()[0]
        assert rel.kth_percentile(ds, "v", q) == exp, q


def test_multimodal_plumbing():
    media = rd.from_arrow(multimodal.synthetic_media(50))
    out = multimodal.extract_features(media, concurrency=1).to_pandas()
    assert len(out) == 50
    assert all(len(f) == multimodal.MediaFeatureExtractor.FEAT_DIM
               for f in out.feature)
    # deterministic: same payload -> same feature
    out2 = multimodal.extract_features(
        rd.from_arrow(multimodal.synthetic_media(50)), concurrency=1).to_pandas()
    assert [list(a) for a in out.sort_values("media_id").feature] == \
           [list(a) for a in out2.sort_values("media_id").feature]
    # real codecs are stubbed
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.MediaFeatureExtractor(codec="pil")


def test_hash_join_inner_and_left():
    from hadoopsearchengine_ray.pipelines import relational as rel

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "lv": pa.array([10, 20, 30, 40], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 5], pa.int64()),
        "rv": pa.array(["b", "c", "e"]),
    }))
    inner = rel.hash_join(left, right, on="k").to_pandas().sort_values("k")
    assert inner["k"].tolist() == [2, 3]
    assert inner["lv"].dtype == np.int64  # dtype restored after union nulls
    assert inner["rv"].tolist() == ["b", "c"]

    lj = rel.hash_join(left, right, on="k", how="left").to_pandas().sort_values("k")
    assert lj["k"].tolist() == [1, 2, 3, 4]
    assert lj["rv"].isna().sum() == 2


def test_hash_join_rejects_overlapping_columns():
    from hadoopsearchengine_ray.pipelines import relational as rel

    a = rd.from_items([{"k": 1, "v": 2}])
    b = rd.from_items([{"k": 1, "v": 3}])
    with pytest.raises(ValueError, match="disjoint"):
        rel.hash_join(a, b, on="k")


def test_join_dispatches_by_size():
    from hadoopsearchengine_ray.pipelines import relational as rel

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "lv": pa.array([1.5, 2.5], pa.float64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "rv": pa.array([7, 8], pa.int64()),
    }))
    out = rel.join(left, right, on="k").to_pandas().sort_values("k")
    assert out["rv"].tolist() == [7, 8]


def test_hash_join_matches_duckdb_on_fact_tables():
    import duckdb

    from hadoopsearchengine_ray.pipelines import relational as rel

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 500, 3000)
    rk = np.arange(0, 600)
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()),
        "lv": pa.array(np.arange(3000), pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(rk, pa.int64()),
        "rv": pa.array(rk * 10, pa.int64()),
    }))
    got = (rel.hash_join(left, right, on="k").to_pandas()
           .sort_values(["k", "lv"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("l", pa.table({"k": lk.astype("int64"),
                                "lv": np.arange(3000, dtype="int64")}))
    con.register("r", pa.table({"k": rk.astype("int64"),
                                "rv": (rk * 10).astype("int64")}))
    exp = con.execute(
        "SELECT l.k, lv, rv FROM l JOIN r USING (k) ORDER BY k, lv"
    ).df()
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["lv"].tolist() == exp["lv"].tolist()
    assert got["rv"].tolist() == exp["rv"].tolist()


def test_connected_components_matches_dense():
    rng = np.random.default_rng(11)
    n = 1200
    e1 = rng.integers(0, n, 900)
    e2 = rng.integers(0, n, 900)
    chain = np.arange(100, 400)  # long path: exercises O(log n) rounds
    d1 = np.concatenate([np.minimum(e1, e2), chain[:-1]])
    d2 = np.concatenate([np.maximum(e1, e2), chain[1:]])
    keep = d1 != d2
    pairs = rd.from_arrow(pa.table({
        "d1": pa.array(d1[keep], pa.int64()),
        "d2": pa.array(d2[keep], pa.int64()),
    })).repartition(4)
    dense = dedup.dedup_clusters(pairs, n)
    cc = dedup.connected_components(pairs).to_pandas()
    lab = dict(zip(cc["node"], cc["root"]))
    assert all(lab.get(i, i) == dense[i] for i in range(n))


def test_ivf_knn_recall():
    rng = np.random.default_rng(17)
    m = rng.standard_normal((1000, 32))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(1000), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    }))
    q = m[:4]
    exact = similarity.knn_cosine(emb, q, k=10)
    approx = similarity.ivf_knn(emb, q, k=10, nprobe=6, num_lists=16, dim=32)
    recalls = []
    for qi in range(4):
        e = set(exact[exact.qid == qi].vec_id)
        g = set(approx[approx.qid == qi].vec_id)
        recalls.append(len(e & g) / len(e))
    # probing 6/16 lists on random data must recover most true neighbors
    assert np.mean(recalls) >= 0.7, recalls
    # full probe == exact
    full = similarity.ivf_knn(emb, q, k=10, nprobe=16, num_lists=16, dim=32)
    for qi in range(4):
        assert list(full[full.qid == qi].sort_values("rank").vec_id) == \
            list(exact[exact.qid == qi].sort_values("rank").vec_id)


def test_media_pipeline_resize_and_frames():
    media = rd.from_arrow(multimodal.synthetic_media(30))
    out = multimodal.media_pipeline(media, frames_per_clip=4,
                                    concurrency=1).to_pandas()
    # videos fan out to 4 frame rows; images/audio stay single rows
    per = out.groupby("media_id").size()
    kinds = multimodal.synthetic_media(30).to_pandas().set_index("media_id")["kind"]
    for mid, n in per.items():
        assert n == (4 if kinds[mid] == "video" else 1), (mid, kinds[mid], n)
    assert all(len(f) == multimodal.MediaFeatureExtractor.FEAT_DIM
               for f in out.feature)
    # deterministic end to end
    out2 = multimodal.media_pipeline(rd.from_arrow(multimodal.synthetic_media(30)),
                                     frames_per_clip=4, concurrency=1).to_pandas()
    a = out.sort_values(["media_id", "frame_idx"]).feature.tolist()
    b = out2.sort_values(["media_id", "frame_idx"]).feature.tolist()
    assert [list(x) for x in a] == [list(x) for x in b]
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal.MediaResizer(codec="pil")
    with _pytest.raises(NotImplementedError):
        multimodal.FrameSampler(codec="ffmpeg")


def test_embedding_near_dup_fsl_and_loud_cap(capfd):
    """Round-3: vectors ride the LSH shuffle as fixed_size_list (zero-copy
    both ends); oversized buckets are skipped LOUDLY, not silently."""
    rng = np.random.default_rng(3)
    m = rng.standard_normal((40, 16))
    m[1] = m[0] + 1e-4  # near-dup pair (0, 1)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    }))
    out = similarity.embedding_near_dup(
        emb, sim_threshold=0.98, num_planes=6, num_tables=2, dim=16).to_pandas()
    assert (0, 1) in set(zip(out.d1, out.d2))

    # one duplicate blob -> every vector in one bucket -> cap skip warns
    dup = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(30), pa.int64()),
        "embedding": pa.array([m[0].tolist()] * 30, pa.list_(pa.float32())),
    }))
    capped = similarity.embedding_near_dup(
        dup, sim_threshold=0.9, num_planes=4, num_tables=1, dim=16,
        max_bucket=10).to_pandas()
    assert len(capped) == 0
    # the warning itself, checked in-process (worker stderr forwarding
    # is timing-dependent under the session Ray cluster)
    g = pa.table({
        "vec_id": pa.array(range(12), pa.int64()),
        "vec": pa.FixedSizeListArray.from_arrays(
            pa.array([0.0] * 24, pa.float64()), 2),
    })
    out = similarity._verify_bucket_pairs(g, "vec_id", 0.9, max_bucket=10)
    assert out.num_rows == 0
    err = capfd.readouterr().err
    assert "max_bucket" in err and "skipped" in err


def test_vec_matrix_fixed_size_list_and_ragged():
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()), 2)
    out = similarity._vec_matrix(fsl)
    assert out.shape == (2, 2) and out[1, 0] == 3.0
    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="ragged"):
        similarity._vec_matrix(ragged)


def test_keyword_link_edges_matches_driver_loop():
    """Round-3: the distributed pair builder must aggregate to exactly
    the driver-loop keyword_links edge multiset."""
    texts = [
        "alpha beta gamma alpha beta common common",
        "alpha beta delta delta common",
        "gamma delta epsilon common common common",
        "zeta eta theta",
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    kws_ds = text.keyword_table(docs, top_m=3, pct=0.95).materialize()
    kws = kws_ds.to_pandas()
    vocab, links = text.keyword_links(kws)
    # driver-loop edge weights aggregated per (src, dst)
    import collections
    agg = collections.defaultdict(float)
    for s, d, w in zip(links["src"].to_pylist(), links["dst"].to_pylist(),
                       links["weight"].to_pylist()):
        agg[(vocab[s], vocab[d])] += w
    edges = text.keyword_link_edges(kws_ds).to_pandas()
    deg = edges.groupby("src_kw")["cnt"].sum()
    got = {(r.src_kw, r.dst_kw): r.cnt / deg[r.src_kw]
           for r in edges.itertuples()}
    assert set(got) == set(agg)
    for k in got:
        assert abs(got[k] - agg[k]) < 1e-9, k


def test_incremental_dedup_anti_join_and_first_per_hash(ray_session):
    """Continual ingestion: mirrors of indexed content drop; within-batch
    duplicates keep only the lowest id; fresh uniques survive."""
    import hashlib

    existing_texts = ["alpha beta", "gamma delta", "epsilon zeta"]
    sha = rd.from_items([
        {"sha256": hashlib.sha256(t.encode()).hexdigest()}
        for t in existing_texts])
    incoming = rd.from_items([
        {"doc_id": 10, "text": "alpha beta"},      # mirror -> dropped
        {"doc_id": 11, "text": "new one"},         # fresh -> kept
        {"doc_id": 12, "text": "new two"},         # fresh -> kept
        {"doc_id": 13, "text": "new one"},         # batch dup -> dropped
        {"doc_id": 14, "text": "gamma delta"},     # mirror -> dropped
    ])
    out = dedup.incremental_dedup(incoming, sha).to_pandas()
    out = out.sort_values("doc_id")
    assert list(out["doc_id"]) == [11, 12]
    assert list(out["h"]) == [
        hashlib.sha256(b"new one").hexdigest(),
        hashlib.sha256(b"new two").hexdigest()]


def test_tfidf_table_matches_bruteforce(ray_session):
    """Smooth-idf vectorizer parity with a per-doc Counter shadow."""
    import math
    from collections import Counter

    texts = ["alpha beta alpha", "beta gamma", "alpha delta delta delta"]
    docs = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    out = text.tfidf_table(docs).to_pandas()
    got = {(r.doc_id, r.term): r.w for r in out.itertuples()}
    toks = [tokenize_py(t) for t in texts]
    df = Counter(t for ts in toks for t in set(ts))
    exp = {}
    for i, ts in enumerate(toks):
        for t, tf in Counter(ts).items():
            exp[(i, t)] = round(
                tf * (math.log((1 + len(texts)) / (1 + df[t])) + 1.0), 6)
    assert got == exp


def test_clean_corpus_gate_and_dedup(ray_session):
    """Quality thresholds drop short/repetitive docs; exact dedup keeps
    the lowest id among surviving duplicates."""
    good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = rd.from_items([
        {"doc_id": 0, "text": good},                  # kept
        {"doc_id": 1, "text": "tiny doc"},            # < min_tokens
        {"doc_id": 2, "text": "spam " * 20},          # distinct ratio 1/20
        {"doc_id": 3, "text": good},                  # dup of 0 -> dropped
        {"doc_id": 4, "text": good + " lambda"},      # kept (distinct hash)
    ])
    out = text.clean_corpus(docs, min_tokens=5, max_tokens=50,
                            min_distinct_ratio=0.5,
                            min_mean_len=2.0, max_mean_len=12.0).to_pandas()
    assert sorted(out["doc_id"]) == [0, 4]


def test_chunk_table_windows(ray_session):
    """Window boundaries, overlap, and the short tail chunk."""
    import hashlib

    toks = [f"w{i:02d}" for i in range(10)]
    docs = rd.from_items([
        {"doc_id": 0, "text": " ".join(toks)},   # 10 tokens
        {"doc_id": 1, "text": ""},                # no tokens -> no chunks
        {"doc_id": 2, "text": "solo token"},      # 2 tokens -> 1 chunk
    ])
    out = text.chunk_table(docs, size=4, stride=3).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    exp = []
    for start in range(0, 10, 3):                 # 0,3,6,9
        win = toks[start:start + 4]
        exp.append((0, start // 3, len(win),
                    hashlib.md5(" ".join(win).encode()).hexdigest()))
    exp.append((2, 0, 2, hashlib.md5(b"solo token").hexdigest()))
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == exp


def test_mmr_diversifies_near_duplicates(ray_session):
    """A cluster of near-identical high-sim vectors + one distinct
    direction: plain top-2 picks two near-dups, MMR picks one from
    each (the diversification contract)."""
    base = np.zeros(8)
    base[0] = 1.0
    other = np.zeros(8)
    other[0], other[1] = 0.8, 0.6          # sim to query 0.8
    rows = []
    for i in range(3):                      # near-dup cluster, sim ~1.0
        v = base.copy()
        v[7] = 1e-3 * (i + 1)
        rows.append({"vec_id": i, "embedding": list(v)})
    rows.append({"vec_id": 10, "embedding": list(other)})
    ds = rd.from_items(rows)
    out = similarity.mmr_topk(ds, base, k=2, k_prime=4, lam=0.5)
    assert list(out["vec_id"]) == [0, 10]   # not a second near-dup
    # relevance-only (lam=1) degenerates to plain knn order
    out2 = similarity.mmr_topk(ds, base, k=2, k_prime=4, lam=1.0)
    assert list(out2["vec_id"]) == [0, 1]


def test_ivfpq_knn_recall_and_code_size():
    rng = np.random.default_rng(23)
    m = rng.standard_normal((1000, 32))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(1000), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    }))
    q = m[:4]
    exact = similarity.knn_cosine(emb, q, k=10)
    approx = similarity.ivfpq_knn(emb, q, k=10, nprobe=12, num_lists=16,
                                  m=8, ksub=64, rerank=8, dim=32)
    recalls = []
    for qi in range(4):
        e = set(exact[exact.qid == qi].vec_id)
        g = set(approx[approx.qid == qi].vec_id)
        recalls.append(len(e & g) / len(e))
    assert np.mean(recalls) >= 0.7, recalls
    # ranks are 1..k and exact re-rank orders by true cosine: rank-1 of a
    # self-query must be the query vector itself
    for qi in range(4):
        top = approx[(approx.qid == qi) & (approx["rank"] == 1)].vec_id
        assert list(top) == [qi]
    # the compressed scan table really is codes-only: m bytes per vector
    cbs = similarity.pq_train(emb, m=8, ksub=64, dim=32)
    assert cbs.shape == (8, 64, 4)
    table = similarity.pq_encode(emb, cbs).to_pandas()
    assert set(table.columns) == {"vec_id", "code"}
    assert len(table.iloc[0]["code"]) == 8


def test_dup_span_stats_counts_shared_grams():
    shared = " ".join(f"tok{i}" for i in range(10))       # 10-token run
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [
            "alpha beta " + shared + " gamma delta",
            "zeta " + shared + " omega",
            "totally unrelated words only here nothing shared at all",
            "alpha beta " + shared + " gamma delta",   # exact dup of doc 0
        ],
    }))
    out = dedup.dup_span_stats(docs, n=8).to_pandas()
    got = dict(zip(out.doc_id, out.dup_grams))
    # doc 2 has no duplicated grams -> absent
    assert 2 not in got
    # docs 0 and 3 are identical: every one of their 8-grams is shared.
    # doc 0 text = 2 + 10 + 2 = 14 tokens -> 7 distinct 8-grams
    assert got[0] == got[3] == 7
    # doc 1 shares only the grams fully inside the 10-token run with
    # docs 0/3: 10 - 8 + 1 = 3 grams
    assert got[1] == 3


def test_ann_index_persist_and_query(tmp_path):
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.pipelines.ann import AnnIndex, build_ann_index

    rng = np.random.default_rng(31)
    m = rng.standard_normal((600, 32))
    src = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(600), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    }), src)
    idx_dir = str(tmp_path / "annidx")
    meta = build_ann_index(src, idx_dir, num_lists=8, m=8, ksub=32, dim=32)
    assert meta["ksub"] == 32

    emb = rd.read_parquet(src, columns=["vec_id", "embedding"])
    q = m[:3]
    idx = AnnIndex(idx_dir)
    out = idx.query(q, k=10, nprobe=6, rerank=8)
    # identical to the unpersisted IVF-PQ path (same deterministic
    # training): the disk round-trip loses nothing
    fly = similarity.ivfpq_knn(emb, q, k=10, nprobe=6, num_lists=8,
                               m=8, ksub=32, rerank=8, dim=32)
    for qi in range(3):
        assert list(out[out.qid == qi].sort_values("rank").vec_id) == \
            list(fly[fly.qid == qi].sort_values("rank").vec_id)
    # the codes table on disk is hive-partitioned by list_id
    import os
    parts = [d for d in os.listdir(os.path.join(idx_dir, "codes"))
             if d.startswith("list_id=")]
    assert len(parts) > 1


def test_ann_pool_rank_identical_to_dataset_path(tmp_path):
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.pipelines.ann import (
        AnnIndex,
        AnnPool,
        build_ann_index,
    )

    rng = np.random.default_rng(47)
    m = rng.standard_normal((600, 32))
    src = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(600), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    }), src)
    idx_dir = str(tmp_path / "annidx")
    build_ann_index(src, idx_dir, num_lists=8, m=8, ksub=32, dim=32)

    q = m[5:9]
    base = AnnIndex(idx_dir).query(q, k=10, nprobe=6, rerank=8)
    pool = AnnPool(idx_dir, num_owners=3)
    try:
        got = pool.query(q, k=10, nprobe=6, rerank=8)
        for qi in range(len(q)):
            assert list(got[got.qid == qi].sort_values("rank").vec_id) == \
                list(base[base.qid == qi].sort_values("rank").vec_id)
        # zero-candidate edge: nprobe=1 against a far-away query can still
        # hit; force the empty path with an empty probe by querying with
        # k on a pool over an index whose lists all miss is hard to set
        # up deterministically — instead check a second call reuses the
        # pinned state (no rebuild) and stays identical
        again = pool.query(q, k=10, nprobe=6, rerank=8)
        assert again.equals(got)
    finally:
        pool.shutdown()


def test_ann_empty_candidates_returns_typed_empty():
    # zero-candidate edges (ADVICE r3): an empty corpus fails LOUDLY at
    # quantizer training (not an obscure np.stack crash downstream), and
    # an empty ADC candidate set returns the typed empty frame
    import pytest

    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))
    with pytest.raises(ValueError, match="empty embeddings"):
        similarity.ivfpq_knn(emb, np.zeros((1, 32)), k=5, nprobe=2,
                             num_lists=2, m=8, ksub=16, dim=32)
    import pandas as pd
    top = similarity._top_candidates(
        pd.DataFrame({"qid": pd.array([], dtype="int64"),
                      "vec_id": pd.array([], dtype="int64"),
                      "sim": pd.array([], dtype="float64")}), 10)
    assert top.empty
    out = similarity._empty_knn_frame()
    assert list(out.columns) == ["qid", "rank", "vec_id"] and len(out) == 0


def test_rank_per_key_matches_sql_semantics():
    from hadoopsearchengine_ray.pipelines.relational import rank_per_key

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array([10.0, 30.0, 30.0, 5.0, 7.0, 7.0]),
    }))
    out = rank_per_key(ds, "k", "v", descending=True).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    # k=1 DESC: 30,30 -> rank 1,1 (dense 1,1); 10 -> rank 3 (dense 2);
    # 5 -> rank 4 (dense 3).  k=2: 7,7 -> rank 1,1.
    assert list(out["rnk"]) == [3, 1, 1, 4, 1, 1]
    assert list(out["drnk"]) == [2, 1, 1, 3, 1, 1]


def test_ann_pool_with_empty_ivf_lists(tmp_path):
    # 2 tight clusters, 8 requested lists -> most lists end up EMPTY
    # (stale centroids never win a point).  The pool must keep list ids
    # paired with the surviving partitions; a positional zip against
    # the unfiltered owned list would mislabel every code after an
    # empty list and silently return wrong neighbors.
    import pyarrow.parquet as pq

    from hadoopsearchengine_ray.pipelines.ann import (
        AnnIndex,
        AnnPool,
        build_ann_index,
    )

    rng = np.random.default_rng(11)
    m = rng.standard_normal((240, 16))
    src = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(m)), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float32())),
    }), src)
    idx_dir = str(tmp_path / "annidx")
    build_ann_index(src, idx_dir, num_lists=8, m=4, ksub=8, dim=16)
    # make list 1 EMPTY on disk (how an empty IVF list manifests: no
    # codes/list_id=1 directory) — both serving paths must then agree
    import os
    import shutil
    gone = os.path.join(idx_dir, "codes", "list_id=1")
    assert os.path.isdir(gone)
    shutil.rmtree(gone)

    q = m[[0, 13]]
    pool = AnnPool(idx_dir, num_owners=2)
    try:
        # nprobe=2 is the discriminating case: only the probed lists'
        # labels are scanned, so a shifted label means the probe of a
        # real list finds nothing (nprobe=8 would be healed by the
        # exact rerank over the full candidate union)
        for nprobe in (2, 8):
            base = AnnIndex(idx_dir).query(q, k=5, nprobe=nprobe, rerank=8)
            got = pool.query(q, k=5, nprobe=nprobe, rerank=8)
            for qi in range(len(q)):
                assert list(got[got.qid == qi].sort_values("rank").vec_id) \
                    == list(base[base.qid == qi].sort_values("rank").vec_id), \
                    f"nprobe={nprobe} qid={qi}"
    finally:
        pool.shutdown()


def test_cube_aggregate_all_subsets():
    ds = rd.from_arrow(pa.table({
        "a": pa.array(["x", "x", "y", "y"], pa.string()),
        "b": pa.array(["p", "q", "p", "p"], pa.string()),
        "v": pa.array([1, 2, 3, 4], pa.int64()),
    }))
    out = rel.cube_aggregate(ds, ["a", "b"], "v", alias="t").to_pandas()
    rows = {(r.a, r.b): r.t for r in out.itertuples()}
    # rollup levels PLUS the (None, b) slice rollup never produces
    assert rows == {("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 7,
                    ("x", None): 3, ("y", None): 7,
                    (None, "p"): 8, (None, "q"): 2, (None, None): 10}
    assert len(out) == 8


def test_ntile_fill_rule_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(7)
    n = 997
    df = pd.DataFrame({
        "k": rng.integers(0, 13, size=n),
        "o": rng.permutation(n),     # unique ordering per key
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (rel.ntile_per_key(ds, "k", ["o"], 4, descending=False,
                             alias="tile")
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    want = duckdb.sql("""
        SELECT k, o, CAST(ntile(4) OVER (PARTITION BY k ORDER BY o)
                          AS BIGINT) AS tile
        FROM df ORDER BY k, o
    """).fetchdf()
    pd.testing.assert_frame_equal(
        got[["k", "o", "tile"]], want[["k", "o", "tile"]],
        check_dtype=False)


def test_ntile_rejects_ties():
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "o": pa.array([5, 5], pa.int64()),
    }))
    with pytest.raises(Exception, match="tie|duplicate"):
        rel.ntile_per_key(ds, "k", ["o"], 2).materialize()


def test_ntile_more_tiles_than_rows():
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "o": pa.array([30, 10, 20], pa.int64()),
    }))
    out = (rel.ntile_per_key(ds, "k", ["o"], 10).to_pandas()
           .sort_values("o"))
    # n < tiles: each row its own bucket, in order
    assert out["tile"].tolist() == [1, 2, 3]


def test_corr_regr_matches_duckdb_and_degenerates():
    import duckdb

    rng = np.random.default_rng(11)
    xs = rng.normal(10, 3, size=5000)
    df = pd.DataFrame({
        "k": np.repeat(["a", "b"], 2500),
        "x": xs,
        "y": 3.0 * xs + rng.normal(0, 2, size=5000),
    })
    # degenerate keys: single row, zero x-variance
    extra = pd.DataFrame({"k": ["solo", "flat", "flat"],
                          "x": [1.0, 2.0, 2.0], "y": [5.0, 1.0, 9.0]})
    fdf = pd.concat([df, extra], ignore_index=True)
    ds = rd.from_arrow(pa.Table.from_pandas(fdf, preserve_index=False))
    got = (rel.corr_regr_per_key(ds, "k", "x", "y").to_pandas()
           .set_index("k"))
    want = duckdb.sql("""
        SELECT k, CAST(count(*) AS BIGINT) AS n,
               round(corr(y, x), 6) AS "corr",
               round(regr_slope(y, x), 6) AS slope,
               round(regr_intercept(y, x), 6) AS intercept
        FROM fdf GROUP BY k
    """).fetchdf().set_index("k")
    for k in ["a", "b"]:
        for c in ["n", "corr", "slope", "intercept"]:
            assert got.loc[k, c] == pytest.approx(want.loc[k, c],
                                                  abs=2e-6), (k, c)
    # SQL NULL semantics on the degenerate keys (duckdb agrees)
    for k in ["solo", "flat"]:
        assert np.isnan(got.loc[k, "corr"])
        assert np.isnan(got.loc[k, "slope"])
        assert np.isnan(want.loc[k, "slope"])


def test_pivot_counts_drops_null_pivot_values():
    ds = rd.from_arrow(pa.table({
        "u": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "t": pa.array(["a", "b", "a", None, "a"], pa.string()),
    }))
    out = (rel.pivot_counts(ds, "u", "t").to_pandas()
           .sort_values("u").reset_index(drop=True))
    assert list(out.columns) == ["u", "n_a", "n_b"]
    assert out.loc[0].tolist() == [1, 1, 1]
    assert out.loc[1].tolist() == [2, 2, 0]   # the NULL never counted


def test_pivot_counts_rejects_wide_schema():
    ds = rd.from_arrow(pa.table({
        "u": pa.array(range(50), pa.int64()),
        "t": pa.array([f"v{i}" for i in range(50)], pa.string()),
    }))
    with pytest.raises(ValueError, match="distinct"):
        rel.pivot_counts(ds, "u", "t", max_pivot_values=10)


def test_bigram_logprob_hand_computed():
    from hadoopsearchengine_ray.functions.trainprep import bigram_logprob

    # corpus bigrams: "aa bb" x2 (docs 0,1), "bb aa" x1, "aa cc" x1
    # heads: aa -> 3, bb -> 1
    ds = _doc_ds(["aa bb aa cc", "aa bb", "zz"])
    out = bigram_logprob(ds).to_pandas().set_index("doc_id")
    lp_aabb = np.log(2 / 3)
    lp_bbaa = np.log(1 / 1)
    lp_aacc = np.log(1 / 3)
    assert out.loc[0, "n_pairs"] == 3
    assert out.loc[0, "logprob"] == pytest.approx(
        round((lp_aabb + lp_bbaa + lp_aacc) / 3, 6), abs=1e-9)
    assert out.loc[1, "n_pairs"] == 1
    assert out.loc[1, "logprob"] == pytest.approx(round(lp_aabb, 6))
    # single-token doc: no pairs, logprob pinned to 0.0
    assert out.loc[2, "n_pairs"] == 0
    assert out.loc[2, "logprob"] == 0.0


def test_bigram_logprob_join_path_matches_broadcast():
    from hadoopsearchengine_ray.functions.trainprep import bigram_logprob

    texts = ["merge sort hash join scan filter",
             "hash join merge sort",
             "scan filter scan filter scan",
             "solo"]
    ds = _doc_ds(texts)
    small = bigram_logprob(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    forced = bigram_logprob(_doc_ds(texts), broadcast_limit=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(small, forced)
