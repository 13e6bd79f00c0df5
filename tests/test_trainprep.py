"""Training-prep operators (functions/trainprep.py) against pure-Python
shadows on discriminative fixtures: newline/dup-line docs, repeated
n-grams, real PII strings, zero-token docs, multi-block packing."""

import collections
import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from hadoopsearchengine_ray.functions import trainprep as tp
from hadoopsearchengine_ray.tokenizer import tokenize_py


def _doc_ds(texts, ids=None, sources=None):
    n = len(texts)
    cols = {
        "doc_id": pa.array(ids if ids is not None else range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    if sources is not None:
        cols["source"] = pa.array(sources, pa.string())
    return rd.from_arrow(pa.table(cols))


REP_TEXTS = [
    "one line only",
    "dup line\ndup line\ndup line\nunique line",          # 3/4 lines dup'd
    "spam spam spam spam spam spam spam spam",            # one hot unigram
    "ab cd ab cd ab cd ab cd ab cd",                      # one hot bigram
    "",                                                   # empty doc
    "a\n\n\nb",                                           # empty lines dropped
]


def test_repetition_stats_shadow():
    out = (tp.repetition_stats(_doc_ds(REP_TEXTS))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, txt in enumerate(REP_TEXTS):
        lines = [l for l in txt.split("\n") if l != ""]
        toks = tokenize_py(txt)
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        row = out.iloc[i]
        assert row["n_lines"] == len(lines)
        assert row["dup_lines"] == len(lines) - len(set(lines))
        assert row["n_tokens"] == len(toks)
        top_uni = max(collections.Counter(toks).values()) if toks else 0
        assert row["top_unigram_cnt"] == top_uni
        top_big = max(collections.Counter(bigrams).values()) if bigrams else 0
        assert row["top_bigram_cnt"] == top_big
        assert row["n_bigrams"] == len(bigrams)
        keep = (10 * row["dup_lines"] <= 3 * row["n_lines"]) and (
            row["n_bigrams"] == 0 or 5 * row["top_bigram_cnt"] <= row["n_bigrams"])
        assert row["keep"] == int(keep)
    # the repetitive docs are dropped (doc 0 too: a 3-token doc can't
    # clear the 20% top-bigram rule — these gates target long docs)
    assert out["keep"].tolist() == [0, 0, 0, 0, 1, 1]


def test_unigram_logprob_shadow():
    texts = ["alpha alpha beta", "beta gamma", "", "alpha beta gamma delta"]
    out = (tp.unigram_logprob(_doc_ds(texts))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    cf = collections.Counter(t for x in texts for t in tokenize_py(x))
    total = sum(cf.values())
    for i, txt in enumerate(texts):
        toks = tokenize_py(txt)
        assert out.iloc[i]["n_tokens"] == len(toks)
        if toks:
            exp = sum(math.log(cf[t] / total) for t in toks) / len(toks)
            assert out.iloc[i]["logprob"] == pytest.approx(exp, abs=1e-6)
        else:
            assert out.iloc[i]["logprob"] == 0.0
    # rarer vocabulary scores lower: doc 1 uses rarer terms than doc 0
    assert out.iloc[1]["logprob"] < out.iloc[0]["logprob"]


def test_unigram_logprob_join_path_matches_broadcast():
    texts = ["alpha alpha beta gamma", "delta epsilon", "alpha delta"]
    a = (tp.unigram_logprob(_doc_ds(texts))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (tp.unigram_logprob(_doc_ds(texts), broadcast_limit=1)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_pii_redact():
    texts = [
        "mail me at alice.smith+dev@sub.example.org or bob@x.co thanks",
        "server at 192.168.0.1 and 10.0.0.255, version 1.2 is not an ip",
        "both: carol@corp.example.com from 172.16.4.20 now",
        "nothing sensitive here",
    ]
    out = (tp.pii_redact(_doc_ds(texts))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_emails"].tolist() == [2, 0, 1, 0]
    assert out["n_ips"].tolist() == [0, 2, 1, 0]
    assert out.iloc[0]["text"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert out.iloc[1]["text"] == \
        "server at <IP> and <IP>, version 1.2 is not an ip"
    assert out.iloc[2]["text"] == "both: <EMAIL> from <IP> now"
    assert out.iloc[3]["text"] == "nothing sensitive here"


def test_contamination_shadow():
    # test-source doc 0 is a verbatim copy of train doc 2 (fully
    # contaminated); test doc 1 shares nothing; test doc 3 is too short
    # for any 3-gram shingle
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "totally novel held out content words here",
        "alpha beta gamma delta epsilon zeta",
        "tiny doc",
        "unrelated training corpus text goes on and on",
    ]
    sources = ["test", "test", "train", "test", "train"]
    out = (tp.contamination_table(_doc_ds(texts, sources=sources),
                                  test_source="test", n=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1, 3]

    def shingles(txt):
        t = tokenize_py(txt)
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    train_set = shingles(texts[2]) | shingles(texts[4])
    for _, row in out.iterrows():
        sh = shingles(texts[int(row["doc_id"])])
        assert row["n_shingles"] == len(sh)
        assert row["n_overlap"] == len(sh & train_set)
    assert out["contaminated"].tolist() == [1, 0, 0]


def test_pack_sequences_spans():
    # 7 docs x 5 tokens, seq_len=8: spans must tile the token stream
    texts = ["tok%d aa bb cc dd" % i for i in range(7)]
    out = (tp.pack_sequences(_doc_ds(texts), seq_len=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [5] * 7
    assert out["start_tok"].tolist() == [5 * i for i in range(7)]
    assert out["seq_first"].tolist() == [(5 * i) // 8 for i in range(7)]
    assert out["seq_last"].tolist() == [(5 * i + 4) // 8 for i in range(7)]


def test_prepare_corpus_composed():
    # clean gate + exact dedup keep-first + packing, shadow-computed:
    # docs 0/1 identical (dedup keeps 0), doc 2 too short (gated out),
    # docs 3..6 pass
    base = " ".join(f"word{i} item{i} value{i}" for i in range(8))  # 24 toks
    texts = [base, base, "too short",
             *(base + f" tail{j} extra{j}" for j in range(4))]
    out = (tp.prepare_corpus(_doc_ds(texts), seq_len=16,
                             min_tokens=10, max_tokens=100,
                             min_distinct_ratio=0.1,
                             min_mean_len=2.0, max_mean_len=12.0)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    kept = [0, 3, 4, 5, 6]
    assert out["doc_id"].tolist() == kept
    n = [len(tokenize_py(texts[i])) for i in kept]
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    assert out["n_tokens"].tolist() == n
    assert out["start_tok"].tolist() == starts.tolist()
    assert out["seq_first"].tolist() == [s // 16 for s in starts]
    assert out["seq_last"].tolist() == \
        [(s + c - 1) // 16 for s, c in zip(starts, n)]


def test_pack_sequences_multiblock_and_empty():
    # many blocks + zero-token docs: offsets must still be one global
    # prefix sum in doc_id order
    rng = np.random.default_rng(7)
    texts = []
    for i in range(200):
        k = int(rng.integers(0, 6))
        texts.append(" ".join(f"w{i}x{j}" for j in range(k)))
    ds = _doc_ds(texts).repartition(13)
    out = (tp.pack_sequences(ds, seq_len=16)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    n = [len(tokenize_py(t)) for t in texts]
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    assert out["n_tokens"].tolist() == n
    assert out["start_tok"].tolist() == starts.tolist()
    last = [(s + max(c, 1) - 1) // 16 if c else s // 16
            for s, c in zip(starts, n)]
    assert out["seq_last"].tolist() == last


def test_domain_mix_deterministic_rates():
    # id-keyed md5 coin: exact shadow via the shared parity hash, and
    # 0-weight / absent domains drop every row
    from hadoopsearchengine_ray._tokflat import md5_low64

    n = 400
    texts = ["x"] * n
    sources = [f"d{i % 4}" for i in range(n)]
    w = {"d0": 1.0, "d1": 0.5, "d2": 0.0}          # d3 absent
    out = (tp.domain_mix(_doc_ds(texts, sources=sources), w)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    expect = [(i, s) for i, s in enumerate(sources)
              if md5_low64(str(i)) % 1_000_000
              < round(w.get(s, 0.0) * 1_000_000)]
    assert list(zip(out["doc_id"], out["source"])) == expect
    kept = out["source"].value_counts()
    assert kept.get("d0", 0) == n // 4             # rate 1.0 keeps all
    assert kept.get("d2", 0) == 0 and kept.get("d3", 0) == 0
    # rate 0.5 keeps roughly half (binomial; wide bounds, deterministic)
    assert 25 <= kept.get("d1", 0) <= 75
    # re-run is identical (pure function of ids)
    out2 = (tp.domain_mix(_doc_ds(texts, sources=sources), w)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.equals(out2)


def test_ppl_bucket_filter_band():
    # 18 mid docs, one all-rare doc (lowest logprob), one
    # all-common-term doc (highest); the p10/p90 order-statistic band
    # lands on the mid value and drops exactly the two extremes
    texts = ["common word here"] * 18 + ["zzqq zzxx", "common common"]
    lp = (tp.unigram_logprob(_doc_ds(texts))
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    out = (tp.ppl_bucket_filter(_doc_ds(texts))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # shadow: quantile_disc cuts at ceil(q*n)-1 over sorted logprobs
    vals = np.sort(lp["logprob"].to_numpy())
    n = len(vals)
    c_lo = vals[max(0, math.ceil(0.1 * n) - 1)]
    c_hi = vals[max(0, math.ceil(0.9 * n) - 1)]
    keep = lp[(lp["logprob"] >= c_lo) & (lp["logprob"] <= c_hi)]
    assert out["doc_id"].tolist() == keep["doc_id"].tolist()
    assert out["logprob"].tolist() == keep["logprob"].tolist()
    assert 0 < len(out) < len(texts)               # band actually cuts


def test_packed_shards_content_hashes():
    # docs that straddle sequence boundaries (seq_len=8): the global
    # stream must cut mid-doc and the md5 of each sequence must equal
    # the shadow's; token-less docs contribute nothing
    import hashlib

    texts = ["alpha beta gamma delta epsilon",        # 5 toks
             "",                                      # 0
             "zeta eta theta iota kappa lam mu nu",   # 8 -> crosses
             "omicron pi rho",                        # 3
             "sigma tau upsilon phi chi psi omega"]   # 7
    ds = _doc_ds(texts)
    out = (tp.packed_shards(ds, seq_len=8)
           .to_pandas().sort_values("seq_id").reset_index(drop=True))
    stream = [t for txt in texts for t in tokenize_py(txt)]
    exp = []
    for s in range(0, len(stream), 8):
        seq = stream[s:s + 8]
        exp.append((s // 8, len(seq),
                    hashlib.md5(" ".join(seq).encode()).hexdigest()))
    assert list(zip(out["seq_id"], out["n_tokens"], out["h"])) == exp
    # boundary really crossed: >1 sequence and the last is a remainder
    assert len(exp) > 1 and exp[-1][1] < 8


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcdefgh", min_size=2, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_doc, min_size=1, max_size=25),
       seq_len=st.sampled_from([4, 8, 16]))
def test_packed_shards_property(texts, seq_len):
    # any corpus, any seq_len: sequences tile the global token stream
    # exactly and each one's md5 matches the pure-Python shadow
    import hashlib

    out = tp.packed_shards(_doc_ds(texts), seq_len=seq_len).to_pandas()
    stream = [t for txt in texts for t in tokenize_py(txt)]
    exp = [(s // seq_len, len(stream[s:s + seq_len]),
            hashlib.md5(" ".join(stream[s:s + seq_len]).encode()).hexdigest())
           for s in range(0, len(stream), seq_len)]
    if out.empty:
        # Ray's to_pandas drops columns on a zero-row dataset; the
        # Dataset schema itself stays typed (operator guard)
        assert exp == []
        return
    out = out.sort_values("seq_id").reset_index(drop=True)
    assert list(zip(out["seq_id"], out["n_tokens"], out["h"])) == exp
