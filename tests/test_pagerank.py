"""PulseRank vs the single-process oracle (20 cycles, net-score
normalization) on the preferential-attachment link fixture."""

import numpy as np
import ray.data as rd

from hadoopsearchengine_ray import corpus, oracle
from hadoopsearchengine_ray.pipelines.pagerank import pagerank

N = 500


def test_pagerank_matches_oracle():
    links = corpus.links_table(N)
    gold = oracle.pagerank_oracle(
        links["src"].to_numpy(),
        links["dst"].to_numpy(),
        links["weight"].to_numpy(),
        N,
    )
    got = pagerank(rd.from_arrow(links), N)
    assert np.allclose(got, gold, atol=1e-6)
    # hub fixture: low ids receive quadratic-skew mass
    assert gold[:50].mean() > gold[-50:].mean()


def test_pagerank_zero_cycles_identity():
    links = corpus.links_table(50)
    got = pagerank(rd.from_arrow(links), 50, cycles=0)
    assert np.array_equal(got, np.ones(50))
