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


def test_pagerank_sharded_matches_oracle(ray_session):
    import numpy as np
    import ray.data as rd

    from hadoopsearchengine_ray.corpus import links_table
    from hadoopsearchengine_ray.oracle import pagerank_oracle
    from hadoopsearchengine_ray.pipelines.pagerank import pagerank

    n = 5000
    lt = links_table(n)
    links = rd.from_arrow(lt).repartition(4)
    exp = pagerank_oracle(lt["src"].to_numpy(), lt["dst"].to_numpy(),
                          lt["weight"].to_numpy(), n)
    # force the big-graph path with 5 shards of 1000 nodes: the driver
    # never holds a num_nodes-size array mid-cycle (refs only)
    got = pagerank(links, n, force_grouped=True, shard_span=1000)
    assert np.allclose(got, exp, rtol=1e-8)


def test_wavepass_sharded_matches_dense(ray_session):
    import numpy as np
    import ray.data as rd

    from hadoopsearchengine_ray.corpus import links_table
    from hadoopsearchengine_ray.pipelines.wavepass import (
        wavepass_dist,
        wavepass_dist_sharded,
    )

    n = 3000
    links = rd.from_arrow(links_table(n)).repartition(4)
    dense = wavepass_dist(links, n)
    sharded = wavepass_dist_sharded(links, n, shard_span=700)
    assert np.allclose(sharded, dense, atol=1e-9)
