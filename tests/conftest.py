import shutil

import numpy as np
import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


T1_DOCS = 600


def doc_id_table(lo, hi):
    """Deterministic (doc_id, text) table over the generator corpus —
    the shared shape for delta / NRT-serving tests (explicit ids)."""
    import pyarrow as pa

    from hadoopsearchengine_ray import corpus

    tbl = corpus.gen_rows(np.arange(lo, hi))
    return pa.table({
        "doc_id": pa.array(range(lo, hi), pa.int64()),
        "text": tbl["content"],
    })


@pytest.fixture(scope="session")
def t1_corpus_dir(tmp_path_factory, ray_session):
    from hadoopsearchengine_ray import corpus

    d = tmp_path_factory.mktemp("t1") / "corpus"
    corpus.write_corpus(str(d), T1_DOCS)
    return str(d)


@pytest.fixture(scope="session")
def t1_index_dir(tmp_path_factory, t1_corpus_dir):
    from hadoopsearchengine_ray.pipelines.build_index import build_index

    d = tmp_path_factory.mktemp("t1idx") / "index"
    build_index(t1_corpus_dir, str(d), hot_df_frac=0.25)
    return str(d)


@pytest.fixture(scope="session")
def t1_oracle():
    from hadoopsearchengine_ray import corpus, oracle

    tbl = corpus.gen_rows(np.arange(T1_DOCS))
    return oracle.OracleIndex(
        [(i, tbl["content"][i].as_py()) for i in range(T1_DOCS)]
    ), tbl
