"""hadoopsearchengine_ray — a Ray-Data-native full-text index + BM25 engine.

A from-scratch rebuild of the capabilities of
andrewstevens59/HadoopSearchEngine (reference at /root/reference, C++03
MapReduce-style engine) on top of ``ray.data.Dataset`` pipelines:

- tokenize source files via ``map_batches`` over zero-copy Arrow,
- build a (term, df, cf) dictionary via grouped aggregation,
- construct per-partition sorted posting lists with term-frequency
  payloads, delta-gap + varint compressed (the Arrow-native analog of the
  reference's LEB128 varints + zlib block files,
  ``DataStructure.h:2639-2759``),
- handle high-df skewed terms via salted-key repartitioning,
- serve BM25 top-k queries through stateful actor-pool scorers with
  block-max pruning (the idiomatic version of the reference's doc-range
  bisection pruning, ``DyableRequest/SearchHitItems/SearchHitItems.h:210-254``),
- PageRank ("PulseRank", ``DyableWebGraph/DyablePuleRank``) over a link
  table, and
- a library of relational / dedup / similarity / text-analysis operators
  mirroring the reference's MapReduce primitives (``ProcessSet.h:792-1117``).

No code is copied from the reference; citations are for parity checking.
"""

__version__ = "0.1.0"
