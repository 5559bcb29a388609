"""bugzilla_etl_spark — a from-scratch PySpark-native fulltext engine.

Re-imagines mozilla-metrics/bugzilla_etl's history->snapshot->Elasticsearch
pipeline (see /root/reference, SURVEY.md) as a pure-Spark inverted-index
build + BM25 top-k query engine over a source-code corpus
``(repo, path, commit, lang, content)``.

Layout:
- ``session``    SparkSession factory tuned for local[N] testing.
- ``corpus``     deterministic synthetic corpus generator (FIXTURES.md F1).
- ``tokenize``   the shared analyzer (build + query + oracle use the same one),
                 mirroring the reference's ES analyzer chain
                 (configuration/es/bug_version.json:4-35).
- ``codec``      delta-gap + varint posting-list codecs (numpy vectorized).
- ``oracle``     pure-Python exhaustive BM25 scorer (golden-diff discipline,
                 parse_bug_history.js:444-445 stabilize()).
- ``index``      build / query / merge / manifest for the inverted index.
- ``operators``  relational + training-data-pipeline operators (SURVEY §2).
- ``sources``    readers for the driver parquet tables and corpus tables.
- ``functions``  scalar function surface (SURVEY §2.8).
- ``plans``      job orchestration: checkpointed builds, watermarks (§3.2).
- ``streaming``  structured-streaming incremental indexing demo.
"""

__version__ = "0.1.0"
