"""logparser_spark — a PySpark-native parse → enrich → route → aggregate engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference log pipeline (BobrovnikIlya/LogParser —
a Java/Spring/PostgreSQL proxy-log loader) as an idiomatic Spark
DataFrame DAG over tables of pre-tokenized sequences
(``doc_id string, tokens array<int>, n_tok int, source string``).

Layout
------
- ``session``    — tuned SparkSession builders (AQE, Arrow, UTC).
- ``codec``      — the pinned token<->text encoding contract.
- ``fixtures``   — deterministic synthetic input generator (seeded).
- ``oracle``     — single-process pandas oracle for pipeline semantics.
- ``functions``  — parse regexes, scalar classification expressions.
- ``operators``  — enrichment joins, aggregates, top-K, dedup, ANN,
  text-analysis, multimodal plumbing.
- ``sources``    — sequence-table readers and multi-sink writers.
- ``plans``      — the end-to-end pipeline DAG + checkpoint/resume.
- ``streaming``  — Structured Streaming variant of the same DAG.
"""

__version__ = "0.1.0"
