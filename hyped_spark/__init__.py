"""hyped_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimagining of the capability surface of jjbuschhoff/hyped
(reference at /root/reference) as a declarative change-stream-to-lakehouse
pipeline, executed with idiomatic Spark (DataFrame / SQL / Catalyst /
Structured Streaming).

Layout
------
- ``session``    : SparkSession factory tuned for the engine (AQE, Arrow, UTC).
- ``sources``    : deterministic synthetic pages / binlog generators, readers.
- ``functions``  : vectorized (Arrow / pandas-UDF) column functions — HTML→text
                   extraction, language id, quality scoring, hashing/sketches.
- ``operators``  : DataFrame→DataFrame stages — LWW window-rank dedup,
                   exact/MinHash/SimHash near-dup, similarity search,
                   restructuring (format/flatten/filter), chunking, statistics.
- ``lake``       : snapshot-log lakehouse table (bucketed copy-on-write merge,
                   schema evolution, idempotent commits). Swappable for real
                   Iceberg ``MERGE INTO`` when the runtime jar is present.
- ``plans``      : the batch replay engine (LSN-chunked microbatches) and the
                   declarative pipeline spec that compiles to it.
- ``streaming``  : Structured Streaming front-end (foreachBatch applier,
                   checkpoint/resume, lineage metrics).

Reference parity: see SURVEY.md §2 for the operator-by-operator mapping with
file:line citations into /root/reference.
"""

__version__ = "0.1.0"
