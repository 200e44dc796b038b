"""etlbox_spark — a from-scratch, PySpark-native CDC / incremental-ingest
engine with the query and data-processing capabilities of HaSaM-cz/etlbox
(see SURVEY.md), re-imagined Spark-first.

Subpackages:
    engine     — lake table (Iceberg-semantics), binlog generator, merge-apply
                 core, checkpointing, epoch runner.
    operators  — the reference's dataflow operator surface (RowTransformation,
                 Lookup, Aggregation, Multicast, ...) as DataFrame combinators,
                 plus large-scale training-data ops (dedup, similarity, text).
    functions  — scalar-function helpers (key hashing, salting, buckets).
    sources    — source/sink helpers (csv/json/parquet/memory/custom).
    streaming  — Structured Streaming tail (availableNow + foreachBatch).
    plans      — plan-inspection helpers used by tests to assert pushdown /
                 broadcast / codegen properties.
"""

__version__ = "0.1.0"
