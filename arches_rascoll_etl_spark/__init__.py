"""arches_rascoll_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch generalization of the ideas in the reference ETL
(``opencontext/arches-rascoll-etl``): config-driven record transformation,
idempotent upsert, provenance identity, checkpoint/resume — re-expressed as a
binlog/WAL-tail → lake-upsert pipeline built on the PySpark DataFrame API.

Reference semantics generalized (see SURVEY.md for the full mapping):
  * last-writer-wins per-key collapse   -> operators.lww
    (reference: arches_rascoll/ref_collection.py:95-97,142 dict overwrite)
  * idempotent INSERT ... WHERE NOT IN  -> lake.parquet_snapshot MERGE
    (reference: arches_rascoll/ref_collection.py:305-314)
  * checkpoint/reload of staging CSVs   -> streaming.checkpoint manifest
    (reference: arches_rascoll/ref_collection.py:227-234)
  * uuid4 provenance minting            -> functions.hashing deterministic ids
    (reference: arches_rascoll/ref_collection.py:138,167)
  * mapping-config DSL driving row loop -> plans.mapping compiled to Columns
    (reference: arches_rascoll/general_configs.py:98-943)

Nothing in this package is a translation of reference code; it is a new
engine that reproduces the reference's *semantics* on Spark.
"""

__version__ = "0.1.0"
