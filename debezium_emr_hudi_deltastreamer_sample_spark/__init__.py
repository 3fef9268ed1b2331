"""PySpark-native analytics engine with the capabilities of the reference
CDC pipeline (wernerbihl/debezium-emr-hudi-deltastreamer-sample).

The reference assembles Debezium + Kafka + Spark + Hudi into a CDC ingestion
pipeline (see /root/reference/README.md). This package consolidates those
capabilities into one idiomatic PySpark engine:

- ``session``    — SparkSession factory (reference session configs,
                   README.md:175, 281-286, minus Hudi-specific dead code).
- ``catalog``    — named-table registration over parquet fixtures
                   (the Hive/Glue-sync capability, README.md:298-304).
- ``envelope``   — the Debezium change-event envelope schema and parser
                   (README.md:179-185, 320-326).
- ``operators``  — merge/upsert/delete/dedup (Hudi DeltaStreamer semantics,
                   README.md:295-313, 348), as-of joins, top-k, LLM-data ops.
- ``streaming``  — Structured Streaming pipelines mirroring script.py /
                   hudi_script.py (README.md:170-204, 277-343) with the
                   reference's per-batch-inference bug fixed.
- ``queries``    — the relational query surface over ingested tables, each
                   paired with a DuckDB oracle for the correctness gate.
"""

__version__ = "0.1.0"

# Curated public API — the import a reference user starts from. Heavy
# submodules (queries, streaming internals) stay lazy behind their own
# import paths.
from .catalog import load_table
from .envelope import parse_envelope, envelope_schema, topic_to_table
from .session import get_spark
from .table import KeyedTable

__all__ = [
    "KeyedTable",
    "envelope_schema",
    "get_spark",
    "load_table",
    "parse_envelope",
    "topic_to_table",
]
