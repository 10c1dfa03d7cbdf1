"""PySpark-native log/telemetry pipeline with the capabilities of the
CardinalHQ OTel collector (cardinalhq/cardinalhq-otel-collector).

A from-scratch Spark-first engine — NOT a port. The reference is a Go
dataflow engine (receivers → processors → exporters over pdata batches);
this package re-expresses every capability as declarative DataFrame
stages over a table of multi-turn agent transcripts
(conv_id, turn_idx, role, text, tool, ts), letting Catalyst pick the
physical plan. See SURVEY.md for the operator-by-operator mapping.

Layout
------
- ``session``    : SparkSession builder tuned for the pipeline
- ``config``     : declarative pipeline config + validation (EP1 analogue)
- ``datagen``    : deterministic synthetic transcript/lookup generators
- ``sources``    : table catalog (Iceberg when available, parquet fallback)
- ``operators``  : one module per operator family (SURVEY.md §2)
- ``functions``  : scalar-function surface (§2B scalar table)
- ``plans``      : pipeline composition + lineage/idempotent resume
- ``streaming``  : Structured Streaming variants
"""

__version__ = "0.1.0"
