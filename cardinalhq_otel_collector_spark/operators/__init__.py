"""Operator library — one module per operator family of SURVEY.md §2.

Every operator is a pure ``DataFrame -> DataFrame`` function built from
native ``pyspark.sql.functions`` expressions (whole-stage codegen); the
only pandas-UDF paths are the ones the built-ins genuinely can't express
(minhash signatures over *distinct* templates, multimodal decode stubs),
and those run Arrow-vectorized, never per-row.
"""
