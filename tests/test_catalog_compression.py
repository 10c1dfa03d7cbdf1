"""A13 — per-write compression choice + config whitelist
(awss3exporter/internal/upload/writer.go:157-191, config.go:148-153)."""

from __future__ import annotations

import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cardinalhq_otel_collector_spark.sources.catalog import (
    Catalog,
    validate_compression,
)


def _codecs_used(table_dir: str) -> set[str]:
    import pyarrow.parquet as pq

    codecs: set[str] = set()
    for f in glob.glob(os.path.join(table_dir, "**", "*.parquet"), recursive=True):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            codecs.add(md.row_group(rg).column(0).compression.lower())
    return codecs


@pytest.mark.parametrize("codec,expected", [("gzip", "gzip"), ("zstd", "zstd"), ("none", "uncompressed")])
def test_per_write_codec_applied_and_readable(spark, tmp_path, codec, expected):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(100).withColumnRenamed("id", "v")
    cat.write(df, f"t_{codec}", compression=codec)
    assert _codecs_used(cat.path(f"t_{codec}")) == {expected}
    assert cat.read(f"t_{codec}").count() == 100


def test_default_inherits_session_codec(spark, tmp_path):
    """No per-write choice → the session default (zstd, session.py)."""
    cat = Catalog(spark, str(tmp_path))
    cat.write(spark.range(10), "t")
    assert _codecs_used(cat.path("t")) == {"zstd"}


def test_unknown_compression_rejected_before_job():
    """config.go:150 'unknown compression type' — config-time failure, no
    Spark job runs (no session needed to hit it)."""
    with pytest.raises(ValueError, match="unknown compression type"):
        validate_compression("brotli")
    assert validate_compression(None) is None
    assert validate_compression("NONE") == "uncompressed"
