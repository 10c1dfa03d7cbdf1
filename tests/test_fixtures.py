"""Committed-fixture drift guards: the parquet files under fixtures/ must
stay value-equal to the deterministic generator, and the unrolled DuckDB
clustering oracle must be converged at its round bound."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cardinalhq_otel_collector_spark.sources.fixtures import (
    NEARDUP_FIXTURE,
    TRANSCRIPTS_FIXTURE,
    neardup_fixture_df,
    transcripts_fixture_df,
)


def _df_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_transcripts_fixture_matches_generator(spark):
    committed = spark.read.parquet(TRANSCRIPTS_FIXTURE)
    generated = transcripts_fixture_df(spark)
    assert committed.columns == generated.columns
    # timestamp_ntz (file) vs timestamp (generator): compare as naive values
    assert _df_rows(committed) == _df_rows(
        generated.withColumn("ts", generated.ts.cast("timestamp_ntz"))
    )


def test_neardup_fixture_matches_generator(spark):
    committed = spark.read.parquet(NEARDUP_FIXTURE)
    generated = neardup_fixture_df(spark)
    assert _df_rows(committed) == _df_rows(
        generated.withColumn("ts", generated.ts.cast("timestamp_ntz"))
    )


def test_clusters_oracle_converged():
    """The unrolled label propagation must be at fixpoint: one more round
    changes nothing (otherwise the round bound silently truncates a
    component and the 'oracle' is wrong, not the operator)."""
    con = duckdb.connect()
    a = sorted(con.execute(entrymod._lib_clusters_duck(n_rounds=7)).fetchall())
    b = sorted(con.execute(entrymod._lib_clusters_duck(n_rounds=8)).fetchall())
    assert a == b


def test_neardup_fixture_exercises_merging():
    """The crafted near-dup turns must land in EXISTING components — at
    least one cluster with >1 template, or the fixture only ever tests
    singleton components."""
    con = duckdb.connect()
    rows = con.execute(entrymod._lib_clusters_duck()).fetchall()
    assert any(r[1] > 1 for r in rows), rows
