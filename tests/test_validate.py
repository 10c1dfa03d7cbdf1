"""Transcript integrity: each defect class detected independently,
clean conversations flagged clean."""

from __future__ import annotations

import datetime as dt

from cardinalhq_otel_collector_spark.operators.validate import (
    transcript_integrity,
)


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_defect_classes_counted_independently(spark):
    rows = [
        # conv "ok": clean alternation, dense idx, increasing ts
        ("ok", 0, "user", _ts(0)),
        ("ok", 1, "assistant", _ts(1)),
        ("ok", 2, "user", _ts(2)),
        # conv "gap": turn_idx jumps 0 -> 2 (one break)
        ("gap", 0, "user", _ts(0)),
        ("gap", 2, "assistant", _ts(1)),
        # conv "dup": duplicate idx 1 (positions 1,2 -> one break)
        ("dup", 0, "user", _ts(0)),
        ("dup", 1, "assistant", _ts(1)),
        ("dup", 1, "user", _ts(2)),
        # conv "rep": same role twice in a row
        ("rep", 0, "user", _ts(0)),
        ("rep", 1, "user", _ts(1)),
        # conv "clk": ts goes backwards at idx 1
        ("clk", 0, "user", _ts(5)),
        ("clk", 1, "assistant", _ts(3)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    got = {
        r.conv_id: (
            r.n_turns, r.n_idx_breaks, r.n_role_repeats,
            r.n_ts_regressions, r.is_clean,
        )
        for r in transcript_integrity(df).collect()
    }
    assert got["ok"] == (3, 0, 0, 0, True)
    assert got["gap"] == (2, 1, 0, 0, False)
    # idx (0,1,1) vs pos (0,1,2): exactly the duplicated turn mismatches
    assert got["dup"] == (3, 1, 0, 0, False)
    assert got["rep"] == (2, 0, 1, 0, False)
    assert got["clk"] == (2, 0, 0, 1, False)
