"""Property-based invariants for the round-5 operators (hypothesis):
instead of more goldens, pin the ALGEBRAIC guarantees — the claims the
docstrings make must hold on arbitrary inputs, not just the examples.

Spark sessions are expensive per example, so each property runs a
small number of drawn cases through ONE collected batch (deadline
disabled; the session fixture is shared)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk_intervals(spark, rows):
    return spark.createDataFrame(
        [(i, k, s, s + d) for i, (k, s, d) in enumerate(rows)],
        "event_id long, k long, start_us long, end_us long",
    )


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),          # key
            st.integers(0, 1000),       # start
            st.integers(0, 200),        # duration
        ),
        min_size=1,
        max_size=25,
    )
)
def test_merge_intervals_is_a_set_union(spark, rows):
    """covered == |union of input intervals| per key, and islands never
    overlap: the operator is exactly interval-set union."""
    from cardinalhq_otel_collector_spark.operators.spans import merge_intervals

    df = _mk_intervals(spark, rows)
    got = merge_intervals(df, ["k"], "start_us", "end_us", "event_id").collect()
    # reference: brute-force point union per key (ranges are small ints)
    per_key_points: dict[int, set[int]] = {}
    for k, s, d in rows:
        per_key_points.setdefault(k, set()).update(range(s, s + d))
    for k, pts in per_key_points.items():
        covered = sum(r.covered for r in got if r.k == k)
        assert covered == len(pts)
    # islands are disjoint and ordered per key (touching merged away)
    by_key: dict[int, list] = {}
    for r in got:
        by_key.setdefault(r.k, []).append((r.span_start, r.span_end))
    for spans in by_key.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1  # strict gap — touching would have merged


@settings(**_SETTINGS)
@given(
    tokens=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=6),
        min_size=2,
        max_size=8,
    ),
    tau=st.sampled_from([(1, 2), (2, 3), (9, 10)]),
)
def test_prefix_jaccard_equals_naive(spark, tokens, tau):
    """The prefix filter admits EVERY qualifying pair (no false
    negatives) and the verify step removes every non-qualifying one —
    i.e. output == brute force, for arbitrary token multisets."""
    from cardinalhq_otel_collector_spark.operators.dedup import prefix_jaccard_pairs

    num, den = tau
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(tokens)],
        "doc_id long, text string",
    )
    got = {
        (r.a, r.b, r.inter_size, r.union_size)
        for r in prefix_jaccard_pairs(docs, tau_num=num, tau_den=den).collect()
    }
    sets = {i: set(ws) for i, ws in enumerate(tokens)}
    want = set()
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if den * inter >= num * union:
                    want.add((a, b, inter, union))
    assert got == want


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=30),
    k=st.sampled_from([2, 3]),
    width=st.sampled_from([4, 64]),
)
def test_cms_never_undercounts(spark, vals, k, width):
    from cardinalhq_otel_collector_spark.operators.cms import cms_counts

    df = spark.createDataFrame([(v,) for v in vals], "k string")
    got = {r.k: r.est_n for r in cms_counts(df, "k", depth=k, width=width).collect()}
    from collections import Counter

    true = Counter(vals)
    assert set(got) == set(true)
    for key, n in true.items():
        assert got[key] >= n


@settings(**_SETTINGS)
@given(
    toks=st.lists(st.integers(1, 120), min_size=1, max_size=15),
    budget=st.integers(1, 400),
)
def test_trim_budget_is_maximal_fitting_suffix(spark, toks, budget):
    """Kept turns are exactly the longest suffix whose total <= budget."""
    from cardinalhq_otel_collector_spark.operators.context import trim_to_budget

    df = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate(toks)],
        "conv_id long, turn_idx long, token_n long",
    )
    got = sorted(
        r.turn_idx
        for r in trim_to_budget(df, "conv_id", "turn_idx", "token_n", budget).collect()
    )
    total, start = 0, len(toks)
    for i in range(len(toks) - 1, -1, -1):
        if total + toks[i] > budget:
            break
        total += toks[i]
        start = i
    assert got == list(range(start, len(toks)))


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.floats(0, 1000, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=20,
    )
)
def test_changes_only_locf_replay_roundtrip(spark, vals):
    """Replaying the kept rows with LOCF reproduces every observation's
    floored value — the compression is lossless at floor resolution."""
    from cardinalhq_otel_collector_spark.operators.resample import changes_only

    rows = [
        (i, 1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    kept = sorted(
        (r.event_id, r.value_floor)
        for r in changes_only(df, ["user_id"], "ts", "value", "event_id").collect()
    )
    # LOCF replay over the original timeline
    replay, ki = [], 0
    cur = None
    for i, v in enumerate(vals):
        while ki < len(kept) and kept[ki][0] <= i:
            cur = kept[ki][1]
            ki += 1
        replay.append(cur)
    import math

    assert replay == [int(math.floor(v)) for v in vals]


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    k=st.sampled_from([4, 16, 64]),
)
def test_kmv_exact_below_k_for_arbitrary_sets(spark, vals, k):
    """Whenever the true distinct count is below k the sketch is EXACT
    (it saw every hash) — the claim the scale path's correctness rests
    on."""
    from cardinalhq_otel_collector_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("g", str(v)) for v in vals], "g string, v string"
    )
    r = kmv_distinct(df, "v", ["g"], k=k).collect()[0]
    if len(vals) < k:
        assert r.est_distinct == len(vals) and r.kth_hash is None
    else:
        assert r.n_kept == k and r.est_distinct > 0


@settings(**_SETTINGS)
@given(
    members=st.sets(st.integers(0, 500), min_size=1, max_size=20),
    probes=st.sets(st.integers(0, 500), min_size=1, max_size=40),
)
def test_bloom_admits_every_true_member(spark, members, probes):
    from cardinalhq_otel_collector_spark.operators.bloomjoin import bloom_semi_filter

    big = spark.createDataFrame([(p,) for p in probes | members], "user_id long")
    small = spark.createDataFrame([(m,) for m in members], "user_id long")
    out = {r.user_id for r in bloom_semi_filter(big, small, "user_id").collect()}
    assert members <= out  # the Bloom guarantee: zero false negatives


@settings(**_SETTINGS)
@given(
    states=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=25)
)
def test_rle_runs_reconstruct_the_sequence(spark, states):
    """run_length_encode is lossless: expanding (state, run_len) in
    run_idx order reproduces the input sequence, and consecutive runs
    never share a state."""
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.sessionize import run_length_encode

    rows = [
        (i, 1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), s)
        for i, s in enumerate(states)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, state string")
    runs = sorted(
        (r.run_idx, r.state, r.run_len)
        for r in run_length_encode(df, ["user_id"], "state", "ts", "event_id").collect()
    )
    rebuilt = [s for _, s, n in runs for _ in range(n)]
    assert rebuilt == states
    assert all(a[1] != b[1] for a, b in zip(runs, runs[1:]))


@settings(**_SETTINGS)
@given(
    n=st.integers(1, 40),
    k=st.sampled_from([2, 4, 7]),
)
def test_ntile_bucket_sizes_ansi(spark, n, k):
    """ANSI NTILE: the first n % k buckets get ceil(n/k) rows, the rest
    floor(n/k) — pinned for arbitrary n, k."""
    from cardinalhq_otel_collector_spark.operators.grouping import ntile_buckets

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(n)], "event_id long, g string, value double"
    )
    rows = ntile_buckets(df, "value", ["g"], k=k, tiebreak_col="event_id").collect()
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    q, rem = divmod(n, k)
    for b, sz in sizes.items():
        assert sz == (q + 1 if b <= rem else q)
