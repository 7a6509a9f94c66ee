"""Event-analytics unit tests — tumbling/sliding windows, sessionization,
as-of pairing, JSON rollup (operators/events.py) over tiny literal worlds."""

from __future__ import annotations

import datetime as dt

from binance_futures_availability_spark.operators import events as ev

T = dt.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_window_counts_tumbling(spark):
    df = _events(
        spark,
        [
            (1, T(2024, 1, 1, 10, 5), 1, "view", 1.25, '{"k": 1}'),
            (2, T(2024, 1, 1, 10, 55), 2, "view", 2.25, '{"k": 2}'),
            (3, T(2024, 1, 1, 11, 0), 1, "view", 4.00, '{"k": 3}'),
            (4, T(2024, 1, 1, 10, 30), 1, "click", 0.50, '{"k": 4}'),
        ],
    )
    got = {
        (r["window_start"], r["event_type"]): r
        for r in ev.window_counts(df).collect()
    }
    k = (T(2024, 1, 1, 10), "view")
    assert got[k]["n_events"] == 2 and got[k]["distinct_users"] == 2
    assert got[k]["total_value"] == 3.5  # exact decimal sum
    assert got[(T(2024, 1, 1, 11), "view")]["n_events"] == 1
    assert got[(T(2024, 1, 1, 10), "click")]["n_events"] == 1


def test_sliding_window_expands_each_event(spark):
    df = _events(spark, [(1, T(2024, 1, 1, 10, 20), 1, "view", 1.0, "{}")])
    got = {r["window_start"]: r["n_events"] for r in ev.sliding_window_counts(df).collect()}
    # 1h window sliding 15min → the event appears in exactly 4 windows
    assert set(got) == {
        T(2024, 1, 1, 9, 30),
        T(2024, 1, 1, 9, 45),
        T(2024, 1, 1, 10, 0),
        T(2024, 1, 1, 10, 15),
    }
    assert all(v == 1 for v in got.values())


def test_sessionize_gap_splits(spark):
    df = _events(
        spark,
        [
            (1, T(2024, 1, 1, 10, 0), 1, "view", 0.0, "{}"),
            (2, T(2024, 1, 1, 10, 20), 1, "view", 0.0, "{}"),   # same session
            (3, T(2024, 1, 1, 11, 0), 1, "view", 0.0, "{}"),    # 40min gap → new
            (4, T(2024, 1, 1, 10, 0), 2, "view", 0.0, "{}"),    # other user
        ],
    )
    got = {
        (r["user_id"], r["session_id"]): r
        for r in ev.sessionize(df, gap_minutes=30).collect()
    }
    assert got[(1, 1)]["n_events"] == 2
    assert got[(1, 1)]["session_start"] == T(2024, 1, 1, 10, 0)
    assert got[(1, 1)]["session_end"] == T(2024, 1, 1, 10, 20)
    assert got[(1, 2)]["n_events"] == 1
    assert got[(2, 1)]["n_events"] == 1
    # exactly-at-gap boundary does NOT split (strict >)
    df2 = _events(
        spark,
        [
            (1, T(2024, 1, 1, 10, 0), 1, "view", 0.0, "{}"),
            (2, T(2024, 1, 1, 10, 30), 1, "view", 0.0, "{}"),
        ],
    )
    assert len(ev.sessionize(df2, gap_minutes=30).collect()) == 1


def test_asof_pairs_latest_preceding_view(spark):
    df = _events(
        spark,
        [
            (1, T(2024, 1, 1, 10, 0), 1, "view", 0.0, "{}"),
            (2, T(2024, 1, 1, 10, 5), 1, "view", 0.0, "{}"),
            (3, T(2024, 1, 1, 10, 10), 1, "click", 0.0, "{}"),  # pairs with 2
            (4, T(2024, 1, 1, 10, 20), 1, "click", 0.0, "{}"),  # still view 2
            (5, T(2024, 1, 1, 9, 0), 2, "click", 0.0, "{}"),    # no prior view
            (6, T(2024, 1, 1, 9, 30), 2, "view", 0.0, "{}"),    # after the click
        ],
    )
    got = {r["event_id"]: r for r in ev.asof_pairs(df).collect()}
    assert set(got) == {3, 4, 5}
    assert got[3]["view_ts"] == T(2024, 1, 1, 10, 5)
    assert got[3]["gap_seconds"] == 300
    assert got[4]["view_ts"] == T(2024, 1, 1, 10, 5)
    assert got[4]["gap_seconds"] == 900
    assert got[5]["view_ts"] is None and got[5]["gap_seconds"] is None


def test_json_prop_rollup(spark):
    df = _events(
        spark,
        [
            (1, T(2024, 1, 1), 1, "view", 0.0, '{"k": 10}'),
            (2, T(2024, 1, 1), 1, "view", 0.0, '{"k": 32}'),
            (3, T(2024, 1, 1), 1, "view", 0.0, '{"other": 5}'),  # missing k
            (4, T(2024, 1, 1), 1, "click", 0.0, '{"k": 7}'),
        ],
    )
    got = {r["event_type"]: r for r in ev.json_prop_rollup(df).collect()}
    assert got["view"]["n_events"] == 3
    assert got["view"]["n_with_prop"] == 2
    assert got["view"]["sum_prop"] == 42
    assert got["click"]["sum_prop"] == 7


def test_funnel_strict_ordering(spark):
    df = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, T(2024, 1, 1, 10, 0), 1, "view", 0.0, "{}"),
            (2, T(2024, 1, 1, 10, 5), 1, "click", 0.0, "{}"),
            (3, T(2024, 1, 1, 10, 9), 1, "purchase", 0.0, "{}"),
            # user 2: purchase BEFORE the click — must not count
            (4, T(2024, 1, 1, 10, 0), 2, "view", 0.0, "{}"),
            (5, T(2024, 1, 1, 10, 2), 2, "purchase", 0.0, "{}"),
            (6, T(2024, 1, 1, 10, 5), 2, "click", 0.0, "{}"),
            # user 3: click with no prior view
            (7, T(2024, 1, 1, 10, 0), 3, "click", 0.0, "{}"),
        ],
    )
    got = {r["user_id"]: r for r in ev.funnel(df).collect()}
    assert got[1]["stage_reached"] == 3
    assert got[1]["purchase_ts"] == T(2024, 1, 1, 10, 9)
    assert got[2]["stage_reached"] == 2  # view + click; early purchase ignored
    assert got[2]["purchase_ts"] is None
    assert got[3]["stage_reached"] == 0
    assert got[3]["view_ts"] is None and got[3]["click_ts"] is None


def test_window_topk_users_ties_to_lowest_id(spark):
    rows = []
    eid = 0
    for u, n in [(5, 3), (1, 2), (2, 2), (3, 1)]:
        for i in range(n):
            rows.append((eid, T(2024, 1, 1, 10, i), u, "view", 0.0, "{}"))
            eid += 1
    got = ev.window_topk_users(_events(spark, rows), k=2).collect()
    assert [(r["user_id"], r["n_events"], r["rnk"]) for r in
            sorted(got, key=lambda r: r["rnk"])] == [(5, 3, 1), (1, 2, 2)]


def test_retention_cohorts_week_offsets(spark):
    df = _events(
        spark,
        [
            # user 1 first active Mon Jan 1 week, returns 2 weeks later
            (1, T(2024, 1, 2, 10, 0), 1, "view", 0.0, "{}"),
            (2, T(2024, 1, 16, 10, 0), 1, "view", 0.0, "{}"),
            # user 2 same cohort, active only week 0
            (3, T(2024, 1, 3, 10, 0), 2, "view", 0.0, "{}"),
        ],
    )
    got = {
        (r["cohort_week"], r["week_offset"]): r["active_users"]
        for r in ev.retention_cohorts(df).collect()
    }
    w0 = dt.date(2024, 1, 1)  # Monday of the first week
    assert got[(w0, 0)] == 2
    assert got[(w0, 2)] == 1
    assert (w0, 1) not in got


def test_robust_value_stats_distinct_guard(spark):
    """The opt-in cardinality guard raises a clear diagnostic when a
    type's distinct micro-value count exceeds the threshold (the
    window-partition-safety contract), and passes under it; default-off
    keeps the gated single-pass plan action-free."""
    import pytest

    rows = [
        (i, T(2024, 1, 1, 10, 0), 1, "hot", i * 0.01, "{}") for i in range(50)
    ] + [(100, T(2024, 1, 1, 10, 0), 1, "cold", 1.0, "{}")]
    df = _events(spark, rows)
    with pytest.raises(ValueError, match="hot.*50 distinct"):
        ev.robust_value_stats(df, distinct_guard=10)
    # generous threshold: same result as the unguarded path
    assert (
        ev.robust_value_stats(df, distinct_guard=1000).count()
        == ev.robust_value_stats(df).count()
    )


def test_spike_detection_integer_zscore(spark):
    # 6 calm days with slight jitter (counts 3,4,3,4,3,4), then a burst
    rows, eid = [], 0
    counts = [3, 4, 3, 4, 3, 4, 20]
    for day, n in enumerate(counts, start=1):
        for _ in range(n):
            eid += 1
            rows.append((eid, T(2024, 1, day, 12, 0), 1, "view", 0.0, "{}"))
    # a second type with too little history to ever flag
    rows.append((900, T(2024, 1, 1, 9, 0), 2, "click", 0.0, "{}"))
    rows.append((901, T(2024, 1, 2, 9, 0), 2, "click", 0.0, "{}"))
    got = {
        (r["event_type"], r["day"]): r
        for r in ev.spike_detection(_events(spark, rows), k=3).collect()
    }
    burst = got[("view", dt.date(2024, 1, 7))]
    # trailing n=6, s=21, ss=75: (20·6−21)² = 9801 > 9·(6·75−441) = 81
    assert burst["is_spike"] and burst["n_events"] == 20
    assert burst["trailing_n"] == 6 and burst["trailing_sum"] == 21
    # calm days never flag; the jitter day 6 (4 vs mean 3.4) is not 3σ
    assert not any(
        r["is_spike"] for key, r in got.items() if key != ("view", dt.date(2024, 1, 7))
    )
    # short-history type reports false, zero-filled trailing columns
    first = got[("click", dt.date(2024, 1, 1))]
    assert not first["is_spike"] and first["trailing_n"] == 0
    assert first["trailing_sum"] == 0


def test_asof_join_inclusive_and_tie_rules(spark):
    left = _events(
        spark,
        [
            (1, T(2024, 1, 1, 10, 0), 1, "l", 1.0, "{}"),   # no prior right
            (3, T(2024, 1, 1, 12, 0), 1, "l", 2.0, "{}"),   # equal-ts right
            (5, T(2024, 1, 1, 15, 0), 1, "l", 3.0, "{}"),   # later right won
            (7, T(2024, 1, 1, 9, 0), 2, "l", 4.0, "{}"),    # other user
        ],
    )
    right = _events(
        spark,
        [
            (2, T(2024, 1, 1, 12, 0), 1, "r", 10.0, "{}"),
            (4, T(2024, 1, 1, 12, 0), 1, "r", 11.0, "{}"),  # same ts: max id wins
            (6, T(2024, 1, 1, 14, 0), 1, "r", 12.0, "{}"),
        ],
    )
    got = {r["event_id"]: r for r in ev.asof_join(left, right).collect()}
    assert got[1]["r_event_id"] is None and got[1]["r_value"] is None
    # inclusive <= at equal ts; the (user, ts)-dedup keeps event 4
    assert got[3]["r_event_id"] == 4 and got[3]["r_value"] == 11.0
    assert got[5]["r_event_id"] == 6 and got[5]["r_ts"] == T(2024, 1, 1, 14, 0)
    assert got[7]["r_event_id"] is None  # rights belong to user 1 only


def test_interval_join_containment_and_bucketing(spark):
    points = _events(
        spark,
        [
            (1, T(2024, 1, 1, 10, 30), 1, "p", 0.0, "{}"),  # inside A
            (2, T(2024, 1, 1, 12, 0), 1, "p", 0.0, "{}"),   # boundary end A
            (3, T(2024, 1, 1, 13, 0), 1, "p", 0.0, "{}"),   # in no interval
            (4, T(2024, 1, 1, 10, 30), 2, "p", 0.0, "{}"),  # other group
        ],
    )
    intervals = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 0), T(2024, 1, 1, 12, 0)),
            (2, T(2024, 1, 1, 14, 0), T(2024, 1, 1, 15, 0)),
        ],
        "user_id long, session_start timestamp, session_end timestamp",
    )
    # tiny buckets force multi-bucket interval explosion; the dedup-free
    # contract holds because a point's bucket matches each interval once
    got = {
        r["event_id"]: r
        for r in ev.interval_join(
            points, intervals, bucket_seconds=600
        ).collect()
    }
    assert set(got) == {1, 2}
    assert got[2]["session_end"] == T(2024, 1, 1, 12, 0)  # inclusive end
    assert got[1]["session_start"] == T(2024, 1, 1, 10, 0)


def test_salted_enrich_skew_stress_90pct_hot_key(spark):
    """Skew stress (r8 verdict #8): a 90%-hot-key corpus through
    salted_first_seen_enrich must (a) equal the plain-join enrichment
    exactly and (b) actually SPREAD the hot key — the salted big side's
    largest (user, salt) group stays near total_hot/n_salts instead of
    one task swallowing all 9,000 hot rows.

    The spread assertion is on deterministic group sizes (the salt is
    pmod(xxhash64(row), n) — stable across runs/retries), not wall-clock
    task times, which local-mode schedulers make flaky."""
    from pyspark.sql import functions as F

    n_hot, n_salts = 9_000, 16
    rows = [(i, T(2024, 1, 1, 0, 0, i % 60), 7, "view", 0.0, "{}") for i in range(n_hot)]
    rows += [
        (n_hot + i, T(2024, 1, 2, 0, 0, i % 60), 100 + i % 100, "view", 0.0, "{}")
        for i in range(1_000)
    ]
    df = _events(spark, rows)

    got = ev.salted_first_seen_enrich(df, n_salts=n_salts)
    first = df.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    plain = df.select("event_id", "user_id", "ts").join(first, "user_id").select(
        "event_id", "user_id", "ts", "first_ts"
    )
    assert got.exceptAll(plain).isEmpty() and plain.exceptAll(got).isEmpty()

    big = df.select("event_id", "user_id", "ts")
    salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)),
    )
    hot = (
        salted.filter(F.col("user_id") == 7)
        .groupBy("__salt")
        .count()
        .collect()
    )
    sizes = [r["count"] for r in hot]
    ideal = n_hot / n_salts
    # every salt bucket populated, none more than 1.5x the even split
    assert len(sizes) == n_salts, f"hot key hit only {len(sizes)}/{n_salts} salts"
    assert max(sizes) <= 1.5 * ideal, f"max bucket {max(sizes)} vs ideal {ideal}"


def test_user_overlap_jaccard(spark):
    """Pairs are unordered (a < b), counts are distinct users, Jaccard
    from exact set algebra."""
    import datetime as dt

    from binance_futures_availability_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # click users: 1,2,3 — view users: 2,3,4 — buy users: 3
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0, 2, "click", 1.0, "{}"),
        (3, t0, 3, "click", 1.0, "{}"),
        (4, t0, 3, "click", 1.0, "{}"),  # duplicate (type,user) ignored
        (5, t0, 2, "view", 1.0, "{}"),
        (6, t0, 3, "view", 1.0, "{}"),
        (7, t0, 4, "view", 1.0, "{}"),
        (8, t0, 3, "buy", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {
        (r["type_a"], r["type_b"]): r for r in ev.user_overlap(df).collect()
    }
    assert set(got) == {("buy", "click"), ("buy", "view"), ("click", "view")}
    cv = got[("click", "view")]
    assert (cv["n_users_a"], cv["n_users_b"], cv["n_both"]) == (1, 3, 1) or \
        (cv["n_users_a"], cv["n_users_b"], cv["n_both"]) == (3, 3, 2)
    assert cv["jaccard"] == cv["n_both"] / (
        cv["n_users_a"] + cv["n_users_b"] - cv["n_both"]
    )
    bc = got[("buy", "click")]
    assert (bc["n_users_a"], bc["n_users_b"], bc["n_both"]) == (1, 3, 1)
    assert bc["jaccard"] == 1 / 3


def test_debounce_collapses_bursts_per_type(spark):
    """Bursts chain transitively (each event within window_s of the
    PREVIOUS raw event extends the burst); leaders keep the lowest
    (ts, event_id); types do not interfere."""
    import datetime as dt

    from binance_futures_availability_spark.operators import events as ev

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        # user 1 click burst: 0s, 100s, 200s (chained) then 600s (new)
        (1, t(0), 1, "click", 1.0, "{}"),
        (2, t(100), 1, "click", 1.0, "{}"),
        (3, t(200), 1, "click", 1.0, "{}"),
        (4, t(600), 1, "click", 1.0, "{}"),
        # same user, other type inside the click burst window: untouched
        (5, t(50), 1, "view", 1.0, "{}"),
        # tie on ts: event_id breaks it, lower id is the leader
        (7, t(0), 2, "click", 1.0, "{}"),
        (6, t(0), 2, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {
        r["event_id"]: r["n_suppressed"]
        for r in ev.debounce(df, window_s=150).collect()
    }
    assert got == {1: 2, 4: 0, 5: 0, 6: 1}


def test_value_outliers_median_mad_exact(spark):
    """Doubled-integer median/MAD: hand-computable small world — one
    planted extreme value per type; constant types flag any deviation
    with NULL z."""
    import datetime as dt

    from binance_futures_availability_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # type A: values 1..7 plus an extreme 100 -> median(1..7,100)=4.5
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0]
    for i, v in enumerate(vals):
        rows.append((i, t0, 1, "A", v, "{}"))
    # type B: constant values -> MAD 0, no event deviates, no outliers
    for i in range(8):
        rows.append((100 + i, t0, 2, "B", 5.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = ev.value_outliers(df, k=5).collect()
    # A: med=4.5 -> m2=9e6; devs |2v-9| in micro: for 100 -> 191e6 ->
    # d-list medians: devs for 1..7,100 = [7,5,3,1,1,3,5,191] (in units
    # of 1e6) -> sorted [1,1,3,3,5,5,7,191] -> mad2 = 3+5 = 8e6 (2*MAD=8)
    # outlier iff 2d > 5*mad2 -> d > 20e6: only v=100 (d=191e6).
    assert [(r["event_id"], r["event_type"]) for r in got] == [(7, "A")]
    # milli-z = 2000*191e6 div 8e6 = 47750
    assert got[0]["robust_z_milli"] == 2000 * 191_000_000 // 8_000_000


def test_debounce_subsecond_truncation_semantics(spark):
    """Gaps compare TRUNCATED epoch seconds (unix_timestamp): two events
    150.9s apart by wall clock but 150s by truncated seconds stay in
    one burst at window_s=150; the sf1 fixture's microsecond timestamps
    exposed the fractional-epoch divergence this pins down."""
    import datetime as dt

    from binance_futures_availability_spark.operators import events as ev

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(seconds=0, microseconds=900_000), 1,
         "click", 1.0, "{}"),
        # wall-clock gap 150.0s; truncated-second gap exactly 150 -> same
        # burst (rule is strict >)
        (2, base + dt.timedelta(seconds=150, microseconds=900_000), 1,
         "click", 1.0, "{}"),
        # truncated gap 151 -> breaks
        (3, base + dt.timedelta(seconds=302, microseconds=100_000), 1,
         "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {r["event_id"]: r["n_suppressed"]
           for r in ev.debounce(df, window_s=150).collect()}
    assert got == {1: 1, 3: 0}


def test_funnel_rates_at_least_semantics(spark):
    """n_users counts users reaching AT LEAST each stage (a stage nobody
    finished exactly still reports); ratios are exact ppm floors."""
    import datetime as dt

    from binance_futures_availability_spark.operators import events as ev

    T0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 4 users reach stage1 only; 0 users stop at exactly stage 2;
    # 2 users complete all three (so at-least-2 == at-least-3 == 2)
    for u in (1, 2, 3, 4):
        rows.append((eid, T0, u, "view", 0.0, "{}")); eid += 1
    for u in (5, 6):
        for i, t in enumerate(("view", "click", "purchase")):
            rows.append((eid, T0 + dt.timedelta(minutes=i), u, t, 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {r["stage"]: r for r in ev.funnel_rates(df).collect()}
    assert [got[i]["step"] for i in (1, 2, 3)] == ["view", "click", "purchase"]
    assert [got[i]["n_users"] for i in (1, 2, 3)] == [6, 2, 2]
    assert got[1]["conversion_ppm"] == 1_000_000
    assert got[2]["conversion_ppm"] == 2 * 1_000_000 // 6
    assert got[3]["conversion_ppm"] == 2 * 1_000_000 // 6
    assert got[2]["step_ppm"] == 2 * 1_000_000 // 6
    assert got[3]["step_ppm"] == 1_000_000  # 2 of 2


def test_funnel_rates_empty_input_reports_zero_rows(spark):
    """An empty funnel reports |steps| rows of zeros (the at-least-stage
    sums coalesce to 0), matching the oracle's COALESCE'd aggregates."""
    from binance_futures_availability_spark.operators import events as ev

    df = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = ev.funnel_rates(df).collect()
    assert [r["stage"] for r in got] == [1, 2, 3]
    for r in got:
        assert (r["n_users"], r["conversion_ppm"], r["step_ppm"]) == (0, 0, 0)


def test_retention_rates_right_censoring_and_zero_offsets(spark):
    """Young cohorts leave the denominator at offsets they could not
    have reached; offsets nobody survived still emit a zero row."""
    import datetime as dt

    from binance_futures_availability_spark.operators import events as ev

    rows = [
        # cohort week of Jan 1: users 1,2 — user 1 returns week 2,
        # nobody active in week 1 (zero row must still appear)
        (1, T(2024, 1, 2, 10, 0), 1, "view", 0.0, "{}"),
        (2, T(2024, 1, 16, 10, 0), 1, "view", 0.0, "{}"),
        (3, T(2024, 1, 3, 10, 0), 2, "view", 0.0, "{}"),
        # cohort week of Jan 15: user 3 — exists only through offset 0
        # relative to the dataset max week (Jan 15), so offsets 1-2
        # exclude it from the denominator
        (4, T(2024, 1, 17, 10, 0), 3, "view", 0.0, "{}"),
    ]
    df = _events(spark, rows)
    got = {r["week_offset"]: r for r in ev.retention_rates(df).collect()}
    assert sorted(got) == [0, 1, 2]
    # offset 0: both cohorts eligible (2 + 1 users), all active
    assert (got[0]["n_cohorts"], got[0]["cohort_users"],
            got[0]["active_users"]) == (2, 3, 3)
    assert got[0]["retention_ppm"] == 1_000_000
    # offsets 1,2: only the Jan-1 cohort is old enough
    assert (got[1]["n_cohorts"], got[1]["cohort_users"],
            got[1]["active_users"]) == (1, 2, 0)
    assert got[1]["retention_ppm"] == 0
    assert (got[2]["active_users"], got[2]["retention_ppm"]) == (
        1, 1_000_000 // 2)
