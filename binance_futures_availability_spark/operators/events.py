"""Event-stream analytics over the ``events`` table — the time-windowed
operator family (tumbling/sliding windows, sessionization, as-of pairing,
JSON property extraction).

North-star extension operators (no reference counterpart — the reference's
probe timeline is daily-grained; these are the sub-second event-time
semantics a clickstream/telemetry pipeline needs, expressed through
Spark's native event-time machinery: ``F.window`` for alignment, window
functions for ordering semantics, ``get_json_object`` for schema-on-read
props). Every emitted number is an integer, an exact DECIMAL(18,2)
aggregate, or a timestamp — no float reduction anywhere, so the DuckDB
oracles hash-match bit-for-bit.

Scale notes per operator are in the docstrings; the common theme: window
alignment is a PURE PROJECTION of the timestamp (zero shuffles until the
partial agg), sessionization and as-of pairing shuffle once on the
entity key — the minimum possible for order-dependent semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: exact-money discipline: event values sum as DECIMAL(18,2), never double
_DEC = "decimal(18,2)"


def window_counts(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    user_col: str = "user_id",
) -> DataFrame:
    """Tumbling-window rollup per event type: (window_start, event_type,
    n_events, distinct_users, total_value).

    ``F.window`` alignment is a narrow per-row projection (epoch-floor
    arithmetic). The exact distinct-user count is computed as an explicit
    two-level aggregate — per (window, type, user) partials first, then
    the rollup — instead of ``countDistinct``: Catalyst plans the latter
    as an Expand that DOUBLES the shuffled rows (one copy per aggregate
    group), while the two-level form shuffles each input row once and the
    second aggregate runs over the already-tiny per-user partials. At
    sf0.1 the difference is small (0.42 vs 0.45 s warm — both floors);
    the trade matters at 100 TB, where the expand pushes a duplicate of
    the full event stream through the exchange. At
    extreme cardinalities swap in approx_count_distinct and give up the
    exact gate (documented trade, same family as tfidf's ln).
    """
    w = F.window(F.col(ts_col), duration)
    per_user = events.groupBy(
        w.alias("w"), F.col(type_col), F.col(user_col)
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(value_col).cast(_DEC)).alias("_v"),
    )
    return (
        per_user.groupBy("w", type_col)
        .agg(
            F.sum("_n").cast("long").alias("n_events"),
            F.count(F.lit(1)).alias("distinct_users"),
            F.sum("_v").cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            type_col,
            "n_events",
            "distinct_users",
            "total_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window event counts: (window_start, n_events) — each event
    lands in duration/slide overlapping windows (4 at the defaults).

    Spark expands the per-row window list before the partial agg, so the
    shuffle carries duration/slide × rows of (window, partial-count) —
    the standard sliding-agg cost, amortized entirely map-side by the
    partial aggregation.
    """
    w = F.window(F.col(ts_col), duration, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Inactivity-gap sessionization: (user_id, session_id, n_events,
    session_start, session_end) — a new session starts when a user's gap
    since their previous event exceeds ``gap_minutes``.

    The classic two-window composition: LAG over (user ORDER BY ts, id)
    marks session breaks; a running SUM of the break flags numbers the
    sessions (1-based). ONE shuffle on the user key serves both windows
    and the final (user, session) aggregate — Catalyst reuses the
    partitioning across all three. Deterministic ordering: ties on ts
    break by event_id. The streaming twin of this shape is
    ``F.session_window``; this batch form is gate-exact.
    """
    gap = F.lit(gap_minutes * 60)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts) > gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    numbered = events.withColumn(
        "session_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    return numbered.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def asof_pairs(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "view",
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """AS-OF pairing within an event stream: every ``left_type`` event
    joined to the LATEST preceding ``right_type`` event of the same user —
    (event_id, user_id, click_ts, view_ts, gap_seconds).

    The as-of join Spark famously lacks as a primitive, expressed as a
    single window pass instead of a join: both event kinds flow through
    one (user ORDER BY ts, id) window, ``last(view_ts) IGNORE NULLS``
    carries the most recent right-side timestamp forward, and left rows
    project it out. ONE shuffle on the user key, no join, no range
    explosion — strictly better than the union-and-merge as-of recipes
    that need a second pass. Unmatched lefts keep NULL (gap NULL).
    """
    tagged = events.filter(
        F.col("event_type").isin(left_type, right_type)
    ).select(id_col, user_col, ts_col, "event_type")
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = F.last(
        F.when(F.col("event_type") == right_type, F.col(ts_col)), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("view_ts", carried)
        .filter(F.col("event_type") == left_type)
        .select(
            id_col,
            user_col,
            F.col(ts_col).alias("click_ts"),
            "view_ts",
            (F.unix_timestamp(ts_col) - F.unix_timestamp("view_ts"))
            .cast("long")
            .alias("gap_seconds"),
        )
    )


def json_prop_rollup(
    events: DataFrame,
    prop: str = "k",
    type_col: str = "event_type",
    props_col: str = "props",
) -> DataFrame:
    """Schema-on-read JSON rollup: (event_type, n_events, n_with_prop,
    sum_prop) — extracts an integer property from the JSON ``props``
    column and aggregates per type.

    ``get_json_object`` is a codegen'd per-row path lookup (no UDF, no
    full JSON schema inference pass); the aggregate is one partial-agg
    shuffle on the type key. All-integer output.

    The ROLLUP itself — |event_types| rows — is the session-cached
    artifact, keyed by the property name: engines that shred JSON hot
    paths into typed columns maintain exactly this cube as a matview.
    Caching the bounded aggregate rather than the corpus-sized shred
    means a workload probing MANY distinct props accumulates a few KB
    per prop, not a corpus-scale column per prop (which would churn the
    byte-budget eviction against other warm indexes), and the warm
    query is a single tiny InMemoryRelation scan — the Spark job floor,
    nothing else.
    """
    from ..index_cache import cached_index, plan_key

    k = F.get_json_object(F.col(props_col), f"$.{prop}").cast("long")
    return cached_index(
        plan_key(events, "props_rollup", prop, type_col, props_col),
        lambda: events.select(F.col(type_col), k.alias("__k"))
        .groupBy(type_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("__k").alias("n_with_prop"),
            F.sum("__k").cast("long").alias("sum_prop"),
        ),
    )


def funnel(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Ordered conversion funnel: per user, the earliest timestamp of each
    step that occurs AT OR AFTER the previous step's timestamp —
    (user_id, <step>_ts ..., stage_reached).

    Order matters: a purchase BEFORE the first qualifying click does not
    count (the strict-funnel semantics product analytics means by
    "conversion"). Expressed as chained per-user window minima — one
    select per step, all over the SAME user partitioning, so Catalyst
    plans ONE shuffle for the whole chain and the final per-user collapse
    reuses it. Users missing a step carry NULL from there on;
    ``stage_reached`` counts completed steps.
    """
    df = events.select(F.col(user_col), F.col(ts_col), F.col("event_type"))
    w = Window.partitionBy(user_col)
    prev_col = None
    for step in steps:
        qualifies = F.col("event_type") == step
        if prev_col is not None:
            qualifies = qualifies & F.col(prev_col).isNotNull() & (
                F.col(ts_col) >= F.col(prev_col)
            )
        col = f"{step}_ts"
        df = df.withColumn(col, F.min(F.when(qualifies, F.col(ts_col))).over(w))
        prev_col = col
    stage = sum(
        (F.col(f"{s}_ts").isNotNull()).cast("int") for s in steps
    )
    return (
        df.groupBy(user_col)
        .agg(
            *[F.max(f"{s}_ts").alias(f"{s}_ts") for s in steps],
        )
        .select(
            user_col,
            *[f"{s}_ts" for s in steps],
            stage.alias("stage_reached"),
        )
    )


def window_topk_users(
    events: DataFrame,
    k: int = 3,
    duration: str = "1 day",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-window heavy hitters: the ``k`` most active users per tumbling
    window — (window_start, user_id, n_events, rnk), ties → lowest user id.

    Two shuffles: the (window, user) partial-agg count, then the per-window
    rank. The rank side is window-count-partitioned — at 100 TB the heavy
    state is the first aggregate, which combines map-side; the exact top-k
    per window never materializes more than the aggregate.
    """
    w = F.window(F.col(ts_col), duration)
    counts = events.groupBy(w.alias("w"), F.col(user_col)).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    rw = Window.partitionBy("w").orderBy(
        F.col("n_events").desc(), F.col(user_col)
    )
    return (
        counts.withColumn("rnk", F.row_number().over(rw).cast("int"))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("w.start").alias("window_start"), user_col, "n_events", "rnk"
        )
    )


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly retention matrix: users grouped by first-activity week
    (cohort), counted distinct per week offset —
    (cohort_week, week_offset, active_users).

    Shape: one per-user MIN aggregate builds the cohort map, one join
    tags every event, one (cohort, offset) aggregate rolls up. The
    cohort map is USER-count sized — not a bounded dimension — so the
    join carries NO broadcast hint: the optimizer broadcasts while the
    map fits the threshold and falls back to a hash join on ``user_col``
    at billion-user scale, where both sides already partition by the
    same key (the map was BUILT by a user-keyed aggregation, so the
    shuffle is exchange-reused, the vocab_growth discipline from the r9
    advisor). Weeks are Monday-truncated dates; the offset is integer
    day-difference // 7 — all-integer, engine-exact.

    The matrix is PARAMETER-FREE (no window, no constant), so it lives
    in the session index cache like the LSH/IVF/BM25 indexes: the
    first retention query pays the two corpus shuffles, every later one
    (the rates curve, repeated dashboard refreshes) serves the
    weeks²-bounded aggregate from the in-memory columnar form. A
    cluster materializes the same matrix as an incrementally-refreshed
    summary table.
    """
    from ..index_cache import cached_index, plan_key

    def build() -> DataFrame:
        first = events.groupBy(user_col).agg(
            F.date_trunc("week", F.min(ts_col))
            .cast("date")
            .alias("cohort_week")
        )
        tagged = events.join(first, user_col).select(
            F.col(user_col),
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col(ts_col)).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        return tagged.groupBy("cohort_week", "week_offset").agg(
            F.countDistinct(user_col).alias("active_users")
        )

    return cached_index(
        plan_key(events, "retention_matrix", ts_col, user_col), build
    )


def spike_detection(
    events: DataFrame,
    k: int = 3,
    window_days: int = 7,
    min_history: int = 5,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Daily volume-anomaly detection per event type: (event_type, day,
    n_events, trailing_n, trailing_sum, is_spike) where is_spike flags a
    day whose count exceeds trailing-mean + k·stddev.

    The z-score test runs in EXACT INTEGER algebra — no float mean or
    variance ever materializes. With x = today's count and n/s/ss = the
    trailing window's count/sum/sum-of-squares,

        x > μ + k·σ  ⟺  x·n − s > 0  ∧  (x·n − s)² > k²·(n·ss − s²)

    (population σ; both sides scaled by n²). Every term is a BIGINT of
    bounded magnitude (daily counts square, not corpus totals), so Spark
    and the DuckDB oracle agree bit-for-bit — float stddev would diverge
    in the last ulp between engines and between partition merge orders.

    Shape: one map-side-combined aggregate to |types|×|days| rows, one
    window per type ordered by day over that REDUCED frame (rows-frame of
    the prior ``window_days`` observed days, so gaps don't dilute the
    baseline) — the window never sees raw events. is_spike is NULL-safe:
    days with under ``min_history`` trailing observations report false.
    """
    x = F.col("n_events")
    daily = events.groupBy(
        F.col(type_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy(type_col)
        .orderBy("day")
        .rowsBetween(-window_days, -1)
    )
    n = F.count(x).over(w)
    s = F.sum(x).over(w)
    ss = F.sum(x * x).over(w)
    dev = x * n - s  # n·(x − μ), integer-exact
    spike = (
        (n >= min_history)
        & (dev > 0)
        & (dev * dev > F.lit(k * k) * (n * ss - s * s))
    )
    return daily.select(
        type_col,
        "day",
        "n_events",
        F.coalesce(n, F.lit(0)).alias("trailing_n"),
        F.coalesce(s, F.lit(0)).alias("trailing_sum"),
        F.coalesce(spike, F.lit(False)).alias("is_spike"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """General two-TABLE as-of join: each left row gains the right row
    with the greatest ``ts ≤ left.ts`` in its ``by`` group — (id, by, ts,
    value, r_id, r_ts, r_value), NULLs when no prior right row exists.

    Spark lacks the primitive; the scale-right expression is the
    union-and-carry window: both sides tagged into ONE frame, sorted by
    (ts, side) within the group — right rows sort before left at equal
    ts, giving the standard inclusive ``≤`` rule — and three
    last(..., ignorenulls=True) columns carry the latest right row
    forward. ONE shuffle on the group key, no join operator, no range
    explosion (a naive range join is O(|L|·|R|) per group). Right rows
    are first deduped to one per (by, ts) — max id wins — so the carried
    row is well-defined; the DuckDB oracle runs its NATIVE ASOF JOIN
    over the same deduped side, checking these window semantics against
    an independent implementation of the operator.
    """
    lt, rt = dict(left.dtypes), dict(right.dtypes)
    wr = Window.partitionBy(by, ts_col).orderBy(F.desc(id_col))
    r1 = (
        right.select(by, ts_col, id_col, value_col)
        .withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    l2 = left.select(
        F.col(by),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.col(id_col).alias("l_id"),
        F.col(value_col).alias("l_value"),
        F.lit(None).cast(rt[id_col]).alias("__cr_id"),
        F.lit(None).cast(rt[ts_col]).alias("__cr_ts"),
        F.lit(None).cast(rt[value_col]).alias("__cr_value"),
    )
    r2 = r1.select(
        F.col(by),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lt[id_col]).alias("l_id"),
        F.lit(None).cast(lt[value_col]).alias("l_value"),
        F.col(id_col).alias("__cr_id"),
        F.col(ts_col).alias("__cr_ts"),
        F.col(value_col).alias("__cr_value"),
    )
    w = (
        Window.partitionBy(by)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    out = (
        l2.unionByName(r2)
        .select(
            "*",
            carry(F.col("__cr_id")).alias("r_" + id_col),
            carry(F.col("__cr_ts")).alias("r_" + ts_col),
            carry(F.col("__cr_value")).alias("r_" + value_col),
        )
        .filter(F.col("__is_left") == 1)
        .select(
            F.col("l_id").alias(id_col),
            by,
            F.col("__ts").alias(ts_col),
            F.col("l_value").alias(value_col),
            "r_" + id_col,
            "r_" + ts_col,
            "r_" + value_col,
        )
    )
    if tolerance_seconds is not None:
        # merge_asof-style max gap: a carried right row older than the
        # tolerance yields NULLs (unmatched), not a dropped left row
        fresh = (
            F.unix_timestamp(F.col(ts_col))
            - F.unix_timestamp(F.col("r_" + ts_col))
        ) <= tolerance_seconds
        out = out.select(
            id_col,
            by,
            ts_col,
            value_col,
            *[
                F.when(fresh, F.col("r_" + c)).alias("r_" + c)
                for c in (id_col, ts_col, value_col)
            ],
        )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range (interval-containment) join: each point row joined to every
    interval of its group with ``start ≤ ts ≤ end`` — (id, by, ts, start,
    end). The operator class Spark's equi-join machinery lacks.

    Scale-right expression: the BUCKETED range join. A naive theta-join
    on the range predicate degenerates to a per-group cross product
    (O(|P|·|I|) per group — Catalyst plans exactly that if asked).
    Instead time is cut into ``bucket_seconds`` buckets: every interval
    explodes into the buckets it covers (F.sequence — a narrow
    projection), points map to one bucket each, and the join becomes an
    EQUI-join on (group, bucket) with the exact containment predicate
    as a post-filter. Work is then O(points + interval-bucket spans +
    true matches). ``bucket_seconds`` is the knob: size it near the
    median interval length so each interval spans O(1) buckets — too
    fine explodes intervals, too coarse piles points per bucket (the
    same trade as every spatial grid join).
    """
    bs = F.lit(bucket_seconds)
    pt = points.select(
        id_col, by, ts_col,
        (F.unix_timestamp(F.col(ts_col)) / bs).cast("long").alias("__bucket"),
    )
    iv = intervals.select(
        by, start_col, end_col,
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bs).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / bs).cast("long"),
            )
        ).alias("__bucket"),
    )
    return (
        pt.join(iv, [by, "__bucket"])
        .filter(
            F.col(ts_col).between(F.col(start_col), F.col(end_col))
        )
        .select(id_col, by, ts_col, start_col, end_col)
    )


def salted_first_seen_enrich(
    events: DataFrame,
    n_salts: int = 16,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Hot-key-safe event enrichment: every event tagged with its user's
    first-seen timestamp — (event_id, user_id, ts, first_ts) — through
    the SALTED join path.

    The enrichment join is the classic skew site: one bot/whale user can
    put its entire event history in a single task. ``salted_join``
    splits each key across ``n_salts`` tasks by replicating only the
    small (per-user) side; results are IDENTICAL to the plain join —
    which is exactly what this query's oracle (a plain SQL join)
    verifies on real data, complementing the unit test's plan-level
    skew-spread assertion.
    """
    from ..functions import salted_join

    first = events.groupBy(user_col).agg(F.min(ts_col).alias("first_ts"))
    return salted_join(
        events.select(id_col, user_col, ts_col), first, user_col, n_salts
    ).select(id_col, user_col, ts_col, "first_ts")


def user_overlap(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Event-type affinity matrix over shared user sets: for every
    unordered type pair — (type_a, type_b, n_users_a, n_users_b,
    n_both, jaccard). The product/behavioral-analytics co-occurrence
    report ("which features share an audience?") and the same shape as
    label co-occurrence audits on training corpora.

    Shape: one DISTINCT (type, user) aggregate shrinks the stream to at
    most |users|·T rows, the pair enumeration is a self-join on the
    user key of THAT reduced set (each user contributes at most T²/2
    pairs — bounded fan-out because the type dimension is bounded, the
    opposite regime from document pair-enumeration), and the final
    aggregate is T²-sized. Per-type totals are a T-sized broadcast.
    Jaccard = n_both / (n_a + n_b − n_both): exact longs, one double
    division — engine-deterministic.

    The distinct (type, user) INCIDENCE MATRIX is parameter-free, so it
    is a session-cached index artifact (the behavioral-analytics
    sibling of the inverted index): the corpus-sized distinct reduction
    is paid once per session; every affinity/overlap query self-joins
    the cached |users|·T matrix.
    """
    from ..index_cache import cached_index, plan_key

    d = cached_index(
        plan_key(events, "user_type_incidence", type_col, user_col),
        lambda: events.select(
            F.col(type_col).alias("t"), F.col(user_col).alias("u")
        ).distinct(),
    )
    a = d.select(F.col("t").alias("type_a"), F.col("u"))
    b = d.select(F.col("t").alias("type_b"), F.col("u"))
    both = (
        a.join(b, ["u"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    totals = F.broadcast(
        d.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        both.join(totals.select(F.col("t").alias("type_a"),
                                F.col("n").alias("n_users_a")), "type_a")
        .join(totals.select(F.col("t").alias("type_b"),
                            F.col("n").alias("n_users_b")), "type_b")
        .select(
            "type_a", "type_b", "n_users_a", "n_users_b", "n_both",
            (
                F.col("n_both").cast("double")
                / (F.col("n_users_a") + F.col("n_users_b") - F.col("n_both"))
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


def debounce(
    events: DataFrame,
    window_s: int = 300,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Telemetry burst-dedup ("debounce"): within each (user, type)
    stream, consecutive events within ``window_s`` seconds (gap <=
    window_s; a new burst starts only when the gap EXCEEDS the window)
    collapse into their first event — (event_id, user_id, event_type,
    ts, n_suppressed). The ingestion-side dedup every client-event pipeline
    runs against double-fires and retry storms; same burst rule as
    inactivity sessionization but keyed per event TYPE and returning the
    surviving leader rows instead of session aggregates.

    Shape: the sessionize discipline — LAG marks burst breaks, a running
    SUM numbers bursts, both windows and the (user, type, burst) leader
    aggregate share ONE shuffle on the (user, type) key. Leader = lowest
    (ts, event_id) via a MIN over a struct (no second window pass);
    ties on ts break by event_id on both engines.
    """
    gap = F.lit(window_s)
    w = Window.partitionBy(user_col, type_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    brk = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts) > gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    numbered = events.withColumn(
        "__burst",
        F.sum(brk)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    return (
        numbered.groupBy(user_col, type_col, "__burst")
        .agg(
            F.min(F.struct(F.col(ts_col), F.col(id_col))).alias("__l"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_suppressed"),
        )
        .select(
            F.col(f"__l.{id_col}").alias(id_col),
            user_col,
            type_col,
            F.col(f"__l.{ts_col}").alias(ts_col),
            "n_suppressed",
        )
    )


def robust_value_stats(
    events: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    distinct_guard: int | None = None,
) -> DataFrame:
    """Per-type doubled-integer robust statistics — (event_type, m2,
    mad2) where m2 = 2·median(value_micro) and mad2 = 4·MAD in micro
    units. The trainable half of ``value_outliers`` (the streaming
    anomaly sink freezes exactly this table); see value_outliers for
    the weighted-median shape and exactness argument.

    Shape: both weighted medians rank the (type, value) FREQUENCY
    AGGREGATE — |types|×|distinct micro-values| rows, orders of
    magnitude smaller than the event stream — in ONE fused windowed
    flow over a single per-type exchange: cumulative-weight window
    ordered by value → median hits → per-type m2 as an unordered window
    (no join-back), deviations derived IN ROW, second cumulative window
    ordered by deviation → mad2. The deviation median needs no (type,
    deviation) re-aggregation: the weighted-median position test lands
    each rank in exactly one row under ANY tie order, and tied rows
    carry the same deviation value, so the summed contribution is
    tie-order-invariant — the same multiset of (deviation, weight) the
    re-aggregated table would rank. The previous formulation paid two
    ``global_running_sum`` passes (range repartition + bounded collect
    + Arrow pass each, ~5 s of flat job cost) plus two join-backs that
    recomputed the counts aggregate; this plan is counts → three Window
    operators sharing one hash exchange → one tiny per-type aggregate.

    CONTRACT (the ``grouped_running_sum`` window-partition-safety
    assumption, measured tradeoff per the r11 advisor): values are
    micro-quantized, so each per-type window partition is bounded by
    the type's distinct micro-value count. Continuous high-precision
    telemetry can push that toward the per-type ROW count and
    concentrate one type's aggregate in a single window task —
    WindowExec spills rather than OOMs, but the task degrades to one
    slow straggler. Pass ``distinct_guard`` to enforce the contract:
    one bounded pre-check over the frequency aggregate raises a clear
    diagnostic (quantize coarser, or split the type) when any type
    exceeds the threshold, instead of silently paying the skewed task.
    Off by default — the check is an extra action, and the engine's
    event telemetry is micro-quantized by construction.
    """
    ev = events.select(
        F.col(type_col).alias("__t"),
        F.expr(f"CAST(round({value_col} * 1000000) AS BIGINT)").alias("__v"),
    )
    counts = ev.groupBy("__t", "__v").agg(F.count(F.lit(1)).alias("__c"))
    if distinct_guard is not None:
        worst = (
            counts.groupBy("__t")
            .agg(F.count(F.lit(1)).alias("__nd"))
            .agg(F.max_by("__t", "__nd").alias("t"), F.max("__nd").alias("nd"))
            .first()
        )
        if worst is not None and (worst["nd"] or 0) > distinct_guard:
            raise ValueError(
                f"robust_value_stats distinct-value guard: type "
                f"{worst['t']!r} has {worst['nd']} distinct micro-values "
                f"(> {distinct_guard}); its window partition would "
                f"concentrate in one task. Quantize {value_col} coarser "
                f"or pre-bucket the type before ranking."
            )

    wt = Window.partitionBy("__t")
    wv = wt.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    def hits(cum: str) -> F.Column:
        """How many of the two middle ranks (equal when the group count
        is odd) land inside this row's (prev_cum, cum] weight span —
        the row contributes its value once per hit, so ties and
        duplicate weights need no special casing."""
        return F.expr(
            f"CASE WHEN (__n + 1) div 2 > {cum} - __c "
            f"AND (__n + 1) div 2 <= {cum} THEN 1 ELSE 0 END + "
            f"CASE WHEN (__n + 2) div 2 > {cum} - __c "
            f"AND (__n + 2) div 2 <= {cum} THEN 1 ELSE 0 END"
        )

    r = (
        counts.withColumn("__n", F.sum("__c").over(wt))
        .withColumn("__cum", F.sum("__c").over(wv))
        .withColumn("__m2", F.sum(F.col("__v") * hits("__cum")).over(wt))
        .withColumn("__d", F.abs(F.lit(2) * F.col("__v") - F.col("__m2")))
    )
    wd = wt.orderBy("__d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = r.withColumn("__dcum", F.sum("__c").over(wd))
    return (
        r.groupBy("__t")
        .agg(
            F.max("__m2").alias("m2"),
            F.sum(F.col("__d") * hits("__dcum")).alias("mad2"),
        )
        .select(F.col("__t").alias(type_col), "m2", "mad2")
    )


def score_values_with(
    events: DataFrame,
    stats: DataFrame,
    k: int = 5,
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Apply a (frozen or fresh) robust-stats table to an event stream:
    the flagging half of ``value_outliers`` — a narrow scan under the
    broadcast stats, integer cross-multiplied k-MAD test, exact integer
    milli-z. Types absent from the stats table cannot be scored and are
    dropped (the classifier sink's frozen-vocabulary discipline).

    The flagged set is lazily ``localCheckpoint``-ed before the global
    sort: a distributed ORDER BY samples its child for range bounds and
    would otherwise execute the scan+join+filter TWICE (measured ~0.45 s
    of the query at sf0.1); checkpointing materializes the (small,
    k-MAD-tail) flagged rows once and both the sampling and shuffle
    passes read the same blocks. Fully distributed — no single-task
    gather — so the shape survives an anomaly report of any size."""
    ev = events.select(
        F.col(type_col).alias("__t"),
        F.expr(f"CAST(round({value_col} * 1000000) AS BIGINT)").alias("__v"),
        F.col(id_col),
        F.col(value_col),
    )
    st = stats.select(
        F.col(type_col).alias("__t"),
        F.col("m2").alias("__m2"),
        F.col("mad2").alias("__mad2"),
    )
    flagged = (
        ev.join(F.broadcast(st), "__t")
        .withColumn("__d", F.abs(F.lit(2) * F.col("__v") - F.col("__m2")))
        .filter(F.lit(2) * F.col("__d") > F.lit(int(k)) * F.col("__mad2"))
        .select(
            F.col(id_col),
            F.col("__t").alias(type_col),
            F.col(value_col),
            F.expr("CASE WHEN __mad2 = 0 THEN NULL "
                   "ELSE (2000 * __d) div __mad2 END")
            .cast("long")
            .alias("robust_z_milli"),
        )
        .localCheckpoint(eager=False)
    )
    return flagged.orderBy(type_col, id_col)


def value_outliers(
    events: DataFrame,
    k: int = 5,
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Robust per-type value anomalies via EXACT DISTRIBUTED ORDER
    STATISTICS: flag events whose value sits more than ``k`` MADs from
    their type's median — (event_id, event_type, value, robust_z_milli),
    the median/MAD robust z-test (Iglewicz & Hoaglin) that a heavy
    tail cannot poison the way it poisons mean/stddev.

    The hard part at scale is the EXACT per-group median: an ORDER BY
    window per type puts a whole type's events in one task. Shape here
    (``robust_value_stats``): the fact shuffles ONCE into a
    (type, value) frequency aggregate — never larger than the corpus
    and, on real telemetry (quantized values), orders of magnitude
    smaller — and both medians run as WEIGHTED medians over that
    aggregate via per-type cumulative windows (the
    ``grouped_running_sum`` discipline — safe precisely because the
    windowed input is the aggregate, not the facts; see
    robust_value_stats for the fused plan). The deviation median needs
    no second corpus pass at
    all: every occurrence of a value shares one deviation, so its
    frequency table derives from the first aggregate.
    The final flag pass (``score_values_with``) is a narrow scan under
    broadcast med/MAD tables.

    All statistics stay INTEGER: values quantize to micro units, the
    median is carried DOUBLED (sum of the two middle elements — no
    fractional average), the deviation doubled again, and the k-MAD
    test is the cross-multiplication 2·dev > k·mad2 — so the flagged
    set and the reported milli-z (exact integer div) hash-gate
    bit-for-bit. MAD = 0 (constant type) degenerates to flagging any
    deviation, with NULL milli-z on both engines.

    The (type, m2, mad2) stats table is session-cached (index_cache
    discipline): it is the TRAINED anomaly model — |types| rows, the
    exact table the streaming anomaly sink freezes to parquet
    (streaming/pipeline.py) — so the per-type median/MAD fit (the
    frequency aggregate + three windows over it) runs once per corpus,
    and each scoring pass is one narrow scan under the broadcast model
    (guide §1.2: train once, serve many).
    """
    from ..index_cache import cached_index, plan_key

    stats = cached_index(
        plan_key(events, "robust_value_stats", type_col, value_col),
        lambda: robust_value_stats(events, type_col, value_col),
    )
    return score_values_with(events, stats, k, type_col, value_col, id_col)


def funnel_rates(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Funnel conversion summary: per stage — (stage, step, n_users,
    conversion_ppm, step_ppm). ``n_users`` = users who reached AT LEAST
    this stage; ``conversion_ppm`` = against stage-1 entrants;
    ``step_ppm`` = against the previous stage — the numbers a funnel
    dashboard actually plots from the per-user ``funnel`` output.

    Shape: the per-user funnel collapses to ONE row of |steps|
    conditional aggregates (at-least-stage counts — so a stage nobody
    reached exactly still reports correctly), and every ratio is then
    pure integer arithmetic on that single row, reshaped to stage rows
    with ``stack`` — no window, no second shuffle. Ratios are exact
    ×10⁶ floor divisions; an empty funnel reports |steps| rows of zeros
    (the at-least-stage SUMs coalesce to 0 so the zero-entrant guard
    holds) without dividing by zero on either engine.
    """
    per_user = funnel(events, steps, ts_col, user_col)
    n = len(steps)
    row = per_user.agg(
        *[
            F.coalesce(
                F.sum((F.col("stage_reached") >= i).cast("long")), F.lit(0)
            ).alias(f"__n{i}")
            for i in range(1, n + 1)
        ]
    )
    parts = []
    for i, step in enumerate(steps, start=1):
        conv = (
            f"CASE WHEN __n1 = 0 THEN 0 "
            f"ELSE __n{i} * 1000000 div __n1 END"
        )
        prev = f"__n{i - 1}" if i > 1 else "__n1"
        srate = (
            f"CASE WHEN {prev} = 0 THEN 0 "
            f"ELSE __n{i} * 1000000 div {prev} END"
        ) if i > 1 else "CASE WHEN __n1 = 0 THEN 0 ELSE 1000000 END"
        parts.append(f"{i}, '{step}', __n{i}, CAST(({conv}) AS BIGINT), "
                     f"CAST(({srate}) AS BIGINT)")
    stacked = row.selectExpr(
        f"stack({n}, " + ", ".join(parts) + ") AS "
        "(stage, step, n_users, conversion_ppm, step_ppm)"
    )
    return stacked.select(
        F.col("stage").cast("int"),
        "step",
        F.col("n_users").cast("long"),
        "conversion_ppm",
        "step_ppm",
    ).orderBy("stage")


def retention_rates(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cross-cohort retention CURVE with right-censoring: per week
    offset — (week_offset, n_cohorts, cohort_users, active_users,
    retention_ppm). A cohort enters offset k's denominator only if it
    EXISTED k weeks before the dataset's last observed week (standard
    right-censoring — without it the newest cohorts drag every tail
    offset toward zero), and offsets nobody survived still emit a zero
    row, so the curve is complete.

    Shape: rides ``retention_cohorts``' matrix — served from the
    session index cache when the events frame is file-backed, else
    lazily ``localCheckpoint``-ed — because both downstream branches
    (the eligibility expansion and the activity join-back) read it;
    without materialization each branch re-runs the full event scan +
    cohort shuffles (the matrix is |cohorts|·|offsets| rows;
    materializing it once replaces two corpus passes with block
    reads). The censoring bound derives FROM the matrix — the
    dataset's last observed week is exactly
    max(cohort_week + 7·week_offset), since both sides are
    week-truncated dates (multiples of 7 apart) and the max-ts event
    contributes its own offset row — and it is FUSED into the
    eligibility expansion as a whole-frame window MAX (empty
    PARTITION BY over the weeks²-bounded aggregate), not a separate
    broadcast-subquery job: the r11 shape paid a checkpoint + bound
    aggregate + broadcast exchange chain (~4 jobs, 10.9× the paired
    oracle at sf1) for what is one scalar. Eligibility expands via
    ``sequence`` to a |cohorts|·|offsets| frame — weeks², bounded by
    calendar time, not data. The eligibility⋈activity JOIN is gone:
    because every activity row lies inside its cohort's eligibility
    window by construction (a cohort active at offset k existed k
    weeks before the last observed week), the curve is a UNION of the
    two weeks²-bounded streams under one conditional aggregate —
    eligibility rows carry (__sz, NULL), activity rows (NULL,
    active_users) — and a join would have forced Catalyst to re-hash
    BOTH gathered sides (SinglePartition children of a join are not
    co-partitioned in its eyes). The matrix gathers to ONE partition
    up front, so window, explode, union (coalesced), aggregate, and
    sort all run in a single exchange-free stage; the per-stage
    scheduling floor, not data, dominated the r11 shape.
    ``retention_ppm`` is the exact ×10⁶ floor division.
    """
    from pyspark.sql import Window

    m = retention_cohorts(events, ts_col, user_col)
    if not m.is_cached:
        m = m.localCheckpoint(eager=False)
    m = m.repartition(1)
    # whole-frame window (already single-partition) computes the
    # censoring bound in the SAME job chain
    elig = (
        m.withColumn(
            "__maxw",
            F.max(
                F.date_add(F.col("cohort_week"), F.col("week_offset") * 7)
            ).over(Window.partitionBy()),
        )
        .filter(F.col("week_offset") == 0)
        .select(
            F.col("active_users").alias("__sz"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.expr("datediff(__maxw, cohort_week) div 7").cast("int"),
                )
            ).alias("week_offset"),
        )
        .select(
            "week_offset", "__sz", F.lit(None).cast("long").alias("__act")
        )
    )
    act = m.select(
        "week_offset",
        F.lit(None).cast("long").alias("__sz"),
        F.col("active_users").cast("long").alias("__act"),
    )
    return (
        elig.unionByName(act)
        .coalesce(1)
        .groupBy("week_offset")
        .agg(
            F.count("__sz").cast("long").alias("n_cohorts"),
            F.sum("__sz").cast("long").alias("cohort_users"),
            F.coalesce(F.sum("__act"), F.lit(0))
            .cast("long")
            .alias("active_users"),
            F.expr(
                "CAST(coalesce(sum(__act), 0) AS BIGINT) * 1000000"
                " div sum(__sz)"
            )
            .cast("long")
            .alias("retention_ppm"),
        )
        .sortWithinPartitions("week_offset")
    )
