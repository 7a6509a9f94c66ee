"""Reusable column expressions — pure, JVM-side (no Python UDFs).

Cross-engine determinism toolkit: every helper here has an exact DuckDB SQL
equivalent (documented inline) so operators built from them hash-match the
oracle. The two foundational tricks:

- ``md5_int60``: a 60-bit integer hash of a string via md5 hex — identical in
  Spark (``conv(substr(md5(x),1,15),16,10)``) and DuckDB
  (``('0x' || substr(md5(x),1,15))::BIGINT``). Replaces engine-specific
  ``xxhash64``/``hash`` whose values differ across engines.
- ``quantize_embedding``: float vector → exact integer vector
  (``round(e*1e6)``), making dot products / norms exactly representable in
  doubles (< 2^53), so cosine similarity is bit-deterministic regardless of
  summation order. This is the scale-safe answer to float-reduction
  nondeterminism on a 1000-executor cluster, not just an oracle trick.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Embedding quantization scale; products fit doubles exactly: 64 dims ×
#: (0.53e6)^2 ≈ 1.8e13 < 2^53.
EMB_SCALE = 1_000_000

#: MinHash modulus (30-bit prime): a*x+b stays far below 2^63.
MINHASH_P = 1_000_000_007


def gathered_sort(df, *cols):
    """Total order for a bounded (presentation-size) result set.

    ``repartition(1)`` gathers the already-filtered/aggregated result with a
    single round-robin shuffle, then the sort runs locally in that one
    partition (SinglePartition satisfies OrderedDistribution, so Catalyst
    skips the range-exchange and its sampling pass — one fewer job than a
    global ``orderBy``). Upstream stages keep full parallelism, unlike
    ``coalesce(1)`` which would serialize the scan itself.

    Use ONLY where the result is small by construction (per-date symbol
    lists, per-symbol histories, per-date count series — all bounded by
    #symbols or #dates, not by fact rows). Large outputs (e.g. the rankings
    archive) must keep the distributed range sort.
    """
    return df.repartition(1).orderBy(*cols)


#: gathered-vs-distributed presentation-sort cutover, bytes of the SOURCE
#: frame (Catalyst optimized-plan stats — a zero-job estimate). Measured on
#: transition_events (r13): at sf1 (~90 MB fact) the gathered sort wins
#: (1.1 s vs 1.7 s — checkpoint + range-sampling machinery costs more than
#: a sub-million-row local sort); at sf10 (~900 MB) distributed wins 3.1 s
#: vs 6.3 s. 300 MB sits between the two.
SIZED_SORT_CUTOVER_BYTES = 300 * 1024 * 1024


def sized_sort(df, source, *cols):
    """Presentation sort for results that SCALE WITH their source (per-doc
    maps, per-vector code tables, event streams): ``gathered_sort`` below
    the measured cutover, a distributed range sort above it.

    ``gathered_sort`` is single-partition by design and documented for
    bounded results only — an output proportional to the corpus would
    funnel 100 TB-scale rows through one task. ``source`` is the frame
    whose optimized-plan size estimate decides (the fact/corpus the output
    grows with); above the cutover the input is lazily checkpointed so the
    range sort's sampling pass does not re-execute the upstream pipeline,
    and the sort stays parallel. Both branches emit the identical total
    order.
    """
    try:
        nbytes = int(
            source._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — stats are advisory
        nbytes = 0
    if nbytes > SIZED_SORT_CUTOVER_BYTES:
        return df.localCheckpoint(eager=False).orderBy(*cols)
    return df.repartition(1).orderBy(*cols)


def salted_join(
    big,
    small,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
):
    """Hot-key mitigation for large⋈large equi-joins.

    When both sides are too big to broadcast and the key distribution has
    hot values (one symbol dominating a feed, one shingle dominating a
    posting list), a plain shuffle join lands every hot-key row in ONE
    task. Salting splits each hot key across ``n_salts`` tasks: the big
    side gets a deterministic per-row salt, the small side is replicated
    once per salt value, and the join key becomes (key, salt) — skew is
    bounded by ``1/n_salts`` at the cost of an ``n_salts``× blow-up of the
    SMALL side only.

    First resort is AQE's skew-join split (on in session.py), which
    handles this at runtime without replication; use explicit salting when
    the skew is known ahead of time or AQE is unavailable. The salt is
    ``pmod(xxhash64(all big columns), n)`` — deterministic, so retried
    tasks re-produce identical output (rand() salts break recompute
    idempotency under task retry).
    """
    from pyspark.sql import functions as F

    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    ).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [on, "__salt"], how).drop("__salt")


def md5_int60(col: Column) -> Column:
    """60-bit integer from md5 hex prefix.

    DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text.

    DuckDB: ``regexp_split_to_array(trim(x), '\\s+')``.
    """
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Number of whitespace tokens. DuckDB: ``len(regexp_split_to_array(...))``."""
    return F.size(tokens(col))


def normalized_text(col: Column) -> Column:
    """Lowercased, whitespace-collapsed text (dedup canonical form).

    DuckDB: ``lower(trim(regexp_replace(x, '\\s+', ' ', 'g')))``.
    """
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


#: The exact alternations CPython's ``_strptime`` uses for %y / %m / %d —
#: same ordered alternation, so ambiguous short suffixes split into the same
#: (month, day) the reference's strptime picks ('2312' → m=1, d=2; '23121'
#: → m=12, d=1). Anchored at the last underscore and end-of-string: the
#: group cannot contain '_', so the match starts at the final underscore,
#: mirroring rsplit('_', 1); the '$' anchor mirrors strptime's
#: "unconverted data remains" rejection (with identical alternation order
#: the anchored backtracking match full-consumes exactly when strptime's
#: leftmost-first parse does — no extra acceptances).
CONTRACT_SUFFIX_RE = (
    r"_((\d\d)(1[0-2]|0[1-9]|[1-9])(3[0-1]|[1-2]\d|0[1-9]|[1-9]| [1-9]))$"
)


def classify_symbol(col: Column) -> Column:
    """F10 — perpetual vs delivery contract by ``_yymmdd`` suffix.

    Reference: probing/s3_symbol_discovery.py:149-179 — rsplit('_', 1), then
    ``strptime(suffix, '%y%m%d')``; any parse failure means "perpetual".
    Python's %m/%d accept 1-digit months and days (and a space-padded day),
    so 4-6 char suffixes like '2312' are valid dates in the reference.
    Re-expressed as a native regexp + try_to_date so it runs in whole-stage
    codegen: extract (yy, m, d) with the same ordered alternations strptime
    compiles, zero-pad to the canonical 6-digit form, and calendar-validate
    with try_to_date (not to_date — Spark 4's ANSI mode would throw on
    invalid dates like Feb 30, which must mean "perpetual", not an error).

    DuckDB (same regex ``P`` = CONTRACT_SUFFIX_RE; RE2 shares Java's
    leftmost-first alternation semantics)::

        CASE WHEN regexp_extract(s, P, 2) <> ''
              AND try_strptime(regexp_extract(s, P, 2)
                               || lpad(regexp_extract(s, P, 3), 2, '0')
                               || lpad(ltrim(regexp_extract(s, P, 4)), 2, '0'),
                               '%y%m%d') IS NOT NULL
             THEN 'delivery' ELSE 'perpetual' END

    (Century mapping differs between the engines for yy ≥ 69, but 19yy and
    20yy agree on leap years, so validity — the only thing used — matches.)
    """
    y = F.regexp_extract(col, CONTRACT_SUFFIX_RE, 2)
    m = F.regexp_extract(col, CONTRACT_SUFFIX_RE, 3)
    d = F.ltrim(F.regexp_extract(col, CONTRACT_SUFFIX_RE, 4))
    canonical = F.concat(y, F.lpad(m, 2, "0"), F.lpad(d, 2, "0"))
    valid = (y != "") & F.try_to_date(canonical, "yyMMdd").isNotNull()
    return F.when(valid, F.lit("delivery")).otherwise(F.lit("perpetual"))


def quantize_embedding(col: Column) -> Column:
    """float array → exact integer array (×1e6, rounded).

    The float element is cast to DOUBLE before the multiply — float32
    arithmetic would round differently between engines. Explicit round()
    (not a decimal cast: DuckDB truncates on double→decimal, Spark rounds).

    DuckDB: ``list_transform(x, e -> CAST(round(CAST(e AS DOUBLE) * 1000000)
    AS BIGINT))``.
    """
    return F.transform(
        col, lambda e: F.round(e.cast("double") * F.lit(float(EMB_SCALE))).cast("long")
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact dot product of two integer arrays (bigint fold, left-to-right).

    DuckDB: ``list_dot_product(qa, qb)`` — exact because all intermediate
    values are integers < 2^53 even when computed in doubles.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_from_quantized(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    """cos = dot / (sqrt(na) * sqrt(nb)) — deterministic given exact ints.

    A zero-norm side has no defined cosine: NULL, matching DuckDB's
    x/0 → NULL where Spark's ANSI division would throw DIVIDE_BY_ZERO.
    NULL fails every threshold WHERE and sorts last under DESC in both
    engines, so degenerate vectors drop out of pair/top-k results
    identically instead of crashing the job."""
    return F.when(
        (norm_a > 0) & (norm_b > 0),
        dot.cast("double")
        / (F.sqrt(norm_a.cast("double")) * F.sqrt(norm_b.cast("double"))),
    )


def global_row_number(
    df,
    order_cols,
    rank_col: str = "rank",
    num_partitions: int | None = None,
):
    """Distributed global 1-based row number over a total order — the
    scale-safe replacement for ``row_number() OVER (ORDER BY ...)``,
    which Catalyst plans as a SINGLE-partition window (every row through
    one task: the one shape that cannot survive a corpus-sized input).

    Classic two-pass offset pattern: range-repartition on the order
    columns (the same distributed sort a global orderBy uses), count
    rows per partition (ONE bounded driver collect — #partitions rows,
    same class as the IVF centroid table), then a narrow Arrow pass
    assigns offset + local position. No window, no single-partition
    stage; wall-clock is one range shuffle plus two narrow scans.

    ``order_cols`` must end in a tie-breaking unique key: ranks then
    depend only on the total order, not on where the range sampler drew
    partition boundaries. The partitioned input is localCheckpoint-ed
    (eager): the count pass and the returned frame read the SAME
    materialized blocks, so the offsets can never disagree with the rank
    pass even for nondeterministic inputs — and the range shuffle runs
    once, not twice. Blocks are released when the checkpointed RDD is
    garbage-collected (ContextCleaner), the same discipline as
    index_cache.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parts = (
        df.repartitionByRange(n_part, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    def _part_counts(batches):
        import pandas as pd

        pid, cnt = None, 0
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["__pid"].iat[0])
                cnt += len(pdf)
        if pid is not None:
            yield pd.DataFrame({"__pid": [pid], "cnt": [cnt]})

    # per-partition counts WITHOUT an aggregation shuffle: one narrow
    # Arrow pass over the (now materialized) cached blocks
    counts = {
        r["__pid"]: r["cnt"]
        for r in parts.select("__pid").mapInPandas(
            _part_counts, "__pid int, cnt long"
        ).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    out_schema = ",".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in parts.schema.fields]
        + [f"{rank_col} long"]
    )

    def number(batches):
        import pandas as pd  # noqa: F401 — Arrow batch interface

        pos = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iat[0])]
            pdf[rank_col] = range(base + pos + 1, base + pos + 1 + len(pdf))
            pos += len(pdf)
            yield pdf

    return parts.mapInPandas(number, out_schema).drop("__pid")


def interleave_bits(a, b, bits: int = 16):
    """Morton/Z-curve interleave of two non-negative ints (low ``bits``
    of each): a pure codegen bit expression — no UDF. Rows close on the
    Z value are close in BOTH dimensions, which is what makes a Z-sorted
    file layout prune on either column's row-group min/max stats."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(
                F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
            )
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i + 1,
            )
        )
    return z


def global_running_sum(
    df,
    order_cols,
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
    return_total: bool = False,
):
    """Distributed INCLUSIVE prefix sum of an integer column over a total
    order — the scale-safe replacement for ``SUM(v) OVER (ORDER BY ...
    ROWS UNBOUNDED PRECEDING)``, which Catalyst plans as a
    SINGLE-partition window (the one shape that cannot survive a
    corpus-sized input). The running-sum sibling of ``global_row_number``:
    range-repartition on the order columns, one bounded driver collect of
    per-partition SUMS (#partitions rows), then a narrow Arrow pass that
    adds each partition's prefix offset to its local cumulative sum.

    ``value_col`` must be integral (the offsets and local cumsums are
    exact int64 adds in any order); ``order_cols`` must end in a unique
    tie-breaking key so the prefix depends only on the total order, not
    on sampled partition boundaries. Same localCheckpoint discipline as
    ``global_row_number``: the sum pass and the output read the SAME
    materialized blocks.

    ``return_total=True`` returns ``(df, total)`` — the grand total is
    the last partition's offset + sum, already known from the bounded
    collect, so callers needing "sum of value_col" (budget fills,
    normalizers) get it WITHOUT a separate corpus aggregate job.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parts = (
        df.repartitionByRange(n_part, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    def _part_sums(batches):
        import pandas as pd

        pid, tot = None, 0
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["__pid"].iat[0])
                tot += int(pdf["__v"].sum())
        if pid is not None:
            yield pd.DataFrame({"__pid": [pid], "tot": [tot]})

    sums = {
        r["__pid"]: r["tot"]
        for r in parts.select(
            "__pid", F.col(value_col).cast("long").alias("__v")
        )
        .mapInPandas(_part_sums, "__pid int, tot long")
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    out_schema = ",".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in parts.schema.fields]
        + [f"{out_col} long"]
    )

    def running(batches):
        import pandas as pd  # noqa: F401 — Arrow batch interface

        carry = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iat[0])]
            csum = pdf[value_col].astype("int64").cumsum()
            pdf[out_col] = base + carry + csum
            carry += int(pdf[value_col].astype("int64").sum())
            yield pdf

    out = parts.mapInPandas(running, out_schema).drop("__pid")
    return (out, acc) if return_total else out


def grouped_running_sum(
    cdf,
    group_cols,
    order_cols,
    value_col: str,
    out_col: str = "running_total",
    total_col: str | None = None,
):
    """Per-group INCLUSIVE prefix sum over a FREQUENCY AGGREGATE — the
    cheap sibling of ``global_running_sum`` for inputs that are already
    a per-group aggregate (``groupBy(group, value).count()`` shapes).

    Contract: ``cdf``'s per-group row count is window-partition-safe —
    bounded by the group's DISTINCT-value count (micro-quantized values,
    integer lengths), not by the corpus row count. Under that contract a
    plain ``SUM(c) OVER (PARTITION BY group ORDER BY value ROWS
    UNBOUNDED PRECEDING)`` is the right plan: ONE shuffle of aggregate
    rows by group, zero driver collects, zero extra jobs — versus
    global_running_sum's range-repartition + bounded-collect + Arrow
    offset pass (~5 s of flat job-count cost that dwarfs tiny inputs).
    Keep ``global_running_sum`` for corpus-sized inputs or a single
    global order (``token_budget_selection``, ``quality_deciles``),
    where a per-group window would concentrate a whole group's fact
    rows in one task.

    ``total_col`` additionally emits the group's grand total on every
    row (an unordered window over the SAME partitioning — no second
    shuffle), saving callers the groupBy + broadcast-join round trip
    they previously needed to recover per-group bounds.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = cdf.withColumn(
        out_col,
        F.sum(value_col).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    if total_col is not None:
        out = out.withColumn(
            total_col, F.sum(value_col).over(Window.partitionBy(*group_cols))
        )
    return out
