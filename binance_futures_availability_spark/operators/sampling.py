"""Corpus sampling and data-mixing operators for training pipelines.

North-star extension operators (no reference counterpart — SURVEY.md §2.10
family): deterministic stratified sampling, per-stratum capping,
temperature-based mixture weights, and exact length statistics. These are
the knobs a pretraining-data pipeline turns AFTER dedup/quality filtering:
how much of each language/domain goes into the mix, and with what weight.

Determinism discipline (same as corpus_split): every sampling decision is a
PURE FUNCTION of (salt, id) via the md5-derived 60-bit hash — stable across
runs, machines, partitionings, and engines; the DuckDB oracles reproduce
each operator bit-for-bit. Every emitted number is an integer or an
integer ratio, so value-hash gates pass exactly (no float reduction order
anywhere; the one ``sqrt`` is IEEE-754 correctly rounded on every engine
and immediately floored to an integer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import md5_int60, token_count

#: hash-space denominator for sampling rates (per-ten-thousand)
RATE_DENOM = 10_000


def _bucket(id_col: str, salt: str):
    return (
        md5_int60(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")))
        % RATE_DENOM
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    default_rate: int = RATE_DENOM,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a document iff
    ``hash(salt, id) % 10000 < rate(stratum)`` — (id, stratum) of survivors.

    ``rates`` maps stratum value → keep-rate in [0, 10000] per-mille-of-ten
    (5000 = keep half); unlisted strata use ``default_rate``. Because the
    keep decision ignores everything but (salt, id), resampling with a
    higher rate yields a SUPERSET of the lower-rate sample (nested
    samples — the property ablation studies need), and appending new
    documents never flips old decisions.

    Scale shape: a narrow filter projection — zero shuffles, scan-speed,
    and the rate predicate prunes (lang/source)-partitioned storage before
    the hash is ever computed for strata at rate 0.
    """
    for stratum, rate in rates.items():
        if not (0 <= rate <= RATE_DENOM):
            raise ValueError(f"rate for {stratum!r} outside [0, {RATE_DENOM}]: {rate}")
    if not (0 <= default_rate <= RATE_DENOM):
        raise ValueError(f"default_rate outside [0, {RATE_DENOM}]: {default_rate}")
    rate_expr = F.lit(default_rate)
    for stratum, rate in sorted(rates.items()):
        rate_expr = F.when(F.col(strata_col) == stratum, F.lit(rate)).otherwise(
            rate_expr
        )
    return docs.filter(_bucket(id_col, salt) < rate_expr).select(id_col, strata_col)


def stratum_cap(
    docs: DataFrame,
    k: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap-v1",
) -> DataFrame:
    """Per-stratum hard cap: the ``k`` documents per stratum with the
    smallest ``hash(salt, id)`` — (id, stratum, sample_rank).

    The hash order makes the cap a uniform random-but-deterministic choice
    (id tie-break for the astronomically unlikely 60-bit collision). This
    is domain capping — bounding any one crawl domain's contribution so a
    single giant source can't dominate the mixture.

    Scale shape: one shuffle on the stratum key for the row_number window.
    A pathologically hot stratum puts its rows in one task; at 100 TB,
    pre-filter with ``stratified_sample`` at rate ≈ margin · k/|stratum|
    first (nested-sample determinism makes the two-phase result exact as
    long as the pre-filter keeps ≥ k rows), then apply the exact cap to
    the survivors.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    h = md5_int60(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.select(F.col(id_col), F.col(strata_col), h.alias("_h"))
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
        .drop("_h")
    )


def mixture_weights(
    docs: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    temperature_sqrt: bool = True,
) -> DataFrame:
    """Per-stratum mixture weights for data mixing:
    (stratum, n_docs, total_tokens, scaled_tokens, weight_ppm).

    ``temperature_sqrt`` applies the standard temperature-smoothed mixing
    at τ = 0.5 — weight ∝ tokens^0.5 — which upweights small domains
    relative to proportional mixing (the multilingual-corpus recipe).
    The scaled size is ``floor(sqrt(total_tokens))``: IEEE sqrt is
    correctly rounded and total_tokens < 2^53, so the integer result is
    engine-exact. Weights are emitted as integer parts-per-million via
    integer division — no float reduction anywhere, so the oracle gate
    hashes match bit-for-bit.

    Scale shape: one partial-agg shuffle on the stratum key (map-side
    combine over the token counts); the ppm normalization runs over the
    stratum-count-sized aggregate (dozens to thousands of rows), where the
    unpartitioned window is free.
    """
    n_tok = token_count(F.col(text_col))
    base = docs.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).cast("long").alias("total_tokens"),
    )
    scaled = (
        F.floor(F.sqrt(F.col("total_tokens").cast("double"))).cast("long")
        if temperature_sqrt
        else F.col("total_tokens")
    )
    base = base.withColumn("scaled_tokens", scaled)
    total = F.sum("scaled_tokens").over(Window.partitionBy())
    return base.select(
        strata_col,
        "n_docs",
        "total_tokens",
        "scaled_tokens",
        F.expr("scaled_tokens * 1000000").cast("long").alias("_num"),
        total.alias("_den"),
    ).select(
        strata_col,
        "n_docs",
        "total_tokens",
        "scaled_tokens",
        F.expr("_num div _den").cast("long").alias("weight_ppm"),
    )


def length_stats(
    docs: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact per-stratum token-length statistics:
    (stratum, n_docs, min_tokens, max_tokens, median_tokens_x2).

    The median is emitted DOUBLED (sum of the one or two middle values in
    (length, id) order) so it stays an integer — exact on every engine,
    no ``.5`` float. Consumers halve it for display.

    Scale shape: one shuffle on the stratum key for the rank window, and
    the final aggregate reuses that partitioning (no second exchange).
    Exact medians put each stratum in one task — the right tool up to
    ~10^8 rows per stratum; beyond that, switch to approx_percentile and
    give up the exact gate (documented trade, same as tfidf's ln).
    """
    n_tok = token_count(F.col(text_col)).cast("int")
    base = docs.select(F.col(id_col), F.col(strata_col), n_tok.alias("n_tokens"))
    w = Window.partitionBy(strata_col).orderBy(
        F.col("n_tokens").asc(), F.col(id_col).asc()
    )
    cnt = Window.partitionBy(strata_col)
    ranked = base.select(
        strata_col,
        "n_tokens",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(cnt).alias("_n"),
    )
    # middle positions: floor((n+1)/2) and floor((n+2)/2) — equal when n odd
    lo = F.floor((F.col("_n") + 1) / 2)
    hi = F.floor((F.col("_n") + 2) / 2)
    mid_contrib = F.when(F.col("_rn") == lo, F.col("n_tokens")).otherwise(
        F.lit(0)
    ) + F.when(F.col("_rn") == hi, F.col("n_tokens")).otherwise(F.lit(0))
    return ranked.groupBy(strata_col).agg(
        F.max("_n").cast("long").alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum(mid_contrib).cast("long").alias("median_tokens_x2"),
    )


def apply_mixture(
    docs: DataFrame,
    budget_tokens: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    temperature_sqrt: bool = True,
    salt: str = "mix-v1",
) -> DataFrame:
    """Materialize a temperature mixture: (id, stratum) — the sampled
    corpus whose per-stratum token mass approximates
    ``budget_tokens · weight_ppm / 10⁶`` under ``mixture_weights``.

    Closes the mixing loop: weights → per-stratum keep rates → the
    deterministic hash sample. The rate derivation is pure integer
    arithmetic (no float anywhere):

        target_s = budget · weight_ppm // 10⁶
        rate_s   = min(10000, target_s · 10000 // total_tokens_s)

    so both engines agree bit-for-bit; strata whose natural mass is
    below target keep everything (rate caps at 10000). The keep decision
    is the same (salt, id) bucket as ``stratified_sample`` — nested,
    growth-stable samples. Scale shape: one partial-agg shuffle builds
    the stratum-count-sized rate table, which broadcasts back over the
    corpus scan; the sample itself is a narrow filter.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive: {budget_tokens}")
    w = mixture_weights(docs, strata_col, text_col, temperature_sqrt)
    target = F.expr(f"({budget_tokens} * weight_ppm) div 1000000")
    rates = w.select(
        F.col(strata_col),
        target.alias("__target"),
        F.col("total_tokens"),
    ).select(
        strata_col,
        F.least(
            F.lit(RATE_DENOM).cast("long"),
            F.expr("(__target * 10000) div total_tokens"),
        ).alias("__rate"),
    )
    return (
        docs.join(F.broadcast(rates), strata_col)
        .filter(_bucket(id_col, salt) < F.col("__rate"))
        .select(id_col, strata_col)
    )
