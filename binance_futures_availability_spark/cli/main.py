"""CLI entry point — mirrors the reference command tree.

Parity: reference cli/main.py:31-72 (argparse root, --version/--verbose,
help on no command, exit codes) and cli/query.py:21-238 (query
snapshot/timeline/range/analytics {new-listings, delistings, summary},
--json switches, first-10/first-20 display truncation = O5).

The fact-table source comes from --table PATH (a parquet
daily_availability table) or --sf-dir DIR (driver testdata layout),
falling back to $BFA_TABLE_PATH / $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from ..api import AnalyticsQueries, Engine, SnapshotQueries, TimelineQueries
from ..session import get_session
from ..sources import writer

__version__ = "0.2.0"


def _engine(args: argparse.Namespace) -> Engine:
    table = args.table or os.environ.get("BFA_TABLE_PATH")
    sf_dir = args.sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR")
    if table:
        return Engine(table_path=table)
    if sf_dir:
        return Engine(sf_dir=sf_dir)
    raise SystemExit(
        "no fact-table source: pass --table/--sf-dir or set "
        "$BFA_TABLE_PATH / $SPARK_GRAFT_SF_DIR"
    )


def cmd_snapshot(args: argparse.Namespace) -> int:
    with SnapshotQueries(_engine(args)) as q:
        results = q.get_available_symbols_on_date(args.date)
    if args.json:
        print(json.dumps(results, indent=2, default=str))
    else:
        print(f"Available symbols on {args.date}: {len(results)}")
        for r in results[:10]:
            print(f"  - {r['symbol']} ({r['file_size_bytes']} bytes)")
        if len(results) > 10:
            print(f"  ... and {len(results) - 10} more")
    return 0


def cmd_timeline(args: argparse.Namespace) -> int:
    with TimelineQueries(_engine(args)) as q:
        timeline = q.get_symbol_availability_timeline(args.symbol)
        if args.json:
            print(json.dumps(timeline, indent=2, default=str))
        else:
            print(
                f"Availability timeline for {args.symbol}: {len(timeline)} days"
            )
            print(f"  First available: {q.get_symbol_first_listing_date(args.symbol)}")
            print(f"  Last available: {q.get_symbol_last_available_date(args.symbol)}")
            print(f"  Total days: {len(timeline)}")
    return 0


def cmd_range(args: argparse.Namespace) -> int:
    with SnapshotQueries(_engine(args)) as q:
        symbols = q.get_symbols_in_date_range(args.start_date, args.end_date)
    if args.json:
        print(json.dumps(symbols, indent=2))
    else:
        print(
            f"Symbols available {args.start_date} to {args.end_date}: "
            f"{len(symbols)}"
        )
        for s in symbols[:20]:
            print(f"  - {s}")
        if len(symbols) > 20:
            print(f"  ... and {len(symbols) - 20} more")
    return 0


def cmd_new_listings(args: argparse.Namespace) -> int:
    with AnalyticsQueries(_engine(args)) as q:
        syms = q.detect_new_listings(args.date)
    print(f"New listings on {args.date}: {len(syms)}")
    for s in syms:
        print(f"  - {s}")
    return 0


def cmd_delistings(args: argparse.Namespace) -> int:
    with AnalyticsQueries(_engine(args)) as q:
        syms = q.detect_delistings(args.date)
    print(f"Delistings on {args.date}: {len(syms)}")
    for s in syms:
        print(f"  - {s}")
    return 0


def cmd_summary(args: argparse.Namespace) -> int:
    eng = _engine(args)
    rows = [
        r.asDict()
        for r in writer.refresh_symbol_counts(eng.table())
        .orderBy("date", ascending=False)
        .limit(10)
        .collect()
    ]
    if args.json:
        print(json.dumps(rows, indent=2, default=str))
    else:
        print("Daily symbol counts (latest 10):")
        for r in rows:
            print(
                f"  {r['date']}: {r['total_symbols']} total, "
                f"{r['available_count']} available"
            )
    return 0


def _print_rows(df, args, label: str, limit: int = 10) -> int:
    rows = [r.asDict() for r in df.limit(limit + 1).collect()]
    more = len(rows) > limit
    rows = rows[:limit]
    if args.json:
        print(json.dumps(rows, indent=2, default=str))
    else:
        print(label)
        for r in rows:
            print("  " + ", ".join(f"{k}={v}" for k, v in r.items()))
        if more:
            print(f"  ... (showing first {limit})")
    return 0


def cmd_dedup(args: argparse.Namespace) -> int:
    from ..operators import dedup

    spark = get_session("bfa-cli")
    docs = spark.read.parquet(args.docs)
    if args.method == "exact":
        df = dedup.exact_duplicates(docs)
    elif args.method == "jaccard":
        df = dedup.ngram_jaccard_pairs(docs, args.threshold)
    elif args.method == "minhash":
        df = dedup.minhash_lsh_pairs(docs, args.threshold)
    else:  # simhash
        df = dedup.simhash_pairs(docs, args.max_hamming)
    return _print_rows(df, args, f"{args.method} duplicates:")


def cmd_text(args: argparse.Namespace) -> int:
    from ..operators import textops

    spark = get_session("bfa-cli")
    docs = spark.read.parquet(args.docs)
    if args.op == "source-overlap":
        return _print_rows(
            textops.source_overlap(docs, strata_col=args.strata).orderBy(
                "stratum_a", "stratum_b"
            ),
            args,
            "source overlap:",
        )
    if args.op == "keyterms":
        return _print_rows(
            textops.doc_keyterms(docs).orderBy("doc_id", "rnk"),
            args,
            "keyterms:",
        )
    if args.op == "lm-score":
        return _print_rows(
            textops.bigram_lm_scores(docs).orderBy("doc_id"),
            args,
            "bigram-LM scores:",
        )
    op = {
        "tokens": textops.token_counts,
        "quality": textops.quality_scores,
        "language": textops.language_id,
        "fingerprints": textops.fingerprints,
        "deciles": textops.quality_deciles,
    }[args.op]
    # display ordering belongs to the presentation surface: with the
    # _print_rows limit this collapses to TakeOrdered (no corpus-wide sort)
    return _print_rows(op(docs).orderBy("doc_id"), args, f"{args.op}:")


def cmd_similarity(args: argparse.Namespace) -> int:
    from ..operators import similarity

    spark = get_session("bfa-cli")
    if args.op == "index-build":
        if not args.index:
            raise SystemExit("--index PATH is required for index-build")
        emb = spark.read.parquet(args.embeddings)
        similarity.write_ivf_index(emb, args.index)
        print(f"IVF index written: {args.index}")
        return 0
    if args.op == "index-topk":
        if not args.index:
            raise SystemExit("--index PATH is required for index-topk")
        df = similarity.ivf_topk_indexed(
            spark, args.index, args.query_id, args.k
        )
        return _print_rows(df, args, f"{args.op}:")
    emb = spark.read.parquet(args.embeddings)
    if args.op == "topk":
        df = similarity.ann_topk(emb, args.query_id, args.k)
    elif args.op == "ivf-topk":
        df = similarity.ivf_topk(emb, args.query_id, args.k)
    elif args.op == "pairs":
        df = similarity.lsh_cosine_pairs(emb, args.threshold)
    elif args.op == "pairs-multi":
        df = similarity.lsh_cosine_pairs_multi(emb, args.threshold)
    elif args.op == "kmeans":
        df = similarity.kmeans_cells(emb).orderBy("vec_id")
    elif args.op == "semantic-dedup":
        df = similarity.semantic_dedup_survivors(emb, args.threshold).orderBy(
            "vec_id"
        )
    else:  # dedup
        df = similarity.embedding_dedup_survivors(emb, args.threshold).orderBy(
            "vec_id"
        )
    return _print_rows(df, args, f"{args.op}:")


def cmd_sample(args: argparse.Namespace) -> int:
    from ..operators import sampling

    spark = get_session("bfa-cli")
    docs = spark.read.parquet(args.docs)
    if args.op == "stratified":
        rates = {}
        for spec in args.rate or []:
            stratum, _, rate = spec.partition("=")
            rates[stratum] = int(rate)
        df = sampling.stratified_sample(
            docs, rates, args.default_rate, strata_col=args.strata
        )
    elif args.op == "cap":
        df = sampling.stratum_cap(docs, args.k, strata_col=args.strata)
    elif args.op == "mixture":
        df = sampling.mixture_weights(docs, strata_col=args.strata)
    elif args.op == "apply-mixture":
        df = sampling.apply_mixture(
            docs, args.budget_tokens, strata_col=args.strata
        )
    else:  # length-stats
        df = sampling.length_stats(docs, strata_col=args.strata)
    return _print_rows(df, args, f"{args.op}:")


def cmd_scrub(args: argparse.Namespace) -> int:
    from ..operators import textops

    spark = get_session("bfa-cli")
    docs = spark.read.parquet(args.docs)
    return _print_rows(
        textops.pii_scrub(docs).orderBy("doc_id"), args, "pii scrub:"
    )


def cmd_events(args: argparse.Namespace) -> int:
    from ..operators import events as ev

    spark = get_session("bfa-cli")
    df_in = spark.read.parquet(args.events)
    if args.op == "windows":
        df = ev.window_counts(df_in, args.duration)
    elif args.op == "sessions":
        df = ev.sessionize(df_in, args.gap_minutes)
    elif args.op == "asof":
        df = ev.asof_pairs(df_in)
    elif args.op == "funnel":
        df = ev.funnel(df_in, tuple(args.steps.split(",")))
    elif args.op == "topk-users":
        df = ev.window_topk_users(df_in, args.k)
    elif args.op == "spikes":
        df = ev.spike_detection(df_in, args.k)
    else:  # retention
        df = ev.retention_cohorts(df_in)
    return _print_rows(df, args, f"{args.op}:")


def cmd_curate(args: argparse.Namespace) -> int:
    from ..operators import textops

    spark = get_session("bfa-cli")
    docs = spark.read.parquet(args.docs)
    if args.op == "curate":
        df = textops.curate_corpus(docs, args.min_quality).orderBy("doc_id")
    elif args.op == "chunk":
        df = textops.chunk_documents(
            docs, args.chunk_tokens, args.overlap
        ).orderBy("doc_id", "chunk_id")
    elif args.op == "boilerplate":
        df = textops.boilerplate_chunks(
            docs, args.chunk_tokens, args.min_docs
        ).orderBy("chunk_text")
    else:  # scrub-boilerplate
        df = textops.scrub_boilerplate(
            docs, args.chunk_tokens, args.min_docs
        ).orderBy("doc_id")
    return _print_rows(df, args, f"{args.op}:")


def cmd_maintain(args: argparse.Namespace) -> int:
    from ..sources import writer

    spark = get_session("bfa-cli")
    if args.op == "stats":
        return _print_rows(
            writer.partition_file_stats(spark, args.table, args.partition_col)
            .orderBy(args.partition_col),
            args,
            "partition stats:",
        )
    if args.op == "compact":
        done = writer.compact_partitions(
            spark, args.table, args.partition_col, args.max_files,
            args.files_per_partition,
        )
        print(f"compacted {len(done)} partitions: {sorted(map(str, done))}")
        return 0
    if args.op == "expire":
        if not args.before:
            raise SystemExit("--before VALUE is required for expire")
        removed = writer.expire_partitions(
            spark, args.table, args.before, args.partition_col
        )
        print(f"expired {len(removed)} partitions: {removed}")
        return 0
    # zorder
    if not (args.col_a and args.col_b):
        raise SystemExit("--col-a and --col-b are required for zorder")
    df = spark.read.parquet(args.table)
    writer.write_zordered(df, args.output or args.table + ".zordered",
                          args.col_a, args.col_b, args.n_files)
    print("z-ordered copy written")
    return 0


def cmd_update(args: argparse.Namespace) -> int:
    """One cron tick of the composed daily-update pipeline (update.py —
    reference .github/scripts/run_daily_update.py): lookback window →
    batch probe → UPSERT → warnings-only validation → optional rankings
    append. Warnings never fail the run (exit stays 0)."""
    import datetime as dt

    from .. import update as update_mod
    from ..ingest import rest

    table = args.table or os.environ.get("BFA_TABLE_PATH")
    if not table:
        raise SystemExit("update needs a writable fact table: pass --table")
    spark = get_session("bfa-cli")
    if args.symbols:
        symbols = [s for s in args.symbols.split(",") if s]
    elif args.symbols_file:
        symbols = rest.load_symbols(args.symbols_file, args.contract_type)
    elif writer.table_exists(spark, table):
        symbols = [
            r["symbol"]
            for r in spark.read.parquet(table).select("symbol").distinct().collect()
        ]
    else:
        raise SystemExit(
            "update needs a symbol universe: pass --symbols/--symbols-file "
            "or point --table at an existing fact table"
        )
    summary = update_mod.run_daily_update(
        spark,
        table,
        sorted(symbols),
        lookback_days=args.lookback_days,
        today=dt.date.fromisoformat(args.today) if args.today else None,
        rankings_path=args.rankings,
        max_workers=args.max_workers,
        validate=not args.no_validate,
        release_path=args.release,
    )
    if args.json:
        print(json.dumps(summary, indent=2, default=str))
    else:
        lo, hi = summary["window"]
        print(f"Probed {summary['records']} records for {lo}..{hi}:")
        print(f"  available: {summary['available']}")
        print(f"  unavailable: {summary['unavailable']}")
        report = summary.get("validation")
        if report is not None:
            flag = "warnings" if report["has_warnings"] else "clean"
            print(f"  validation: {flag}")
        if "rankings_appended" in summary:
            print(f"  rankings appended: {summary['rankings_appended']}")
    return 0


def cmd_gaps(args: argparse.Namespace) -> int:
    """Symbol-gap detection (reference scripts/operations/
    detect_symbol_gaps.py:89-125): discovered symbols with NO row in the
    fact table — the set-diff the ops runbook checks before a backfill.
    The discovered universe comes from a symbols.json artifact
    (``discover --out``) or an explicit ``--symbols`` list; the diff is
    ``validation.cross_check.symbols_missing_from_db`` (broadcast
    left_anti over the distinct symbol universes). Exit 1 with
    ``--strict`` when gaps exist, else always 0 (warnings-only, like
    ``validate``)."""
    from ..ingest import rest
    from ..validation import cross_check

    eng = _engine(args)
    if args.symbols:
        discovered = [s for s in args.symbols.split(",") if s]
    elif args.symbols_file:
        discovered = rest.load_symbols(args.symbols_file, args.contract_type)
    else:
        raise SystemExit("gaps needs --symbols or --symbols-file")
    disc_df = eng.spark.createDataFrame(
        [(s,) for s in sorted(set(discovered))], "symbol string"
    )
    missing = [
        r["symbol"]
        for r in cross_check.symbols_missing_from_db(
            disc_df, eng.table()
        ).collect()
    ]
    if args.json:
        print(
            json.dumps(
                {
                    "discovered": len(set(discovered)),
                    "missing_count": len(missing),
                    "missing": missing,
                }
            )
        )
    else:
        print(
            f"Discovered symbols: {len(set(discovered))}; "
            f"missing from DB: {len(missing)}"
        )
        for s in missing[:20]:
            print(f"  - {s}")
    return 1 if (missing and args.strict) else 0


def cmd_validate(args: argparse.Namespace) -> int:
    """The three-layer validation trio (update.validate_report — reference
    scripts/operations/validate.py): continuity gaps, incomplete dates,
    optional live cross-check. Warnings-only: always exits 0
    (validate.py:183's trust-human-judgment policy)."""
    from .. import update as update_mod
    from ..ingest import rest

    eng = _engine(args)
    api_symbols = None
    if args.cross_check:
        info = rest.fetch_exchange_info()
        api_symbols = rest.exchange_info_df(eng.spark, info)
    report = update_mod.validate_report(
        eng.table(),
        end_date=args.end_date,
        min_symbols=args.min_symbols,
        api_symbols=api_symbols,
    )
    if args.json:
        print(json.dumps(report, indent=2, default=str))
    else:
        if report.get("empty"):
            print("fact table is empty")
            return 0
        print(f"Missing dates: {len(report['missing_dates'])}")
        for d in report["missing_dates"][:10]:
            print(f"  - {d}")
        print(f"Incomplete dates (<{args.min_symbols} symbols): "
              f"{len(report['incomplete_dates'])}")
        for d, n in report["incomplete_dates"][:10]:
            print(f"  - {d}: {n}")
        if report["cross_check"] is not None:
            cc = report["cross_check"]
            print(f"Cross-check: only_in_db={cc['only_in_db']} "
                  f"only_in_api={cc['only_in_api']} "
                  f"match_pct={cc['match_pct']:.1f}")
        print("warnings" if report["has_warnings"] else "clean")
    return 0


def cmd_discover(args: argparse.Namespace) -> int:
    """Symbol discovery → persisted symbols.json artifact (reference
    discover_symbols.py workflow; read back by ``update --symbols-file``)."""
    from ..ingest import discovery

    spark = get_session("bfa-cli")
    discovered = discovery.discover_classified(spark)
    if args.out:
        payload = discovery.write_symbols_file(args.out, discovered)
        print(
            f"wrote {args.out}: "
            f"{payload['metadata']['perpetual_count']} perpetual, "
            f"{payload['metadata']['delivery_count']} delivery"
        )
        return 0
    if args.json:
        print(json.dumps(discovered, indent=2))
    else:
        for kind in ("perpetual", "delivery"):
            print(f"{kind}: {len(discovered[kind])}")
            for s in discovered[kind][:10]:
                print(f"  - {s}")
    return 0


def cmd_stats(args: argparse.Namespace) -> int:
    """Comprehensive database statistics (reference
    .github/scripts/generate_stats.py + check_database_stats.py): the
    overall block as ONE single-row aggregate, plus per-date symbol
    counts for the most recent N days — anchored to the table's own MAX
    date (deterministic; the reference anchors to wall-clock
    CURRENT_DATE, which never reproduces)."""
    from pyspark.sql import functions as F

    from ..sources import release

    eng = _engine(args)
    da = eng.table()
    overall = release.release_stats(da).collect()[0]
    bounds = da.agg(F.max("date").alias("hi")).collect()[0]
    recent_rows = []
    if bounds["hi"] is not None:
        recent_rows = (
            da.filter(F.col("date") > F.date_sub(F.lit(bounds["hi"]), args.days))
            .groupBy("date")
            .agg(F.countDistinct("symbol").alias("symbol_count"))
            .orderBy(F.col("date").desc())
            .collect()
        )
    if args.json:
        print(
            json.dumps(
                {
                    "overall": {k: overall[k] for k in release.STAT_KEYS},
                    "recent": [
                        {"date": str(r["date"]), "symbol_count": r["symbol_count"]}
                        for r in recent_rows
                    ],
                },
                default=str,
                indent=2,
            )
        )
    else:
        print("Overall Statistics:")
        print(f"  Date Range: {overall['min_date']} to {overall['max_date']}")
        print(f"  Total Dates: {overall['distinct_dates']}")
        print(f"  Total Symbols: {overall['distinct_symbols']}")
        print(f"  Total Records: {overall['total_records']:,}")
        print(f"  Available Files: {overall['available_records']:,}")
        print(f"  Unavailable Files: {overall['unavailable_records']:,}")
        print(f"\nRecent {args.days} Days:")
        for r in recent_rows:
            print(f"  {r['date']}: {r['symbol_count']} symbols")
    return 0


def cmd_release(args: argparse.Namespace) -> int:
    """Build the distributable gzip release artifact (sources/release.py —
    the reference workflow's `gzip -c $DB_PATH` step + sha256 sidecar) and
    print the shipped stats block."""
    from ..sources import release

    eng = _engine(args)
    stats = release.release_database(eng.table(), args.out)
    if args.json:
        print(json.dumps(stats, indent=2, default=str))
    else:
        print(f"wrote {args.out} (+.sha256):")
        for k in release.STAT_KEYS:
            print(f"  {k}: {stats[k]}")
    return 0


def cmd_verify_release(args: argparse.Namespace) -> int:
    """Consistency check of the live table against a published artifact
    (reference verify-database-consistency.py). Exit 1 on divergence —
    unlike `validate`, a release mismatch is an integrity failure, not a
    warning."""
    from ..sources import release

    eng = _engine(args)
    ok, diffs = release.verify_release(
        eng.table(), args.artifact, as_of=args.as_of
    )
    if args.json:
        print(json.dumps({"consistent": ok, "differences": diffs}))
    elif ok:
        print("consistent")
    else:
        print("INCONSISTENT:")
        for d in diffs:
            print(f"  - {d}")
    return 0 if ok else 1


def cmd_publish(args: argparse.Namespace) -> int:
    """Publish a built release artifact to GitHub Releases (the upload half
    of the reference's update-database workflow). Stats for the release
    notes come from the artifact itself — what is described is exactly what
    ships. ``--dry-run`` renders the notes and the upload plan without a
    network dependency."""
    from ..sources import release

    db = release.open_release(args.artifact)
    try:
        stats = release.database_stats(db, as_of=args.as_of)
    finally:
        os.unlink(db)
    as_of = args.as_of or str(stats["max_date"])
    notes = release.render_release_notes(
        stats, repo=args.repo, as_of=as_of, trigger="cli", mode=args.mode
    )
    files = [args.artifact]
    sidecar = f"{args.artifact}.sha256"
    if os.path.exists(sidecar):
        files.append(sidecar)
    if args.dry_run:
        plan = {
            "repo": args.repo,
            "tag": args.tag,
            "files": [os.path.basename(f) for f in files],
            "notes": notes,
        }
        print(json.dumps(plan, indent=2) if args.json else notes)
        return 0
    out = release.publish_release(
        args.repo, files, notes, tag=args.tag
    )
    print(json.dumps(out) if args.json else f"published: {out}")
    return 0


def cmd_warehouse(args: argparse.Namespace) -> int:
    from ..catalog import load_table
    from ..operators import warehouse as wh

    spark = get_session("bfa-cli")
    t = lambda name: load_table(spark, args.dir, name)  # noqa: E731
    if args.report == "pricing":
        df = wh.pricing_summary(t("lineitem"), args.date_to)
    elif args.report == "revenue-by-nation":
        df = wh.revenue_by_nation(
            t("customer"), t("orders"), t("lineitem"), t("nation"),
            t("region"), args.date_from, args.date_to,
        )
    elif args.report == "promo":
        df = wh.promo_revenue(
            t("lineitem"), t("part"), args.date_from, args.date_to
        )
    elif args.report == "shipping-priority":
        df = wh.shipping_priority(
            t("customer"), t("orders"), t("lineitem"),
            args.segment, args.date_to, args.k,
        )
    elif args.report == "returned-items":
        df = wh.returned_item_customers(
            t("customer"), t("orders"), t("lineitem"), t("nation"),
            args.date_from, args.date_to, args.k,
        )
    else:  # large-volume
        df = wh.large_volume_customers(
            t("customer"), t("orders"), t("lineitem"), args.min_quantity
        )
    return _print_rows(df, args, f"{args.report}:")


def _add_source_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--table", help="parquet daily_availability table path")
    p.add_argument("--sf-dir", help="testdata dir (derived fact table)")
    p.add_argument("--json", action="store_true", help="Output as JSON")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="bfa-spark",
        description=(
            "Binance Futures Availability engine (PySpark) — query the "
            "daily availability fact table"
        ),
    )
    parser.add_argument(
        "--version", action="version", version=f"bfa-spark {__version__}"
    )
    parser.add_argument("--verbose", "-v", action="store_true")
    sub = parser.add_subparsers(dest="command")

    query = sub.add_parser("query", help="Query availability database")
    qsub = query.add_subparsers(dest="query_command")

    p = qsub.add_parser("snapshot", help="Available symbols on a date")
    p.add_argument("date")
    _add_source_args(p)
    p.set_defaults(func=cmd_snapshot)

    p = qsub.add_parser("timeline", help="Availability timeline for a symbol")
    p.add_argument("symbol")
    _add_source_args(p)
    p.set_defaults(func=cmd_timeline)

    p = qsub.add_parser("range", help="Symbols available in a date range")
    p.add_argument("start_date")
    p.add_argument("end_date")
    _add_source_args(p)
    p.set_defaults(func=cmd_range)

    analytics_p = qsub.add_parser("analytics", help="Analytics queries")
    asub = analytics_p.add_subparsers(dest="analytics_command")

    p = asub.add_parser("new-listings", help="New listings on a date")
    p.add_argument("date")
    _add_source_args(p)
    p.set_defaults(func=cmd_new_listings)

    p = asub.add_parser("delistings", help="Delistings on a date")
    p.add_argument("date")
    _add_source_args(p)
    p.set_defaults(func=cmd_delistings)

    p = asub.add_parser("summary", help="Daily symbol counts")
    _add_source_args(p)
    p.set_defaults(func=cmd_summary)

    pipe = sub.add_parser(
        "pipeline", help="LLM-data-pipeline operators (documents/embeddings)"
    )
    psub = pipe.add_subparsers(dest="pipeline_command")

    p = psub.add_parser("dedup", help="Near/exact duplicate detection")
    p.add_argument("docs", help="documents parquet path")
    p.add_argument(
        "--method",
        choices=["exact", "jaccard", "minhash", "simhash"],
        default="exact",
    )
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--max-hamming", type=int, default=3)
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_dedup)

    p = psub.add_parser("text", help="Text analysis")
    p.add_argument("docs", help="documents parquet path")
    p.add_argument(
        "--op",
        choices=[
            "tokens",
            "quality",
            "language",
            "fingerprints",
            "deciles",
            "source-overlap",
            "keyterms",
            "lm-score",
        ],
        default="tokens",
    )
    p.add_argument("--strata", default="source")
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_text)

    p = psub.add_parser("similarity", help="Embedding similarity search")
    p.add_argument("embeddings", help="embeddings parquet path")
    p.add_argument(
        "--op",
        choices=[
            "topk",
            "ivf-topk",
            "pairs",
            "pairs-multi",
            "dedup",
            "kmeans",
            "semantic-dedup",
            "index-build",
            "index-topk",
        ],
        default="topk",
    )
    p.add_argument("--query-id", type=int, default=0)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--threshold", type=float, default=0.95)
    p.add_argument(
        "--index", help="on-disk IVF index path (index-build / index-topk)"
    )
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_similarity)

    p = psub.add_parser("sample", help="Corpus sampling / data mixing")
    p.add_argument("docs", help="documents parquet path")
    p.add_argument(
        "--op",
        choices=["stratified", "cap", "mixture", "apply-mixture", "length-stats"],
        default="mixture",
    )
    p.add_argument("--budget-tokens", type=int, default=1_000_000)
    p.add_argument(
        "--rate",
        action="append",
        metavar="STRATUM=PER10K",
        help="per-stratum keep rate (repeatable), e.g. en=2500",
    )
    p.add_argument("--default-rate", type=int, default=10_000)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--strata", default="lang")
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_sample)

    p = psub.add_parser("curate", help="Curation: end-to-end / chunking / boilerplate")
    p.add_argument("docs", help="documents parquet path")
    p.add_argument(
        "--op",
        choices=["curate", "chunk", "boilerplate", "scrub-boilerplate"],
        default="curate",
    )
    p.add_argument("--min-quality", type=float, default=0.25)
    p.add_argument("--chunk-tokens", type=int, default=8)
    p.add_argument("--overlap", type=int, default=0)
    p.add_argument("--min-docs", type=int, default=2)
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_curate)

    p = psub.add_parser("scrub", help="PII redaction")
    p.add_argument("docs", help="documents parquet path")
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_scrub)

    p = sub.add_parser(
        "update",
        help="Daily-update pipeline: probe -> upsert -> validate -> rankings",
    )
    p.add_argument("--table", help="writable fact table path (or $BFA_TABLE_PATH)")
    p.add_argument("--symbols", help="comma-separated symbol universe")
    p.add_argument("--symbols-file", help="symbols.json artifact (see discover)")
    p.add_argument(
        "--contract-type",
        choices=["perpetual", "delivery", "all"],
        default="perpetual",
        help="which symbols.json section to probe",
    )
    p.add_argument("--lookback-days", type=int, default=1)
    p.add_argument("--today", help="anchor date YYYY-MM-DD (default: today)")
    p.add_argument("--rankings", help="rankings archive path to append to")
    p.add_argument(
        "--release",
        help="refresh this gzip .duckdb release artifact after the update",
    )
    p.add_argument("--max-workers", type=int, default=150)
    p.add_argument("--no-validate", action="store_true")
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_update)

    p = sub.add_parser(
        "validate", help="Warnings-only validation report (always exit 0)"
    )
    _add_source_args(p)
    p.add_argument("--min-symbols", type=int, default=5)
    p.add_argument("--end-date", help="continuity end date (default max-3d)")
    p.add_argument(
        "--cross-check",
        action="store_true",
        help="also cross-check against the live exchangeInfo symbol set",
    )
    p.set_defaults(func=cmd_validate)

    p = sub.add_parser(
        "discover", help="Discover symbols from the S3 listing"
    )
    p.add_argument("--out", help="write the symbols.json artifact here")
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_discover)

    p = sub.add_parser(
        "gaps", help="Discovered symbols missing from the fact table"
    )
    _add_source_args(p)
    p.add_argument("--symbols", help="comma-separated discovered symbols")
    p.add_argument("--symbols-file", help="symbols.json artifact to diff")
    p.add_argument(
        "--contract-type",
        choices=["perpetual", "delivery", "all"],
        default="all",
    )
    p.add_argument(
        "--strict", action="store_true", help="exit 1 when gaps exist"
    )
    p.set_defaults(func=cmd_gaps)

    p = sub.add_parser(
        "stats", help="Comprehensive database statistics"
    )
    _add_source_args(p)
    p.add_argument("--days", type=int, default=7, help="recent window size")
    p.set_defaults(func=cmd_stats)

    p = sub.add_parser(
        "release", help="Build the gzip .duckdb release artifact (+sha256)"
    )
    _add_source_args(p)
    p.add_argument("--out", required=True, help="artifact path (.duckdb.gz)")
    p.set_defaults(func=cmd_release)

    p = sub.add_parser(
        "verify-release",
        help="Check the live table against a release artifact (exit 1 on divergence)",
    )
    _add_source_args(p)
    p.add_argument("--artifact", required=True, help="release .duckdb.gz path")
    p.add_argument("--as-of", help="expected most-recent update date YYYY-MM-DD")
    p.set_defaults(func=cmd_verify_release)

    p = sub.add_parser(
        "publish",
        help="Publish a release artifact (+sidecar) to GitHub Releases",
    )
    p.add_argument("--artifact", required=True, help="release .duckdb.gz path")
    p.add_argument("--repo", required=True, help="owner/name")
    p.add_argument("--tag", default="latest", help="rolling release tag")
    p.add_argument("--mode", default="daily", help="update mode for the notes")
    p.add_argument("--as-of", help="notes date; default = artifact max_date")
    p.add_argument(
        "--dry-run",
        action="store_true",
        help="render notes + upload plan without network",
    )
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_publish)

    mnt = sub.add_parser("maintain", help="Table maintenance (stats/compact/expire/zorder)")
    msub = mnt.add_subparsers(dest="maintain_command")
    p = msub.add_parser("run", help="Run a maintenance operation")
    p.add_argument("table", help="partitioned parquet table path")
    p.add_argument(
        "--op", choices=["stats", "compact", "expire", "zorder"], default="stats"
    )
    p.add_argument("--partition-col", default="date")
    p.add_argument("--max-files", type=int, default=1)
    p.add_argument("--files-per-partition", type=int, default=1)
    p.add_argument("--before", help="expire partitions with value < BEFORE")
    p.add_argument("--col-a")
    p.add_argument("--col-b")
    p.add_argument("--n-files", type=int, default=8)
    p.add_argument("--output", help="zorder output path (default <table>.zordered)")
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_maintain)

    whp = sub.add_parser("warehouse", help="Warehouse join reports (TPC-H-family)")
    wsub = whp.add_subparsers(dest="warehouse_command")
    p = wsub.add_parser("report", help="Run a join report over a table dir")
    p.add_argument("dir", help="directory holding the warehouse parquet tables")
    p.add_argument(
        "--report",
        choices=[
            "pricing",
            "revenue-by-nation",
            "promo",
            "shipping-priority",
            "returned-items",
            "large-volume",
        ],
        default="pricing",
    )
    p.add_argument("--date-from", default="1996-01-01")
    p.add_argument("--date-to", default="1996-12-31")
    p.add_argument("--segment", default="BUILDING")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--min-quantity", type=float, default=200.0)
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_warehouse)

    evp = sub.add_parser("events", help="Event-stream analytics")
    esub = evp.add_subparsers(dest="events_command")
    p = esub.add_parser("analyze", help="Windowed / behavioral analytics")
    p.add_argument("events", help="events parquet path")
    p.add_argument(
        "--op",
        choices=[
            "windows",
            "sessions",
            "asof",
            "funnel",
            "topk-users",
            "retention",
            "spikes",
        ],
        default="windows",
    )
    p.add_argument("--duration", default="1 hour")
    p.add_argument("--gap-minutes", type=int, default=30)
    p.add_argument("--steps", default="view,click,purchase")
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--json", action="store_true")
    p.set_defaults(func=cmd_events)

    return parser


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if not getattr(args, "func", None):
        parser.print_help()
        return 1
    try:
        return args.func(args)
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001 — CLI boundary (reference main.py:72-77)
        print(f"Command failed: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
