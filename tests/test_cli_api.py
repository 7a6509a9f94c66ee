"""CLI + Python API smoke tests (reference tests/test_cli/test_commands.py
shape, run in-process against a parquet fixture so no per-test JVM spawn)."""

from __future__ import annotations

import json

import pytest

from binance_futures_availability_spark.api import (
    AnalyticsQueries,
    Engine,
    SnapshotQueries,
    TimelineQueries,
    VolumeQueries,
)
from binance_futures_availability_spark.cli.main import main


@pytest.fixture(scope="module")
def table_path(spark, populated_da, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "fact")
    populated_da.write.parquet(path)
    return path


@pytest.fixture()
def engine(spark, table_path):
    return Engine(table_path=table_path, spark=spark)


# --------------------------------------------------------------- Python API


def test_snapshot_api(engine):
    with SnapshotQueries(engine) as q:
        rows = q.get_available_symbols_on_date("2024-01-15")
    assert [r["symbol"] for r in rows] == ["BTCUSDT", "NEWUSDT"]
    assert rows[0]["file_size_bytes"] == 1024


def test_timeline_api(engine):
    with TimelineQueries(engine) as q:
        tl = q.get_symbol_availability_timeline("ETHUSDT")
        assert len(tl) == 3
        assert q.get_symbol_first_listing_date("ETHUSDT").isoformat() == "2024-01-13"
        assert q.get_symbol_last_available_date("ETHUSDT").isoformat() == "2024-01-14"


def test_analytics_api(engine):
    with AnalyticsQueries(engine) as q:
        assert q.detect_new_listings("2024-01-15") == ["NEWUSDT"]
        assert q.detect_delistings("2024-01-15") == ["ETHUSDT"]
        stats = q.get_stats()
        assert stats["total_records"] == 8
        assert stats["distinct_symbols"] == 3


def test_volume_api(engine):
    with VolumeQueries(engine) as q:
        top = q.get_top_by_volume("2024-01-13", limit=2)
        assert [r["symbol"] for r in top] == ["BTCUSDT", "ETHUSDT"]
        assert top[0]["market_share_pct"] == pytest.approx(90.91)


def test_engine_sql_passthrough(engine):
    df = engine.sql(
        "SELECT COUNT(*) AS n FROM daily_availability WHERE available"
    )
    assert df.collect()[0]["n"] == 6


def test_engine_arrow_fetch(engine):
    tbl = engine.to_arrow(engine.table().select("symbol").distinct())
    assert tbl.num_rows == 3
    assert tbl.column_names == ["symbol"]


def test_engine_export_csv_parquet(engine, tmp_path):
    df = engine.table().select("date", "symbol")
    engine.export(df, str(tmp_path / "out_csv"), fmt="csv")
    engine.export(df, str(tmp_path / "out_pq"), fmt="parquet")
    assert engine.spark.read.option("header", True).csv(
        str(tmp_path / "out_csv")
    ).count() == 8
    assert engine.spark.read.parquet(str(tmp_path / "out_pq")).count() == 8
    with pytest.raises(ValueError):
        engine.export(df, str(tmp_path / "x"), fmt="xml")


def test_engine_remote_parquet_mocked(engine, table_path, tmp_path):
    # single-file archive served over "HTTP" via a mocked fetch
    one = engine.table().coalesce(1)
    archive_dir = tmp_path / "archive"
    one.write.parquet(str(archive_dir))
    part = next(archive_dir.glob("part-*.parquet"))
    df = engine.read_remote_parquet(
        "https://example.invalid/rankings.parquet",
        fetch=lambda url: part.read_bytes(),
    )
    assert df.count() == 8


class _RangeHandler:
    """Minimal range-capable HTTP handler factory (stdlib http.server
    does NOT implement Range; GitHub Releases / S3 do). Records each
    request's method + Range header so tests can assert the reference's
    documented access pattern — partial reads, never a full-file GET."""

    @staticmethod
    def build(
        payload: bytes,
        log: list,
        accept_ranges: bool = True,
        honor_range: bool = True,
    ):
        from http.server import BaseHTTPRequestHandler

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # keep pytest output clean
                pass

            def do_HEAD(self):
                log.append(("HEAD", None))
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                if accept_ranges:
                    self.send_header("Accept-Ranges", "bytes")
                self.end_headers()

            def do_GET(self):
                rng = self.headers.get("Range")
                log.append(("GET", rng))
                if rng and accept_ranges and honor_range:
                    lo, hi = rng.split("=")[1].split("-")
                    lo, hi = int(lo), min(int(hi), len(payload) - 1)
                    body = payload[lo:hi + 1]
                    self.send_response(206)
                    self.send_header(
                        "Content-Range", f"bytes {lo}-{hi}/{len(payload)}"
                    )
                else:
                    body = payload
                    self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        return Handler


def _serve(
    payload: bytes,
    log: list,
    accept_ranges: bool = True,
    honor_range: bool = True,
):
    import threading
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        _RangeHandler.build(payload, log, accept_ranges, honor_range),
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/archive.parquet"


def test_engine_remote_parquet_real_http_range_requests(engine, table_path, tmp_path):
    """S9 over REAL bytes on a localhost range-capable server: the
    driver-fetch path must read footer + requested column chunks via
    Range requests — multiple partial GETs, zero full-file GETs, and a
    column-pruned read moves fewer bytes than the archive."""
    # wide enough that one column chunk is a sliver of the archive
    wide = engine.spark.range(20_000).selectExpr(
        "CAST(id AS STRING) AS symbol",
        "id AS a", "id * 2 AS b", "id * 3 AS c",
        "CAST(id AS DOUBLE) / 7 AS d",
        "repeat(CAST(id AS STRING), 5) AS e",
    ).coalesce(1)
    archive_dir = tmp_path / "archive"
    wide.write.parquet(str(archive_dir))
    payload = next(archive_dir.glob("part-*.parquet")).read_bytes()

    log: list = []
    srv, url = _serve(payload, log)
    try:
        df = engine.read_remote_parquet(url)
        assert df.count() == 20_000
        assert set(wide.columns) == set(df.columns)
        gets = [rng for (m, rng) in log if m == "GET"]
        assert gets and all(rng is not None for rng in gets)  # never full-file

        log.clear()
        pruned = engine.read_remote_parquet(url, columns=["symbol"])
        assert pruned.columns == ["symbol"]
        assert pruned.count() == 20_000
        # range math: partial GETs must not re-fetch the whole archive
        moved = sum(
            int(r.split("-")[1]) - int(r.split("=")[1].split("-")[0]) + 1
            for (m, r) in log
            if m == "GET" and r
        )
        assert 0 < moved < len(payload)
    finally:
        srv.shutdown()


def test_engine_remote_parquet_http_fallback_without_ranges(engine, table_path, tmp_path):
    """A server with no Accept-Ranges support degrades to ONE whole-file
    GET — same rows, no range probing beyond the HEAD."""
    one = engine.table().coalesce(1)
    archive_dir = tmp_path / "archive_nr"
    one.write.parquet(str(archive_dir))
    payload = next(archive_dir.glob("part-*.parquet")).read_bytes()

    log: list = []
    srv, url = _serve(payload, log, accept_ranges=False)
    try:
        df = engine.read_remote_parquet(url)
        assert df.count() == 8
        assert [m for (m, _) in log] == ["HEAD", "GET"]
    finally:
        srv.shutdown()


def test_engine_remote_parquet_lying_range_server(engine, table_path, tmp_path):
    """A server that advertises Accept-Ranges on HEAD but IGNORES the
    Range header on GET (200 full body — real intermediaries do this)
    must still yield correct rows: read() slices the requested window
    out of the full response instead of serving mis-positioned bytes."""
    one = engine.table().coalesce(1)
    archive_dir = tmp_path / "archive_lr"
    one.write.parquet(str(archive_dir))
    payload = next(archive_dir.glob("part-*.parquet")).read_bytes()

    log: list = []
    srv, url = _serve(payload, log, honor_range=False)
    try:
        df = engine.read_remote_parquet(url)
        assert df.count() == 8
        # range requests were issued (the client believed the HEAD)...
        assert any(rng for (m, rng) in log if m == "GET")
    finally:
        srv.shutdown()


def test_http_range_file_accounts_full_body_on_200(table_path, tmp_path, engine):
    """When the server ignores Range and sends the full body, the
    efficiency stats must record the bytes ACTUALLY transferred, not the
    sliced window — under-reporting exactly when the server misbehaves
    hid the inefficiency the counters exist to expose (r12 advice)."""
    from binance_futures_availability_spark.api import _HttpRangeFile

    payload = b"0123456789" * 100
    log: list = []
    srv, url = _serve(payload, log, honor_range=False)
    try:
        f = _HttpRangeFile(url, size=len(payload))
        f.seek(20)
        data = f.read(10)
        assert data == payload[20:30]  # window still correct
        assert f.bytes_fetched == len(payload)  # full transfer recorded
    finally:
        srv.shutdown()


# --------------------------------------------------------------------- CLI


def test_cli_snapshot_text(table_path, capsys):
    rc = main(["query", "snapshot", "2024-01-15", "--table", table_path])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Available symbols on 2024-01-15: 2" in out
    assert "- BTCUSDT (1024 bytes)" in out


def test_cli_snapshot_json(table_path, capsys):
    rc = main(
        ["query", "snapshot", "2024-01-15", "--table", table_path, "--json"]
    )
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert [r["symbol"] for r in rows] == ["BTCUSDT", "NEWUSDT"]


def test_cli_timeline_and_range(table_path, capsys):
    assert main(["query", "timeline", "BTCUSDT", "--table", table_path]) == 0
    out = capsys.readouterr().out
    assert "3 days" in out and "First available: 2024-01-13" in out
    assert main(
        ["query", "range", "2024-01-13", "2024-01-15", "--table", table_path,
         "--json"]
    ) == 0
    assert json.loads(capsys.readouterr().out) == ["BTCUSDT", "ETHUSDT", "NEWUSDT"]


def test_cli_analytics(table_path, capsys):
    assert main(
        ["query", "analytics", "new-listings", "2024-01-15", "--table", table_path]
    ) == 0
    assert "NEWUSDT" in capsys.readouterr().out
    assert main(
        ["query", "analytics", "summary", "--table", table_path, "--json"]
    ) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["date"] == "2024-01-15"
    assert rows[0]["total_symbols"] == 3


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("clidocs") / "docs")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different text about spark engines"),
        ],
        ["doc_id", "text"],
    ).write.parquet(p)
    return p


@pytest.fixture(scope="module")
def emb_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cliemb") / "emb")
    v = [1.0, 0.0, 0.5, 0.25]
    spark.createDataFrame(
        [(0, v, "a"), (1, list(v), "a"), (2, [0.0, 1.0, 0.0, 0.0], "b")],
        ["vec_id", "embedding", "label"],
    ).write.parquet(p)
    return p


def test_cli_pipeline_dedup(docs_path, capsys):
    assert main(["pipeline", "dedup", docs_path, "--method", "exact", "--json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 1 and rows[0]["n_docs"] == 2


def test_cli_pipeline_text(docs_path, capsys):
    assert main(["pipeline", "text", docs_path, "--op", "language", "--json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    langs = {r["doc_id"]: r["predicted_lang"] for r in rows}
    assert langs[1] == "en" and langs[2] == "en"
    assert langs[3] == "unknown"  # no stopword hits in the distinct doc


def test_cli_pipeline_similarity(emb_path, capsys):
    assert (
        main(
            [
                "pipeline", "similarity", emb_path,
                "--op", "dedup", "--threshold", "0.99", "--json",
            ]
        )
        == 0
    )
    rows = json.loads(capsys.readouterr().out)
    assert [r["vec_id"] for r in rows] == [0, 2]


def test_cli_pipeline_similarity_index(emb_path, capsys, tmp_path):
    idx = str(tmp_path / "ivf")
    assert (
        main(["pipeline", "similarity", emb_path, "--op", "index-build",
              "--index", idx]) == 0
    )
    capsys.readouterr()
    assert (
        main(["pipeline", "similarity", emb_path, "--op", "index-topk",
              "--index", idx, "--query-id", "0", "--k", "2", "--json"]) == 0
    )
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 2 and rows[0]["cosine"] >= rows[1]["cosine"]


def test_api_rejects_malformed_date(engine):
    import pytest as _pytest

    from binance_futures_availability_spark.api import SnapshotQueries

    with SnapshotQueries(engine) as q:
        with _pytest.raises(ValueError):
            q.get_available_symbols_on_date("2024-13-45")
        with _pytest.raises(ValueError):
            q.get_available_symbols_on_date("not-a-date")


def test_cli_no_command_prints_help(capsys):
    assert main([]) == 1
    assert "usage:" in capsys.readouterr().out


def test_cli_bad_source_fails(capsys, monkeypatch):
    monkeypatch.delenv("BFA_TABLE_PATH", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    with pytest.raises(SystemExit):
        main(["query", "snapshot", "2024-01-15"])


# ------------------------------------------------- matview query routing


def test_trend_routing_matview_equivalence_and_no_fact_scan(
    spark, engine, table_path, tmp_path_factory
):
    """ADR-0019 routing: after refresh_matview(), Engine.trend() serves
    per-date counts from daily_symbol_counts — same values as the
    fact-table plan, and the routed plan never scans the fact table."""
    from_fact = [r.asDict() for r in engine.trend().collect()]

    mv_path = str(tmp_path_factory.mktemp("mv") / "daily_symbol_counts")
    engine.refresh_matview(mv_path)
    routed = engine.trend()
    assert [r.asDict() for r in routed.collect()] == from_fact

    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert mv_path in plan, plan  # served from the summary parquet
    assert table_path not in plan, plan  # fact table absent from the plan

    # ranged variant routes too, with the range filter pushed to the scan
    ranged = engine.trend(start="2024-01-14")
    assert [r["date"].isoformat() for r in ranged.collect()] == [
        "2024-01-14",
        "2024-01-15",
    ]
    assert table_path not in ranged._jdf.queryExecution().executedPlan().toString()

    # invalidation restores the fact-table path (reference contract:
    # writes refresh/invalidate the summary)
    engine.invalidate_matview()
    back = engine.trend()
    assert table_path in back._jdf.queryExecution().executedPlan().toString()
    assert [r.asDict() for r in back.collect()] == from_fact


def test_trend_routing_in_memory_matview(engine, table_path):
    from_fact = [r.asDict() for r in engine.trend().collect()]
    engine.refresh_matview()  # in-session persisted summary
    routed = engine.trend()
    assert [r.asDict() for r in routed.collect()] == from_fact
    plan = routed._jdf.queryExecution().executedPlan().toString()
    live = plan.split("InMemoryRelation", 1)[0]
    assert "InMemoryTableScan" in live, plan
    assert table_path not in live, plan  # fact scan only in the build plan
    engine.invalidate_matview()


def test_daily_counts_served_from_matview(engine):
    baseline = {
        (r["date"], r["total_symbols"], r["available_count"])
        for r in engine.daily_counts().collect()
    }
    engine.refresh_matview()
    routed = {
        (r["date"], r["total_symbols"], r["available_count"])
        for r in engine.daily_counts().collect()
    }
    assert routed == baseline
    engine.invalidate_matview()


def test_analytics_api_trend_uses_routing(engine):
    with AnalyticsQueries(engine) as q:
        before = q.get_availability_trend()
        engine.refresh_matview()
        after = q.get_availability_trend()
        engine.invalidate_matview()
    assert after == before


@pytest.fixture(scope="module")
def strata_docs_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("clistrata") / "docs")
    spark.createDataFrame(
        [
            (1, "one two three contact bob@example.com now", "en"),
            (2, "vier fuenf sechs sieben acht", "de"),
            (3, "alpha beta gamma delta epsilon", "en"),
        ],
        ["doc_id", "text", "lang"],
    ).write.parquet(p)
    return p


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    import datetime as dt

    p = str(tmp_path_factory.mktemp("clievents") / "events")
    T = dt.datetime
    spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 0), 1, "view", 1.0, "{}"),
            (2, T(2024, 1, 1, 10, 10), 1, "click", 2.0, "{}"),
            (3, T(2024, 1, 1, 12, 0), 1, "view", 3.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(p)
    return p


def test_cli_pipeline_sample_mixture(strata_docs_path, capsys):
    assert (
        main(
            ["pipeline", "sample", strata_docs_path,
             "--op", "mixture", "--strata", "lang", "--json"]
        )
        == 0
    )
    rows = json.loads(capsys.readouterr().out)
    weights = {r["lang"]: r["weight_ppm"] for r in rows}
    assert set(weights) == {"en", "de"}
    assert 999990 <= sum(weights.values()) <= 1000000


def test_cli_pipeline_sample_stratified_rates(strata_docs_path, capsys):
    assert (
        main(
            ["pipeline", "sample", strata_docs_path,
             "--op", "stratified", "--rate", "en=10000",
             "--default-rate", "0", "--strata", "lang", "--json"]
        )
        == 0
    )
    rows = json.loads(capsys.readouterr().out)
    assert {r["doc_id"] for r in rows} == {1, 3}  # de dropped at rate 0


def test_cli_pipeline_scrub(strata_docs_path, capsys):
    assert main(["pipeline", "scrub", strata_docs_path, "--json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    byid = {r["doc_id"]: r for r in rows}
    assert byid[1]["n_email"] == 1 and "<EMAIL>" in byid[1]["text_clean"]
    assert byid[2]["n_email"] == 0


def test_cli_events_sessions(events_path, capsys):
    assert (
        main(
            ["events", "analyze", events_path,
             "--op", "sessions", "--gap-minutes", "30", "--json"]
        )
        == 0
    )
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 2  # the 12:00 view starts a second session


def test_cli_events_funnel(events_path, capsys):
    assert (
        main(
            ["events", "analyze", events_path,
             "--op", "funnel", "--steps", "view,click", "--json"]
        )
        == 0
    )
    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["stage_reached"] == 2


def test_cli_pipeline_apply_mixture(strata_docs_path, capsys):
    assert (
        main(
            ["pipeline", "sample", strata_docs_path,
             "--op", "apply-mixture", "--budget-tokens", "8",
             "--strata", "lang", "--json"]
        )
        == 0
    )
    rows = json.loads(capsys.readouterr().out)
    assert all(r["lang"] in {"en", "de"} for r in rows)


def test_cli_warehouse_reports(capsys):
    from binance_futures_availability_spark.cli.main import main

    d = "/root/testdata/sf0.001"
    assert (
        main(
            ["warehouse", "report", d,
             "--report", "shipping-priority", "--date-to", "1996-06-30",
             "--k", "3", "--json"]
        )
        == 0
    )
    rows = json.loads(capsys.readouterr().out)
    assert 0 < len(rows) <= 3 and "revenue" in rows[0]
    assert (
        main(
            ["warehouse", "report", d,
             "--report", "large-volume", "--min-quantity", "200", "--json"]
        )
        == 0
    )
    rows = json.loads(capsys.readouterr().out)
    assert rows and all(r["sum_qty"] > 200.0 for r in rows)


def test_cli_text_deciles_and_overlap(docs_path, capsys, tmp_path_factory):
    from binance_futures_availability_spark.cli.main import main

    assert main(["pipeline", "text", docs_path, "--op", "deciles", "--json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and {"doc_id", "quality_score", "decile"} <= set(rows[0])
    d2 = str(tmp_path_factory.mktemp("clidocs2") / "docs")
    from binance_futures_availability_spark.session import get_session

    get_session("bfa-cli").createDataFrame(
        [(0, "a b c", "s1"), (1, "b c d", "s2")],
        ["doc_id", "text", "source"],
    ).write.parquet(d2)
    assert main(
        ["pipeline", "text", d2, "--op", "source-overlap", "--json"]
    ) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["n_shared"] == 2


def test_cli_similarity_kmeans_and_semantic(emb_path, capsys):
    from binance_futures_availability_spark.cli.main import main

    assert main(
        ["pipeline", "similarity", emb_path, "--op", "kmeans", "--json"]
    ) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and {"vec_id", "cell"} <= set(rows[0])
    assert main(
        ["pipeline", "similarity", emb_path,
         "--op", "semantic-dedup", "--threshold", "0.99", "--json"]
    ) == 0
    json.loads(capsys.readouterr().out)


def test_cli_events_spikes(events_path, capsys):
    from binance_futures_availability_spark.cli.main import main

    assert main(
        ["events", "analyze", events_path, "--op", "spikes", "--json"]
    ) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and {"event_type", "day", "is_spike"} <= set(rows[0])


def test_cli_curate_family(docs_path, capsys):
    from binance_futures_availability_spark.cli.main import main

    assert main(["pipeline", "curate", docs_path, "--min-quality", "0.1", "--json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and {"doc_id", "split", "n_tokens"} <= set(rows[0])
    assert main(
        ["pipeline", "curate", docs_path, "--op", "chunk",
         "--chunk-tokens", "4", "--overlap", "2", "--json"]
    ) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and rows[0]["chunk_id"] == 0
    assert main(
        ["pipeline", "curate", docs_path, "--op", "scrub-boilerplate",
         "--chunk-tokens", "4", "--json"]
    ) == 0
    json.loads(capsys.readouterr().out)
    assert main(
        ["pipeline", "text", docs_path, "--op", "keyterms", "--json"]
    ) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and rows[0]["rnk"] == 1


def test_cli_maintain_stats_compact_expire(spark, tmp_path_factory, capsys):
    import datetime as dt

    from binance_futures_availability_spark.cli.main import main
    from binance_futures_availability_spark.session import get_session

    s = get_session("bfa-cli")
    path = str(tmp_path_factory.mktemp("climnt") / "t")
    D = dt.date
    rows = [(str(D(2024, 1, d)), f"S{i}", float(i)) for d in (1, 2) for i in range(4)]
    s.createDataFrame(rows, ["date", "symbol", "v"]).repartition(4).write.partitionBy(
        "date"
    ).parquet(path)

    assert main(["maintain", "run", path, "--op", "stats", "--json"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert len(stats) == 2 and all(r["n_files"] > 1 for r in stats)

    assert main(["maintain", "run", path, "--op", "compact"]) == 0
    assert "compacted 2 partitions" in capsys.readouterr().out

    assert main(
        ["maintain", "run", path, "--op", "expire", "--before", "2024-01-02"]
    ) == 0
    assert "expired 1 partitions" in capsys.readouterr().out
    assert s.read.parquet(path).count() == 4


def test_cli_text_lm_score(docs_path, capsys):
    from binance_futures_availability_spark.cli.main import main

    assert main(["pipeline", "text", docs_path, "--op", "lm-score", "--json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and {"doc_id", "n_bigrams", "avg_neg_logprob"} <= set(rows[0])


def test_cli_gaps_symbols_file(table_path, tmp_path, capsys):
    """``gaps`` verb (reference detect_symbol_gaps.py:89-125): diff an
    injected symbols.json discovery fixture against the fact table."""
    sf = tmp_path / "symbols.json"
    sf.write_text(
        json.dumps(
            {
                "perpetual_symbols": ["BTCUSDT", "GAPUSDT"],
                "delivery_symbols": ["GAP2USDT_240628"],
            }
        )
    )
    rc = main(
        ["gaps", "--table", table_path, "--symbols-file", str(sf), "--json"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["discovered"] == 3
    assert rep["missing"] == ["GAP2USDT_240628", "GAPUSDT"]
    assert rep["missing_count"] == 2
    # --strict turns gaps into exit 1
    assert (
        main(
            [
                "gaps",
                "--table",
                table_path,
                "--symbols-file",
                str(sf),
                "--strict",
            ]
        )
        == 1
    )
    # no gaps: every discovered symbol present → 0 even under --strict
    assert (
        main(
            [
                "gaps",
                "--table",
                table_path,
                "--symbols",
                "BTCUSDT,ETHUSDT",
                "--strict",
            ]
        )
        == 0
    )


def test_cli_gaps_needs_universe(table_path):
    with pytest.raises(SystemExit):
        main(["gaps", "--table", table_path])
