"""DuckDB ⇄ Spark connector round-trip tests (sources/duckdb_io.py).

Parity target: the reference's single-file store
(database/availability_db.py:32-47, schema.py:68-95) as the migration
source/destination.
"""

from __future__ import annotations

import duckdb
import pytest

from binance_futures_availability_spark.schema import DAILY_AVAILABILITY
from binance_futures_availability_spark.sources.duckdb_io import (
    export_duckdb,
    import_duckdb,
)


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_export_then_import_roundtrip(spark, populated_da, tmp_path):
    """fact → .duckdb → fact is value-identical, and the .duckdb carries
    the reference's PK so its CLI upserts keep working."""
    db = str(tmp_path / "availability.duckdb")
    export_duckdb(populated_da, db)

    con = duckdb.connect(db, read_only=True)
    n = con.execute("SELECT COUNT(*) FROM daily_availability").fetchone()[0]
    pk = con.execute(
        "SELECT constraint_type FROM information_schema.table_constraints "
        "WHERE table_name = 'daily_availability'"
    ).fetchall()
    con.close()
    assert n == populated_da.count()
    assert ("PRIMARY KEY",) in pk

    dest = str(tmp_path / "imported_fact")
    got = import_duckdb(spark, db, dest_path=dest)
    assert got.schema == DAILY_AVAILABILITY or [
        (f.name, f.dataType) for f in got.schema.fields
    ] == [(f.name, f.dataType) for f in DAILY_AVAILABILITY.fields]
    assert _canon(got.select(*[f.name for f in DAILY_AVAILABILITY.fields]).collect()) == _canon(
        populated_da.collect()
    )


def test_import_without_dest_returns_cast_frame(spark, populated_da, tmp_path):
    db = str(tmp_path / "a.duckdb")
    export_duckdb(populated_da, db)
    got = import_duckdb(spark, db)
    assert got.count() == populated_da.count()
    assert dict(got.dtypes)["date"] == "date"
    assert dict(got.dtypes)["trade_count"] == "bigint"


def test_import_pre_adr0007_db_nullfills_volume_columns(spark, tmp_path):
    """A database created before the volume migration (schema.py:20-42)
    imports with the nine volume columns NULL — the reference migration's
    own result."""
    db = str(tmp_path / "old.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE daily_availability ("
        "date DATE NOT NULL, symbol VARCHAR NOT NULL, "
        "available BOOLEAN NOT NULL, file_size_bytes BIGINT, "
        "last_modified TIMESTAMP, url VARCHAR NOT NULL, "
        "status_code INTEGER NOT NULL, probe_timestamp TIMESTAMP NOT NULL, "
        "PRIMARY KEY (date, symbol))"
    )
    con.execute(
        "INSERT INTO daily_availability VALUES "
        "(DATE '2024-01-13', 'BTCUSDT', true, 1024, "
        "TIMESTAMP '2024-01-16 00:00:00', 's3://x', 200, "
        "TIMESTAMP '2024-01-16 00:00:00')"
    )
    con.close()
    got = import_duckdb(spark, db)
    row = got.collect()[0]
    assert row["symbol"] == "BTCUSDT" and row["available"] is True
    for c in ("quote_volume_usdt", "trade_count", "close_price"):
        assert row[c] is None


def test_export_append_is_reference_upsert(spark, populated_da, tmp_path):
    """mode='append' INSERT OR REPLACEs on the PK — re-exporting an
    overlapping batch replaces rather than duplicates (the reference's
    idempotent re-probe semantics, availability_db.py:97-124)."""
    db = str(tmp_path / "up.duckdb")
    export_duckdb(populated_da, db)
    # bump one row's volume and append it
    from pyspark.sql import functions as F

    patch = populated_da.filter(
        (F.col("symbol") == "BTCUSDT") & F.col("quote_volume_usdt").isNotNull()
    ).withColumn("quote_volume_usdt", F.lit(999.0))
    export_duckdb(patch, db, mode="append")

    con = duckdb.connect(db, read_only=True)
    n, btc = con.execute(
        "SELECT COUNT(*), "
        "SUM(CASE WHEN symbol='BTCUSDT' AND quote_volume_usdt=999.0 "
        "THEN 1 ELSE 0 END) FROM daily_availability"
    ).fetchone()
    con.close()
    assert n == populated_da.count()  # no duplicates
    assert btc == 3  # all three BTC rows replaced


def test_import_missing_table_raises(spark, tmp_path):
    db = str(tmp_path / "empty.duckdb")
    duckdb.connect(db).close()
    with pytest.raises(ValueError, match="not found"):
        import_duckdb(spark, db)


def test_invalid_table_identifier_rejected(spark, populated_da, tmp_path):
    """Table names are interpolated into DuckDB DDL/COPY strings (no
    placeholder form exists for identifiers) — anything but a plain
    identifier must be rejected before touching the database."""
    db = str(tmp_path / "inj.duckdb")
    for bad in ("daily; DROP TABLE x", "a-b", "t'); --", ""):
        with pytest.raises(ValueError, match="identifier"):
            export_duckdb(populated_da, db, table=bad)
        with pytest.raises(ValueError, match="identifier"):
            import_duckdb(spark, db, table=bad)


def test_import_with_dest_cleans_staging(spark, populated_da, tmp_path, monkeypatch):
    """The dest_path branch must remove its COPY staging dir as soon as the
    partitioned write has materialized it (r6/r7 leak finding)."""
    import tempfile

    monkeypatch.setenv("TMPDIR", str(tmp_path / "tmp"))
    (tmp_path / "tmp").mkdir()
    tempfile.tempdir = None  # re-read TMPDIR
    try:
        db = str(tmp_path / "c.duckdb")
        export_duckdb(populated_da, db)
        import_duckdb(spark, db, dest_path=str(tmp_path / "fact"))
        leftovers = list((tmp_path / "tmp").glob("duckdb_import_*"))
        assert leftovers == []
    finally:
        tempfile.tempdir = None


def test_read_fact_memoizes_per_path(spark, populated_da, tmp_path):
    """Repeat catalog reads of one imported table return the SAME cached
    handle (no per-call partition re-discovery — the r7 205× defect), and
    a re-import through the same dest invalidates the stale handle."""
    from binance_futures_availability_spark.sources import duckdb_io

    db = str(tmp_path / "m.duckdb")
    export_duckdb(populated_da, db)
    dest = str(tmp_path / "memo_fact")
    import_duckdb(spark, db, dest_path=dest)
    h1 = duckdb_io.read_fact(spark, dest)
    assert duckdb_io.read_fact(spark, dest) is h1
    # rewrite through the connector: the memo must not serve stale rows
    from pyspark.sql import functions as F

    export_duckdb(
        populated_da.withColumn("quote_volume_usdt", F.lit(7.0)), db
    )
    h2 = import_duckdb(spark, db, dest_path=dest)
    assert h2 is not h1
    vals = {
        r["quote_volume_usdt"]
        for r in duckdb_io.read_fact(spark, dest).collect()
    }
    assert vals == {7.0}


def test_read_fact_misses_after_inplace_rewrite(spark, populated_da, tmp_path):
    """The memoized import handle keys on the directory fingerprint:
    rewriting the table in place (an upsert touches date-dir mtimes) must
    serve the NEW rows, not the pinned pre-rewrite snapshot."""
    import time as _time

    from binance_futures_availability_spark.sources import duckdb_io, writer

    dest = str(tmp_path / "fact")
    writer.write_partitioned(populated_da, dest)
    first = duckdb_io.read_fact(spark, dest)
    assert first.count() == populated_da.count()

    _time.sleep(0.05)  # ensure mtime_ns moves
    writer.write_partitioned(populated_da.limit(3), dest)
    again = duckdb_io.read_fact(spark, dest)
    assert again.count() == 3
