"""binance_futures_availability_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference system ``terrylica/binance-futures-availability``
(a DuckDB-backed availability catalog; see SURVEY.md). All query semantics are
declared through the DataFrame/SQL API so Catalyst + Tungsten choose the
physical plan; nothing is hand-scheduled.

Layers
------
- ``session``     SparkSession factory (UTC, AQE, sane shuffle partitions)
- ``schema``      explicit StructTypes for every stored table
- ``catalog``     table registry over parquet directories
- ``operators``   the query catalog (snapshots, timelines, analytics, volume,
                  rankings, dedup, similarity, text ops, multimodal)
- ``sources``     readers/writers incl. key-dedup upsert + matview refresh
- ``functions``   reusable column expressions (pure, JVM-side)
- ``plans``       plan inspection / assertion helpers
- ``streaming``   Structured Streaming analogues of the incremental pipeline
- ``validation``  continuity / completeness / cross-check / dataset differ
"""

__version__ = "0.1.0"
