"""taxi_rides_ny_duckdb_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
dbt + DuckDB project (InfuseAI/taxi_rides_ny_duckdb) as an idiomatic
PySpark engine: declarative DataFrame/SQL plans optimized by Catalyst,
plus large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing, streaming).

Layout
------
- ``session``    : SparkSession factory (AQE, UTC, Arrow, shuffle sizing).
- ``sources``    : source registry (parquet/CSV/JSON readers + seed loader).
- ``functions``  : scalar function library ("macros", text, vectors).
- ``operators``  : reusable relational + extension operators (dedup,
                   similarity, windows, multimodal).
- ``plans``      : the reference pipeline as DataFrame programs
                   (staging, core, metrics, data-quality tests, DAG runner).
- ``streaming``  : Structured Streaming jobs (windowed aggs, watermarks,
                   stateful dedup).
"""

__version__ = "0.1.0"
