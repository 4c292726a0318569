"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference pipeline (Developer1010x/Dockerized-Data-Pipeline).

The reference is an Airflow->Postgres ETL pipeline; this package re-expresses
its entire documented capability surface (see SURVEY.md section 2) as an
idiomatic Spark DataFrame/SQL engine, plus LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Layout:
    session.py    SparkSession factory (AQE on, UTC, sized shuffle partitions)
    catalog.py    parquet table registry / DDL (ref: dags/stock_data_pipeline.py:23-41)
    config.py     env-driven config  (ref: scripts/fetch_stock_data.py:130-132)
    operators/    merge-upsert, dedup, similarity, retention, quality
    sources/      HTTP fetcher, Alpha-Vantage-shaped JSON parser, snapshots
    functions/    text analysis, JSON props, vector math column expressions
    plans/        the registered query surface (queries + DuckDB oracle SQL)
    streaming/    Structured Streaming ingest + windowed aggregation
"""

__version__ = "0.1.0"
