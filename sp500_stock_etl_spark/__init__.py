"""sp500_stock_etl_spark — a PySpark-native analytics engine.

Re-expresses the full query/data-processing surface of the reference
``mohdasjal1/sp500-stock-etl`` (an Airflow ETL DAG, see SURVEY.md) as
idiomatic Spark DataFrame/SQL plans, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the north star requires.

Layout:
  session    — SparkSession factory tuned for local[32] testing and
               a config layer that scales to multi-executor clusters.
  schemas    — explicit StructTypes (schema-first, unlike the
               reference's inferred-and-defended pandas frames).
  io         — parquet readers over the testdata star schema; a
               cleansing CSV reader reproducing the reference's
               Snowflake COPY INTO file-format semantics; quoted CSV
               sink reproducing its pandas writer.
  functions  — scalar/column helpers (symbol validation, text stats,
               vector math) built on pyspark.sql.functions (JVM-side).
  operators  — window metrics, ranking, aggregates, joins, dedup,
               similarity, multimodal column plumbing.
  plans      — the query registry wired into __spark_entry__.py.
  streaming  — Structured Streaming slice (windowed event aggs,
               availableNow trigger mirroring the reference's daily
               batch semantics).
"""

__version__ = "0.1.0"
