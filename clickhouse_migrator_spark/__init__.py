"""clickhouse_migrator_spark — a PySpark-native analytics + migration engine.

A ground-up rebuild of the capabilities of delium/clickhouse-migrator
(reference surveyed in SURVEY.md): a Flyway-style versioned schema-migration
runner (`clickhouse_migrator_spark.migrate`) re-expressed on Spark catalog
tables, plus the analytics operator surface the driver contract mandates
(`clickhouse_migrator_spark.operators`): joins, aggregations, windows,
set ops, scalar functions, dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search, text analysis, multimodal
column plumbing, and event-time windowing — all idiomatic DataFrame/SQL,
designed for 100 TB scale (broadcast small dims, partial aggregation,
pushdown-friendly plans, no driver-side loops in the data path).
"""

__version__ = "0.1.0"
