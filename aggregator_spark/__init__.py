"""aggregator_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cybergreen-net/aggregator (reference at
/root/reference, read-only).

This is NOT a port: the reference pushes SQL strings to Redshift/Postgres
(reference main.py:203-247, 387-422); here every relational operation is a
declarative Spark DataFrame plan optimized by Catalyst and executed by
Tungsten. Layout:

- ``session``    — SparkSession factory (AQE, UTC, sane shuffle defaults)
- ``schemas``    — explicit StructType for every table in the data model
- ``config``     — env-templated config loader (reference main.py:25-38)
- ``sources``    — datapackage/manifest/CSV/JDBC sources and sinks
- ``operators``  — the relational operator inventory (SURVEY.md §2) plus
                   beyond-reference ops: dedup, similarity, text analysis
- ``plans``      — stage-1 (Aggregator) / stage-2 (LoadToRDS) pipelines
- ``streaming``  — Structured Streaming ingest variant
"""

__version__ = "0.1.0"
