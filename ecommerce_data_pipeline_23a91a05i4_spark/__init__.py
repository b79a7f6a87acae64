"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ecommerce data pipeline
(RemillaSriVaishnavi/ecommerce-data-pipeline-23A91A05I4).

The reference is a pandas+PostgreSQL batch ELT pipeline (raw CSV -> staging
-> production -> warehouse star schema -> 10 analytical SQL queries).  This
package re-expresses every operator of that pipeline Spark-first:

- ``session``     SparkSession factory (AQE, UTC, tuned shuffle partitions)
- ``catalog``     parquet table loading / view registration
- ``schemas``     explicit StructTypes for the ecommerce table surface
- ``datagen``     seeded synthetic ecommerce data generator
- ``operators``   cleanse / quality-check / dedup / similarity / text ops
- ``plans``       the analytical + monitoring query suite
- ``warehouse``   star-schema build (dims, fact, aggregate tables)
- ``streaming``   Structured Streaming ingest + windowed aggregations
"""

__version__ = "0.1.0"
