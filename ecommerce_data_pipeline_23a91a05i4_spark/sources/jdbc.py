"""JDBC database source/sink (reference S2: the PostgreSQL leg).

The reference's pipeline is database-centric: ingestion loads CSVs into
Postgres staging tables (``scripts/ingestion/ingest_to_staging.py``),
transformation reads them back with ``pd.read_sql("SELECT * FROM
staging.customers", conn)`` (``scripts/transformation/
staging_to_production.py:138-141``), and every downstream stage
round-trips through the database.  That single-connection
whole-table-into-pandas shape is the scale ceiling this module removes:
Spark's JDBC source streams rows straight into executors, and a
partitioned read turns one table into N concurrent range queries so a
100 TB extract is bounded by the database's aggregate throughput, not
one socket.

Scale rules encoded here:

- **Partitioned reads are the default posture.**  ``read_jdbc`` with a
  ``partition_column`` issues ``num_partitions`` range-predicate queries
  in parallel (Spark adds the ``WHERE col >= lo AND col < hi`` bounds
  server-side).  ``partition_bounds`` fetches MIN/MAX with one scalar
  query so callers never hardcode bounds that drift.
- **Pushdown is preserved.**  Filters/projections on the returned
  DataFrame compile into the generated SQL (``PushedFilters`` on the
  ``JDBCRelation`` scan) — a ``.filter`` after ``read_jdbc`` costs a
  server-side WHERE, not a full-table transfer.
- **Writes are batched.**  ``write_jdbc`` sets ``batchsize`` so inserts
  ship in JDBC batches; ``mode="overwrite"`` with ``truncate`` avoids
  re-deriving DDL when the table already exists.

The production URL is a plain ``jdbc:postgresql://...`` plus the
driver jar on ``spark.jars`` — nothing here is Derby-specific.  Tests
and the t64 gate use Derby's embedded driver because its jars ship
inside pyspark itself (``derby*.jar``), giving a real end-to-end
database round-trip with zero extra infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: In-JVM embedded driver whose jars ship with pyspark (derby*.jar) —
#: the test/CI database.  Production passes e.g. "org.postgresql.Driver".
DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str, create: bool = True) -> str:
    """Connection URL for an embedded Derby database at ``db_dir``.

    Embedded Derby runs inside the Spark JVM — fine in local mode and
    for tests; a multi-executor cluster needs a server-mode database
    (Postgres, or Derby network server) reachable from every executor.
    """
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:{db_dir}{suffix}"


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    *,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    driver: str = DERBY_EMBEDDED_DRIVER,
    fetchsize: int = 10_000,
    **options,
) -> DataFrame:
    """Read a database table (or pushdown query) as a DataFrame.

    Exactly one of ``table`` / ``query`` is required.  Three read
    shapes, in descending preference at scale:

    1. ``table=... , partition_column=..., lower_bound=...,
       upper_bound=..., num_partitions=N`` — N parallel range queries
       (the only shape that scales to large tables).
    2. ``table=..., predicates=[...]`` — one query per hand-written
       WHERE clause (for non-numeric or skew-aware splits).
    3. ``table=...`` alone — ONE connection, one partition.  Correct
       but serial; kept for small dimension tables.

    ``query`` wraps arbitrary SQL as the source relation (the
    reference's ``pd.read_sql(sql, conn)`` twin) — Spark still pushes
    later filters/prunes into the generated outer SELECT.
    """
    if (table is None) == (query is None):
        raise ValueError("read_jdbc requires exactly one of table= / query=")
    part_spec = (partition_column, lower_bound, upper_bound, num_partitions)
    have = [v is not None for v in part_spec]
    if any(have) and not all(have):
        raise ValueError(
            "partitioned read requires ALL of partition_column/"
            "lower_bound/upper_bound/num_partitions (got a partial spec)"
        )
    if predicates is not None and any(have):
        raise ValueError("predicates= and partition_column= are exclusive")

    props = {"driver": driver, "fetchsize": str(fetchsize)}
    props.update({k: str(v) for k, v in options.items()})

    if query is not None:
        reader = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("query", query)
        )
        for k, v in props.items():
            reader = reader.option(k, v)
        return reader.load()
    if predicates is not None:
        return spark.read.jdbc(
            url, table, predicates=predicates, properties=props
        )
    if all(have):
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=props,
        )
    return spark.read.jdbc(url, table, properties=props)


def partition_bounds(
    spark: SparkSession,
    url: str,
    table: str,
    column: str,
    driver: str = DERBY_EMBEDDED_DRIVER,
    quote: str = '"',
) -> tuple:
    """(MIN, MAX) of ``column`` via one server-side scalar query.

    Feed these straight into ``read_jdbc``'s partitioned shape —
    deriving bounds server-side keeps the split honest as the table
    grows (hardcoded bounds silently funnel new rows into the edge
    partitions).

    The column is quoted with ANSI double quotes: Spark's JDBC writer
    creates case-exact quoted column names, so an unquoted reference
    would be case-folded by the server (Derby uppercases, Postgres
    lowercases) and miss.  Databases with non-ANSI quoting (MySQL
    backticks) pass ``quote``.
    """
    q = f"{quote}{column}{quote}"
    row = read_jdbc(
        spark,
        url,
        query=f"SELECT MIN({q}) AS lo, MAX({q}) AS hi FROM {table}",
        driver=driver,
    ).collect()[0]
    # positional: the server case-folds the unquoted aliases (Derby
    # uppercases them), so attribute access would be name-fragile
    return row[0], row[1]


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    driver: str = DERBY_EMBEDDED_DRIVER,
    batchsize: int = 10_000,
    truncate: bool = False,
    **options,
) -> None:
    """Write a DataFrame to a database table in JDBC batches.

    Parallelism = the DataFrame's partition count (each partition holds
    one connection) — ``df.coalesce(n)`` first if the database caps
    concurrent writers.  ``truncate=True`` with ``mode="overwrite"``
    issues TRUNCATE instead of DROP+CREATE, preserving server-side DDL
    (indexes, permissions) the way a production Postgres load wants.
    """
    props = {"driver": driver, "batchsize": str(batchsize)}
    if truncate:
        props["truncate"] = "true"
    props.update({k: str(v) for k, v in options.items()})
    df.write.jdbc(url, table, mode=mode, properties=props)
