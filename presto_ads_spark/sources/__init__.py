"""Sources/sinks — the connector surface (SURVEY.md §2.5).

Presto's connector SPI (reference: presto-spi/.../connector/Connector.java,
ConnectorPageSource.java:20) maps to Spark DataSource registrations:

| Presto connector | here |
|---|---|
| hive (parquet/orc/csv/json/text/avro — HiveStorageFormat.java:50-96) | ``read``/``write`` with fmt |
| base-jdbc (mysql/postgresql/…) | ``read_jdbc``/``write_jdbc`` |
| kafka (batch reads, KafkaRecordSet.java:53) | ``read_kafka`` (guarded: needs the kafka package on the cluster) |
| memory | ``memory_table`` (temp view over createDataFrame) |
| blackhole | ``blackhole`` (noop sink) |
| tpch generator | the driver's parquet testdata (catalog.py) |

Write-side scale notes: ``write`` exposes ``partition_by`` (directory
partitioning → partition pruning on read) and ``bucket_by`` (co-located
joins without a shuffle) because those are the two knobs that matter at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

FILE_FORMATS = ("parquet", "orc", "json", "csv", "text", "avro")


def read(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: str | None = None,
    **options,
) -> DataFrame:
    if fmt not in FILE_FORMATS:
        raise ValueError(f"unknown file format {fmt!r}; use one of {FILE_FORMATS}")
    reader: DataFrameReader = spark.read.format(fmt)
    if schema:
        reader = reader.schema(schema)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    return reader.options(**options).load(path)


def write(
    df: DataFrame,
    fmt: str,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table: str | None = None,
    **options,
) -> None:
    if fmt not in FILE_FORMATS:
        raise ValueError(f"unknown file format {fmt!r}; use one of {FILE_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    writer = writer.options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if table is None:
            raise ValueError("bucketBy requires a table name (saveAsTable)")
        writer.option("path", path).bucketBy(n, *cols).sortBy(*cols).saveAsTable(table)
        return
    writer.save(path)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC source (Presto's mysql/postgresql/redshift/sqlserver connectors
    over presto-base-jdbc). Pushdown of filters/limits is handled by Spark's
    JDBC source; partition the read with (partitionColumn, lowerBound,
    upperBound, numPartitions) options for parallelism."""
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).options(**options).load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options) -> None:
    df.write.format("jdbc").option("url", url).option("dbtable", table).options(**options).mode(mode).save()


def read_kafka(
    spark: SparkSession, bootstrap_servers: str, topic: str, streaming: bool = False, **options
) -> DataFrame:
    """Kafka source. The reference reads Kafka as a *static* table
    (KafkaRecordSet.java:53 iterates a fixed offset range); batch mode here
    matches that; streaming=True upgrades to Structured Streaming (beyond
    the reference's capability). Requires spark-sql-kafka on the cluster."""
    src = spark.readStream if streaming else spark.read
    return (
        src.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .options(**options)
        .load()
    )


def memory_table(spark: SparkSession, name: str, rows, schema) -> DataFrame:
    """Presto memory connector equivalent: materialized temp view."""
    df = spark.createDataFrame(rows, schema)
    df.createOrReplaceTempView(name)
    return df


def blackhole(df: DataFrame) -> None:
    """Presto blackhole connector: execute fully, discard output."""
    df.write.format("noop").mode("overwrite").save()


def delete_partitions(spark: SparkSession, path: str, **partition_values) -> int:
    """Partition-drop DELETE — the flavor Presto 0.216's hive connector
    actually supports (MetadataDeleteOperator, reference
    operator/MetadataDeleteOperator.java:34): removing whole partition
    directories, no row rewrite. Returns partitions removed."""
    import shutil
    import os

    removed = 0
    for k, v in partition_values.items():
        target = os.path.join(path, f"{k}={v}")
        if os.path.isdir(target):
            shutil.rmtree(target)
            removed += 1
    return removed


def delete_where(spark: SparkSession, path: str, condition: str,
                 fmt: str = "parquet") -> int:
    """Row-level DELETE via staged rewrite (DeleteOperator analogue,
    reference operator/DeleteOperator.java:39 — there it needs connector
    support; on plain files it's rewrite-and-swap).

    Reads, anti-filters, writes to a staging dir, swaps atomically-ish.
    At 100 TB you'd do this per-partition (combine with partition pruning
    on ``condition``) or use a table format (Delta/Iceberg) — this is the
    dependency-free form. Returns rows deleted."""
    import shutil

    df = spark.read.format(fmt).load(path)
    before = df.count()
    # DELETE removes only rows where the condition is TRUE (Presto/SQL
    # semantics): NULL-condition rows must be KEPT, so the keep-filter is
    # NOT coalesce(cond, false), not a bare NOT(cond). Routed through
    # spark.sql over a temp view so the condition may contain subqueries
    # (DELETE ... WHERE k IN (SELECT ...)) — DataFrame.filter can't.
    df.createOrReplaceTempView("__delete_target")
    kept = spark.sql(
        f"SELECT * FROM __delete_target"
        f" WHERE NOT coalesce(({condition}), false)"
    )
    staging = path.rstrip("/") + ".__staging__"
    kept.write.format(fmt).mode("overwrite").save(staging)
    spark.catalog.dropTempView("__delete_target")
    after = spark.read.format(fmt).load(staging).count()
    shutil.rmtree(path)
    shutil.move(staging, path)
    return before - after
