"""Iceberg bindings (SURVEY.md §2.1 S4/S8 storage story; north_star:
"Iceberg table of Common-Crawl-style web pages", "emitting per-partition
lineage and score-distribution metrics to an Iceberg metrics table").

This sandbox has no Iceberg runtime jar, so every caller degrades to the
parquet equivalents (plans/resume.StageStore, streaming/incremental) —
but the real code paths live here and activate when
``session.iceberg_available(spark)`` is true:

  - ``ensure_pages_table``: the production DDL — partition spec
    ``(lang, days(warc_ts), bucket(N, url))``. lang/date prune at
    planning time; the url bucketing makes the pages⋈spans join
    storage-co-located (the same property tests/test_plans.py
    demonstrates with parquet bucketBy).
  - ``write_pages`` / ``append_pages``: fanout-free sorted writes.
  - ``snapshot_range_read``: incremental consumption between snapshot
    ids — the Iceberg-native replacement for the manual warc_ts
    watermark in streaming/incremental (the watermark then only stores
    the last processed snapshot id, and late-arriving data is handled by
    Iceberg's serializable snapshot isolation instead of timestamp
    comparisons).
  - ``current_snapshot_id``: reads the metadata table.

Catalog configuration (cluster spark-defaults; here for reference):

    spark.sql.catalog.mbs = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.mbs.type = hadoop            # or hive / rest
    spark.sql.catalog.mbs.warehouse = <path>
    spark.sql.extensions = org.apache.iceberg.spark.extensions.\
        IcebergSparkSessionExtensions
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import iceberg_available

PAGES_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
    url STRING,
    warc_ts TIMESTAMP,
    html BINARY,
    text STRING,
    lang STRING
)
USING iceberg
PARTITIONED BY (lang, days(warc_ts), bucket({buckets}, url))
TBLPROPERTIES (
    'write.distribution-mode' = 'hash',
    'write.target-file-size-bytes' = '134217728',
    'format-version' = '2'
)
"""


class IcebergUnavailable(RuntimeError):
    """Raised when an Iceberg-only path is invoked without the runtime.

    Callers are expected to check ``session.iceberg_available`` first and
    take the parquet path (StageStore / partitioned parquet) otherwise.
    """


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise IcebergUnavailable(
            "no Iceberg runtime on the classpath — use the parquet paths "
            "(plans/resume.StageStore, sources/pages.write_pages)"
        )


def ensure_pages_table(spark: SparkSession, table: str, buckets: int = 64) -> None:
    """Create the production pages table with the partition spec the
    north_star mandates: (lang, days(warc_ts), bucket(url))."""
    _require(spark)
    spark.sql(PAGES_DDL.format(table=table, buckets=buckets))


def write_pages(pages: DataFrame, table: str, overwrite: bool = False) -> None:
    """Sorted, hash-distributed write into the partitioned table. The
    local-sort on (lang, warc_ts) keeps files clustered for pruning."""
    _require(pages.sparkSession)
    w = pages.sortWithinPartitions("lang", "warc_ts").writeTo(table)
    if overwrite:
        w.overwritePartitions()
    else:
        w.append()


def current_snapshot_id(spark: SparkSession, table: str) -> int | None:
    """Latest committed snapshot id from the metadata table."""
    _require(spark)
    row = (
        spark.sql(f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at DESC LIMIT 1")
        .first()
    )
    return None if row is None else row["snapshot_id"]


def snapshot_range_read(
    spark: SparkSession,
    table: str,
    start_snapshot_id: int | None,
    end_snapshot_id: int | None = None,
) -> DataFrame:
    """Rows appended strictly AFTER ``start_snapshot_id`` (exclusive) up
    to ``end_snapshot_id`` (inclusive; default current) — the incremental
    delta for streaming/incremental.process_increment. With
    ``start_snapshot_id=None`` reads the full table (first increment).

    Unlike the warc_ts watermark, snapshot ranges are exactly-once under
    late/out-of-order data: a page committed late still appears in
    exactly one snapshot range.
    """
    _require(spark)
    reader = spark.read.format("iceberg")
    if start_snapshot_id is not None:
        reader = reader.option("start-snapshot-id", str(start_snapshot_id))
        if end_snapshot_id is not None:
            reader = reader.option("end-snapshot-id", str(end_snapshot_id))
        return reader.load(table)
    if end_snapshot_id is not None:
        reader = reader.option("snapshot-id", str(end_snapshot_id))
    return reader.load(table)


def write_metrics(metrics: DataFrame, table: str) -> None:
    """Append per-partition lineage / score-histogram rows to the Iceberg
    metrics table (north_rule). Schema matches StageStore's parquet
    metrics store, so either backend serves the same readers."""
    _require(metrics.sparkSession)
    metrics.writeTo(table).append()
