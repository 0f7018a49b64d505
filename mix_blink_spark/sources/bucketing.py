"""Bucketed tables for co-located joins (SURVEY.md §4 join strategy).

At 100 TB the pair self-joins and mention↔surface projections repeat on
the same keys across stages; bucketing both sides on the join key removes
the shuffle entirely (both sides are already hash-distributed on disk).
This module is the parquet/`saveAsTable` form; the Iceberg form is
``bucket(N, key)`` in the partition spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def colocated_join(spark: SparkSession, left: str, right: str, on: list[str]) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark
    plans a shuffle-free sort-merge join (no Exchange on either side)."""
    return spark.table(left).join(spark.table(right), on)
