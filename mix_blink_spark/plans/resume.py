"""Resumable stage store (north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

On a production cluster each stage commits an Iceberg table and the
watermark lives in an Iceberg metrics table (snapshot isolation gives
exactly-once stage commits). This sandbox has no Iceberg runtime, so the
same protocol runs on parquet directories + a JSON watermark written
atomically (tmp + rename) AFTER the parquet commit — a crash between the
two re-runs the stage, never skips it.

``StageStore.run`` is the only API: compute-or-reload by stage name. A
``metrics`` parquet accumulates one row per (stage, partition) with row
counts — the per-partition lineage record.

Stages are keyed by NAME only: a store directory binds to one pipeline
configuration. Changing thresholds/measures requires a fresh workdir (or
``reset`` of downstream stages) — the convention a per-run output
directory gives you for free.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_METRICS_SCHEMA = "stage string, partition_id int, rows bigint"


class StageStore:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    def _paths(self, stage: str) -> tuple[str, str]:
        return (
            os.path.join(self.workdir, stage),
            os.path.join(self.workdir, f"{stage}.watermark.json"),
        )

    def is_done(self, stage: str) -> bool:
        return os.path.exists(self._paths(stage)[1])

    def run(self, stage: str, fn: Callable[[], DataFrame], force: bool = False) -> DataFrame:
        """Return the stage output, computing it only if not yet committed.

        Commit order: parquet data first, lineage metrics second, watermark
        last — resume after any crash point recomputes at most this stage.
        """
        data_path, mark_path = self._paths(stage)
        if self.is_done(stage) and not force:
            return self.spark.read.parquet(data_path)

        df = fn()
        df.write.mode("overwrite").parquet(data_path)
        out = self.spark.read.parquet(data_path)

        lineage = out.groupBy(F.spark_partition_id().alias("partition_id")).agg(
            F.count("*").alias("rows")
        ).withColumn("stage", F.lit(stage)).select("stage", "partition_id", "rows")
        lineage.write.mode("append").parquet(os.path.join(self.workdir, "_metrics"))

        tmp = mark_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": stage, "rows": out.count(), "path": data_path}, f)
        os.replace(tmp, mark_path)
        return out

    def record_histogram(self, stage: str, df: DataFrame, col: str, bins: int = 20) -> None:
        """Score-distribution metrics (north_rule): a ``bins``-bucket
        histogram of ``col`` over [0, 1], appended to the metrics store as
        one row per bucket: (stage, bucket, lo, hi, rows)."""
        bucket = F.least(F.floor(F.col(col) * bins).cast("int"), F.lit(bins - 1))
        hist = (
            df.select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias("rows"))
            .select(
                F.lit(stage).alias("stage"),
                F.concat(F.lit("hist:"), F.col("bucket").cast("string")).alias("kind"),
                (F.col("bucket") / bins).alias("lo"),
                ((F.col("bucket") + 1) / bins).alias("hi"),
                "rows",
            )
        )
        # one subdir per stage, overwritten on recompute: idempotent under
        # resume (re-running link() never duplicates histogram rows)
        hist.write.mode("overwrite").parquet(os.path.join(self.workdir, "_histograms", stage))

    def histograms(self) -> DataFrame:
        path = os.path.join(self.workdir, "_histograms")
        if not os.path.exists(path):
            return self.spark.createDataFrame(
                [], "stage string, kind string, lo double, hi double, rows bigint"
            )
        return self.spark.read.option("recursiveFileLookup", "true").parquet(path)

    def metrics(self) -> DataFrame:
        path = os.path.join(self.workdir, "_metrics")
        if not os.path.exists(path):
            return self.spark.createDataFrame([], _METRICS_SCHEMA)
        return self.spark.read.parquet(path)

    def reset(self, stage: str) -> None:
        _, mark = self._paths(stage)
        if os.path.exists(mark):
            os.remove(mark)
