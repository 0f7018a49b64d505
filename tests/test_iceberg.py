"""Iceberg bindings: everything callable degrades loudly without the
runtime jar; the DDL/read code paths are real and activate when the jar
is present (full-path tests auto-skip in this sandbox)."""

from __future__ import annotations

import pytest

from mix_blink_spark.session import iceberg_available
from mix_blink_spark.sources import iceberg as ib


def test_unavailable_paths_raise_cleanly(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present — covered by the full-path test")
    with pytest.raises(ib.IcebergUnavailable, match="parquet paths"):
        ib.ensure_pages_table(spark, "mbs.pages")
    with pytest.raises(ib.IcebergUnavailable):
        ib.snapshot_range_read(spark, "mbs.pages", None)


def test_ddl_has_mandated_partition_spec():
    ddl = ib.PAGES_DDL.format(table="t", buckets=64)
    assert "PARTITIONED BY (lang, days(warc_ts), bucket(64, url))" in ddl
    for col in ("url STRING", "warc_ts TIMESTAMP", "html BINARY", "text STRING", "lang STRING"):
        assert col in ddl  # exact input_hint schema


def test_full_iceberg_roundtrip(spark, corpus, tmp_path):
    """Real create/append/snapshot-read — runs only with the runtime jar
    on the classpath (sandbox: skipped)."""
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime in this environment")
    ib.ensure_pages_table(spark, "mbs.pages_t", buckets=4)
    ib.write_pages(corpus["pages"], "mbs.pages_t")
    s1 = ib.current_snapshot_id(spark, "mbs.pages_t")
    ib.write_pages(corpus["pages"].limit(5), "mbs.pages_t")
    delta = ib.snapshot_range_read(spark, "mbs.pages_t", s1)
    assert delta.count() == 5
