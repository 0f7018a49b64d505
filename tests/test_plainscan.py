"""Byte-identity + guard tests for the direct PLAIN-page decoder
(sources/plainscan.py) and its reader integration
(SPARK_GRAFT_PLAIN_DECODE=1)."""

from __future__ import annotations

import mmap

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mix_blink_spark.sources.plainscan import chunk_meta_supported, plain_decode_utf8


def _decode_all(path: str) -> list[str] | None:
    """Run the fast decoder over every row group of ``path``'s html
    column; None if any row group declines."""
    pf = pq.ParquetFile(path)
    ci = next(
        i
        for i in range(pf.metadata.num_columns)
        if pf.metadata.schema.column(i).path == "html"
    )
    with open(path, "rb") as fh:
        mm = mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ)
        out: list[str] = []
        for rg in range(pf.metadata.num_row_groups):
            rgm = pf.metadata.row_group(rg)
            got = plain_decode_utf8(mm, rgm.column(ci), rgm.num_rows)
            if got is None:
                return None
            out.extend(got)
    return out


def _reference(path: str) -> list[str]:
    col = pq.read_table(path, columns=["html"]).column("html")
    return [
        v.as_py().decode("utf-8", "replace") if v.is_valid else None
        for chunk in col.chunks
        for v in chunk
    ]


def _write(path, values, compression="NONE", use_dictionary=False,
           row_group_size=None, data_page_size=None):
    tbl = pa.table({"html": pa.array(values, type=pa.binary())})
    pq.write_table(
        tbl,
        path,
        compression=compression,
        use_dictionary=use_dictionary,
        row_group_size=row_group_size,
        data_page_size=data_page_size,
        write_statistics=True,
    )


def test_plain_decode_multi_page_multi_rowgroup(tmp_path):
    import random

    rng = random.Random(5)
    vals = [
        ("<p>doc %d</p> " % i + "x" * rng.randrange(0, 5000)).encode()
        for i in range(999)
    ]
    p = str(tmp_path / "plain.parquet")
    # small pages + row groups force many page headers through the walker
    _write(p, vals, row_group_size=137, data_page_size=4096)
    got = _decode_all(p)
    assert got is not None
    assert got == _reference(p)


def test_plain_decode_empty_values_and_unicode(tmp_path):
    vals = [b"", "héllo <b>wörld</b> ☃".encode(), b"", b"plain ascii"] * 50
    p = str(tmp_path / "uni.parquet")
    _write(p, vals, row_group_size=33)
    got = _decode_all(p)
    assert got is not None
    assert got == _reference(p)


def test_plain_decode_invalid_utf8_replace(tmp_path):
    vals = [b"ok", b"\xff\xfe broken \x80", b"tail"] * 20
    p = str(tmp_path / "bad.parquet")
    _write(p, vals)
    got = _decode_all(p)
    assert got is not None
    assert got == _reference(p)


def test_plain_decode_declines_nulls(tmp_path):
    vals = [b"a", None, b"c"] * 10
    p = str(tmp_path / "nulls.parquet")
    _write(p, vals)
    assert _decode_all(p) is None  # falls back, never wrong


def test_plain_decode_declines_compressed_and_dict(tmp_path):
    vals = [b"abc"] * 100
    p1 = str(tmp_path / "snappy.parquet")
    _write(p1, vals, compression="SNAPPY")
    pf = pq.ParquetFile(p1)
    assert not chunk_meta_supported(pf.metadata.row_group(0).column(0))

    p2 = str(tmp_path / "dict.parquet")
    _write(p2, vals, use_dictionary=True)
    pf = pq.ParquetFile(p2)
    assert not chunk_meta_supported(pf.metadata.row_group(0).column(0))


def test_reader_plain_decode_end_to_end(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_PLAIN_DECODE=1 through read_pages_extracted_python is
    byte-identical to the standard extraction on a Spark-written
    uncompressed PLAIN layout (dictionary disabled so pages are PLAIN,
    like the 80 KB bench cells that overflow the dict page)."""
    from pyspark.sql import functions as F

    from mix_blink_spark.fixtures import corpus_dfs
    from mix_blink_spark.sources.pages import (
        read_pages_extracted_python,
        with_extracted_text,
    )

    pages, _, _, _ = corpus_dfs(spark, seed=41, n_pages=120, n_entities=15)
    path = str(tmp_path / "pages_plain")
    (
        pages.select("url", "html", "lang")
        .write.option("parquet.enable.dictionary", "false")
        .parquet(path)
    )
    # layout sanity: the fast path must actually engage on this file
    import glob

    f0 = glob.glob(path + "/*.parquet")[0]
    pf = pq.ParquetFile(f0)
    ci = next(
        i
        for i in range(pf.metadata.num_columns)
        if pf.metadata.schema.column(i).path == "html"
    )
    assert chunk_meta_supported(pf.metadata.row_group(0).column(ci))

    monkeypatch.setenv("SPARK_GRAFT_PLAIN_DECODE", "1")
    std = with_extracted_text(pages).select(
        "url", F.col("extracted_text").alias("t_std")
    )
    new = read_pages_extracted_python(spark, path, columns=("url", "lang")).select(
        "url", F.col("text").alias("t_new")
    )
    j = std.join(new, "url")
    assert j.count() == 120
    assert j.filter(F.col("t_std") != F.col("t_new")).count() == 0
