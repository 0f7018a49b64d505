"""Byte-identical text extraction (BASELINE.json input_hint invariant) +
normalization/blocking-key expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from mix_blink_spark.functions.text import (
    blocking_key,
    extract_text,
    extract_text_str,
    normalize_surface,
    sorted_token_key,
)


def test_extract_text_byte_identical(spark, corpus):
    """extract_text(html) == text for every url — THE pytest invariant."""
    pages = corpus["pages"]
    mismatches = (
        pages.withColumn("extracted", extract_text(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_jvm_extractor_matches_python_kernel(spark, corpus):
    """The codegen fast path must agree byte-for-byte with the Python
    kernel (and therefore with the stored text) on the fixture corpus."""
    from mix_blink_spark.functions.text import extract_text_jvm

    pages = corpus["pages"]
    bad = (
        pages.withColumn("jvm", extract_text_jvm(F.col("html")))
        .filter((F.col("jvm") != F.col("text")))
        .count()
    )
    assert bad == 0


def test_extract_text_drops_boilerplate():
    html = (
        "<!DOCTYPE html><html><head><title>t</title><script>var x=1;</script></head>"
        "<body><nav>menu</nav><article>Hello &amp; goodbye.</article>"
        "<footer>foot</footer></body></html>"
    )
    assert extract_text_str(html) == "Hello & goodbye."


def test_extract_text_nbsp_parity(spark):
    """&nbsp; must decode to U+00A0 (html.unescape parity) in BOTH kernels
    and must NOT be collapsed by the whitespace pass — the fixture corpus
    never emits &nbsp;, so this case needs its own fixture (ADVICE r1)."""
    from mix_blink_spark.functions.text import extract_text_jvm

    html = (
        "<p>a&nbsp;b</p> <p>c &nbsp; d</p>"
        "<div>x&amp;y &lt;tag&gt; &quot;q&quot; &#39;s&#39;</div>"
    )
    py = extract_text_str(html)
    assert "a b" in py  # U+00A0 preserved, not collapsed
    assert "c   d" in py
    assert "x&y <tag> \"q\" 's'" in py
    df = spark.createDataFrame([(html.encode(),)], "html binary")
    row = df.select(
        extract_text("html").alias("p"), extract_text_jvm(F.col("html")).alias("j")
    ).first()
    assert row["p"] == py
    assert row["j"] == py  # byte-identical across kernels


def test_extract_text_null_safe(spark):
    df = spark.createDataFrame([(None,), (b"<p>x</p>",)], "html binary")
    rows = df.select(extract_text("html").alias("t")).collect()
    assert rows[0]["t"] is None
    assert rows[1]["t"] == "x"


def test_normalize_surface(spark):
    df = spark.createDataFrame(
        [("Acme Systems, Inc.",), ("GLOBAL  Dynamics Corp",), ("Datum-Robotics Ltd",)],
        "s string",
    )
    out = [r["n"] for r in df.select(normalize_surface(F.col("s")).alias("n")).collect()]
    assert out == ["acme systems", "global dynamics", "datum robotics"]


def test_blocking_keys(spark):
    df = spark.createDataFrame([("acme systems",), ("systems acme",)], "n string")
    out = df.select(
        blocking_key(F.col("n")).alias("bk"), sorted_token_key(F.col("n")).alias("sk")
    ).collect()
    assert out[0]["bk"] == "acme" and out[1]["bk"] == "systems"
    assert out[0]["sk"] == out[1]["sk"] == "acme systems"


def test_python_direct_reader_byte_identical(spark, tmp_path):
    """read_pages_extracted_python (pyarrow row-group scan + in-worker
    extraction) must produce byte-identical text to the standard
    with_extracted_text path on the same parquet."""
    from pyspark.sql import functions as F

    from mix_blink_spark.fixtures import corpus_dfs
    from mix_blink_spark.sources.pages import (
        read_pages_extracted_python,
        with_extracted_text,
    )

    pages, _, _, _ = corpus_dfs(spark, seed=33, n_pages=120, n_entities=15)
    path = str(tmp_path / "pages")
    pages.select("url", "warc_ts", "html", "lang").write.parquet(path)

    std = with_extracted_text(spark.read.parquet(path)).select(
        "url", F.col("extracted_text").alias("t_std")
    )
    new = read_pages_extracted_python(spark, path).select(
        "url", F.col("text").alias("t_new"), "warc_ts", "lang"
    )
    j = std.join(new, "url")
    assert j.count() == 120
    assert j.filter(F.col("t_std") != F.col("t_new")).count() == 0
    # carried columns survive the python scan
    assert j.filter(F.col("warc_ts").isNull() | F.col("lang").isNull()).count() == 0


def test_python_direct_reader_string_html_byte_identical(spark, tmp_path):
    """STRING-typed html (what Spark writes for StringType columns — the
    fixtures store BINARY) must take the reader's zero-copy decode path
    and still produce byte-identical text to the standard scan; string
    and binary share the same Arrow physical layout (round 8: the fast
    path was binary-gated, leaving string html on the slow scalar
    path)."""
    from pyspark.sql import functions as F

    from mix_blink_spark.fixtures import corpus_dfs
    from mix_blink_spark.sources.pages import (
        read_pages_extracted_python,
        with_extracted_text,
    )

    pages, _, _, _ = corpus_dfs(spark, seed=37, n_pages=100, n_entities=12)
    path = str(tmp_path / "pages_strhtml")
    (
        pages.select(
            "url", F.decode(F.col("html"), "utf-8").alias("html"), "lang"
        ).write.parquet(path)
    )
    assert dict(spark.read.parquet(path).dtypes)["html"] == "string"

    # the standard extract kernel's contract is BINARY html, so the
    # baseline extracts from the original binary frame — the string
    # parquet holds the identical utf-8 round-tripped content
    std = with_extracted_text(pages).select(
        "url", F.col("extracted_text").alias("t_std")
    )
    new = read_pages_extracted_python(spark, path, columns=("url", "lang")).select(
        "url", F.col("text").alias("t_new")
    )
    j = std.join(new, "url")
    assert j.count() == 100
    assert j.filter(F.col("t_std") != F.col("t_new")).count() == 0


def test_python_direct_reader_hive_partitioned_layout(spark, tmp_path):
    """The reader must handle the repo's canonical write_pages layout
    (hive-partitioned by lang, warc_day): 'lang' is a DIRECTORY column
    absent from the physical row groups, so it must be filled from each
    fragment's partition keys — pyarrow would silently omit it from
    read_row_group and every task would KeyError (round-6 review
    finding). A column that exists nowhere must refuse loudly."""
    import pytest
    from pyspark.sql import functions as F

    from mix_blink_spark.fixtures import corpus_dfs
    from mix_blink_spark.sources.pages import (
        read_pages_extracted_python,
        with_extracted_text,
        write_pages,
    )

    pages, _, _, _ = corpus_dfs(spark, seed=17, n_pages=80, n_entities=10)
    path = str(tmp_path / "pages_part")
    write_pages(pages, path)

    std = with_extracted_text(spark.read.parquet(path)).select(
        "url", F.col("extracted_text").alias("t_std"), F.col("lang").alias("l_std")
    )
    new = read_pages_extracted_python(spark, path, columns=("url", "lang")).select(
        "url", F.col("text").alias("t_new"), F.col("lang").alias("l_new")
    )
    j = std.join(new, "url")
    assert j.count() == 80
    assert j.filter(F.col("t_std") != F.col("t_new")).count() == 0
    assert j.filter(F.col("l_std") != F.col("l_new")).count() == 0

    with pytest.raises(ValueError, match="no_such_col"):
        read_pages_extracted_python(spark, path, columns=("url", "no_such_col"))


def test_python_direct_reader_typed_partition_key(spark, tmp_path):
    """A NON-STRING hive partition key (pyarrow infers e.g. int32 for
    day_i=20240101) must come back with the same TYPE and VALUES the
    standard Spark scan gives — not as the string '20240101' (round-6
    ADVICE: the reader declared every partition key string)."""
    from pyspark.sql import functions as F

    from mix_blink_spark.fixtures import corpus_dfs
    from mix_blink_spark.sources.pages import read_pages_extracted_python

    pages, _, _, _ = corpus_dfs(spark, seed=23, n_pages=40, n_entities=8)
    path = str(tmp_path / "pages_int_part")
    (
        pages.withColumn(
            "day_i", (F.lit(20240101) + (F.crc32("url") % 2)).cast("int")
        )
        .select("url", "warc_ts", "html", "lang", "day_i")
        .write.partitionBy("day_i")
        .parquet(path)
    )

    std = spark.read.parquet(path).select("url", F.col("day_i").alias("d_std"))
    new = read_pages_extracted_python(spark, path, columns=("url", "day_i")).select(
        "url", F.col("day_i").alias("d_new")
    )
    # dtype parity with the standard scan (both integer, not string)
    assert dict(new.dtypes)["d_new"] == dict(std.dtypes)["d_std"]
    j = std.join(new, "url")
    assert j.count() == 40
    assert j.filter(F.col("d_std") != F.col("d_new")).count() == 0


def test_python_direct_reader_date_timestamp_partition_keys(spark, tmp_path):
    """Date/timestamp-SHAPED hive partition values must come back with
    the same type and values as the standard Spark scan (round-7 VERDICT
    item 5: they degraded to declared-string). Spark's inference is
    strict — exactly 'yyyy-MM-dd' / 'yyyy-MM-dd HH:mm:ss', column-level
    (one bad value demotes the whole key) — so the reader mirrors that
    rule, including the demotion."""
    import os

    from pyspark.sql import functions as F

    from mix_blink_spark.fixtures import corpus_dfs
    from mix_blink_spark.sources.pages import read_pages_extracted_python

    pages, _, _, _ = corpus_dfs(spark, seed=31, n_pages=40, n_entities=8)

    # date-typed partition key, plus a timestamp-typed one
    for col, expr in (
        (
            "day",
            F.to_date(
                F.concat(
                    F.lit("2024-03-0"), (F.crc32("url") % 2 + 1).cast("string")
                )
            ),
        ),
        (
            "ts",
            F.to_timestamp(
                F.concat(
                    F.lit("2024-03-01 10:30:0"),
                    (F.crc32("url") % 2).cast("string"),
                )
            ),
        ),
    ):
        path = str(tmp_path / f"pages_{col}_part")
        (
            pages.withColumn(col, expr)
            .select("url", "html", col)
            .write.partitionBy(col)
            .parquet(path)
        )
        std = spark.read.parquet(path).select("url", F.col(col).alias("v_std"))
        new = read_pages_extracted_python(spark, path, columns=("url", col)).select(
            "url", F.col(col).alias("v_new")
        )
        # dtype parity with the standard scan (date/timestamp, not string)
        assert dict(new.dtypes)["v_new"] == dict(std.dtypes)["v_std"], col
        j = std.join(new, "url")
        assert j.count() == 40, col
        assert j.filter(F.col("v_std") != F.col("v_new")).count() == 0, col

    # column-level demotion: one non-date value anywhere -> string in
    # BOTH scans (Spark demotes the whole column; the reader must agree)
    mixed = str(tmp_path / "pages_mixed_part")
    (
        pages.withColumn(
            "day",
            F.when(F.crc32("url") % 2 == 0, F.lit("2024-03-01")).otherwise(
                F.lit("unknown")
            ),
        )
        .select("url", "html", "day")
        .write.partitionBy("day")
        .parquet(mixed)
    )
    std = spark.read.parquet(mixed).select("url", F.col("day").alias("v_std"))
    new = read_pages_extracted_python(spark, mixed, columns=("url", "day")).select(
        "url", F.col("day").alias("v_new")
    )
    assert dict(std.dtypes)["v_std"] == "string"
    assert dict(new.dtypes)["v_new"] == "string"
    j = std.join(new, "url")
    assert j.count() == 40
    assert j.filter(F.col("v_std") != F.col("v_new")).count() == 0

    # null partition value (__HIVE_DEFAULT_PARTITION__) must stay null
    # beside real dates, and the key must stay date-typed, like the
    # standard scan — not the string 'None'
    nullp = str(tmp_path / "pages_null_part")
    (
        pages.withColumn(
            "day",
            F.when(F.crc32("url") % 3 != 0, F.to_date(F.lit("2024-03-01"))),
        )
        .select("url", "html", "day")
        .write.partitionBy("day")
        .parquet(nullp)
    )
    assert any(
        e.startswith("day=__HIVE_DEFAULT_PARTITION__") for e in os.listdir(nullp)
    )
    std = spark.read.parquet(nullp).select("url", F.col("day").alias("v_std"))
    new = read_pages_extracted_python(spark, nullp, columns=("url", "day")).select(
        "url", F.col("day").alias("v_new")
    )
    assert dict(new.dtypes)["v_new"] == dict(std.dtypes)["v_std"] == "date"
    j = std.join(new, "url")
    assert j.count() == 40
    assert j.filter(F.col("v_std").isNull() != F.col("v_new").isNull()).count() == 0
    assert j.filter(
        F.col("v_std").isNotNull() & (F.col("v_std") != F.col("v_new"))
    ).count() == 0


def test_python_direct_reader_unmapped_type_str_fallback(spark, tmp_path):
    """A physical column whose pyarrow type has no DDL mapping (decimal,
    binary, ...) is declared string — gen() must actually coerce the raw
    values with str() or the task-side pandas->Arrow conversion fails on
    raw Decimal objects (round-8 ADVICE: the comment promised the
    coercion, gen() didn't do it). Nulls must stay null, not 'None'."""
    from pyspark.sql import functions as F

    from mix_blink_spark.fixtures import corpus_dfs
    from mix_blink_spark.sources.pages import read_pages_extracted_python

    pages, _, _, _ = corpus_dfs(spark, seed=29, n_pages=30, n_entities=6)
    path = str(tmp_path / "pages_decimal")
    (
        pages.withColumn(
            "price",
            F.when(
                F.crc32("url") % 3 != 0,
                (F.crc32("url") % 1000).cast("decimal(10,2)"),
            ),
        )
        .select("url", "html", "price")
        .write.parquet(path)
    )

    std = spark.read.parquet(path).select("url", F.col("price").alias("p_std"))
    new = read_pages_extracted_python(spark, path, columns=("url", "price")).select(
        "url", F.col("price").alias("p_new")
    )
    assert dict(new.dtypes)["p_new"] == "string"
    j = std.join(new, "url")
    assert j.count() == 30
    # null positions preserved (not stringified to 'None')
    assert j.filter(F.col("p_std").isNull() != F.col("p_new").isNull()).count() == 0
    # non-null values are str() of the Decimal, which equals Spark's own
    # decimal->string cast ('123.00' keeps its scale in both)
    assert (
        j.filter(
            F.col("p_std").isNotNull()
            & (F.col("p_new") != F.col("p_std").cast("string"))
        ).count()
        == 0
    )


def test_link_parquet_path_on_partitioned_layout(spark, tmp_path):
    """link() with a parquet path must work on the write_pages layout."""
    from mix_blink_spark.fixtures import corpus_dfs
    from mix_blink_spark.plans.pipeline import LinkConfig, link
    from mix_blink_spark.sources.pages import write_pages

    pages, ents, golds, _ = corpus_dfs(spark, seed=19, n_pages=100, n_entities=10)
    path = str(tmp_path / "pages_part2")
    write_pages(pages, path)
    spans = golds.select("url", "mention_id", "start", "end")
    out = link(spark, path, spans, ents, LinkConfig())
    cl = out["clusters"].collect()
    assert len(cl) > 0
