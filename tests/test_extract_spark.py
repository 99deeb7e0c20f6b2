"""M2 integration: Spark extraction pass matches golden fixtures per url
through the full mapInArrow path (SURVEY.md §7 M2)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.extract import run_extract
from pdf_extractor_spark.session import golden_df, pages_df

N = 250
SEED = 42


@pytest.fixture(scope="module")
def extracted(spark):
    df = run_extract(pages_df(spark, N, SEED), num_partitions=8, salt=3)
    df.cache()
    yield df
    df.unpersist()


def test_row_per_page(spark, extracted):
    golden = golden_df(spark, N, SEED)
    exp_rows = golden.select(
        F.when(F.size("expected_pages") > 0, F.size("expected_pages"))
        .otherwise(F.lit(1))
        .alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert extracted.count() == exp_rows


def test_html_channels_match_golden(spark, extracted):
    golden = golden_df(spark, N, SEED)
    html_docs = extracted.filter(F.col("page_number") == 1).join(
        golden.filter(F.size("expected_pages") == 0), "url"
    )
    bad = html_docs.filter(
        (F.col("text") != F.col("expected_text"))
        | (F.col("combined") != F.col("expected_combined"))
        | (F.col("table") != F.col("expected_table"))
        | (F.col("markdown") != F.col("expected_markdown"))
    )
    assert bad.count() == 0, bad.select("url", "text", "expected_text").first()
    assert html_docs.count() > 0


def test_pdf_pages_match_golden(spark, extracted):
    golden = golden_df(spark, N, SEED)
    exp = golden.filter(F.size("expected_pages") > 0).select(
        "url", F.explode("expected_pages").alias("p")
    ).select("url", F.col("p.page").alias("page_number"), F.col("p.text").alias("expected"))
    got = extracted.join(exp, ["url", "page_number"], "inner")
    assert got.count() == exp.count()
    assert got.filter(F.col("text") != F.col("expected")).count() == 0


def test_spans_match_golden(spark, extracted):
    golden = golden_df(spark, N, SEED)
    joined = extracted.filter(F.col("page_number") == 1).join(
        golden.filter((F.size("expected_spans") > 0) & (F.size("expected_pages") == 0)),
        "url",
        "inner",
    )
    norm = F.transform(
        "expected_spans",
        lambda x: F.struct(
            x["start"].cast("int").alias("start"),
            x["end"].cast("int").alias("end"),
            x["lang"].alias("lang"),
        ),
    )
    bad = joined.filter(F.to_json(F.col("spans")) != F.to_json(norm))
    assert bad.count() == 0, bad.select("url", "spans", "expected_spans").first()


def test_meaningful_content_gate(spark, extracted):
    """Degenerate rows degrade with ok=false, never raise (tasks.py:228-249)."""
    golden = golden_df(spark, N, SEED)
    joined = extracted.filter(F.col("page_number") == 1).join(golden, "url")
    mismatch = joined.filter(
        (F.col("meta")["ok"] == "true") != F.col("expected_ok")
    )
    assert mismatch.count() == 0
    assert joined.filter(F.col("meta")["ok"] == "false").count() > 0


def test_partitioning_is_salted_hash(spark):
    """Same salt → same bucket per url; different salt → different layout."""
    from pdf_extractor_spark.operators.extract import salted_repartition

    df = pages_df(spark, 100, SEED).select("url", "warc_ts", "html")
    a = salted_repartition(df, 8, 0).withColumn("p", F.spark_partition_id())
    b = salted_repartition(df, 8, 1).withColumn("p", F.spark_partition_id())
    pa_ = {r["url"]: r["p"] for r in a.select("url", "p").collect()}
    pb = {r["url"]: r["p"] for r in b.select("url", "p").collect()}
    assert pa_ != pb  # salt actually changes the layout
    # all partitions non-empty-ish (skew defused at this scale)
    sizes = a.groupBy("p").count().collect()
    assert len(sizes) >= 6


def test_salted_repartition_defuses_host_skew(spark):
    """The corpus deliberately gives two hot hosts ~30% of rows. Partitioning
    by host would bottleneck two tasks; the url-granular salted hash must
    keep the max/mean partition ratio near 1."""
    from pdf_extractor_spark.operators.extract import salted_repartition
    from pdf_extractor_spark.session import pages_df

    df = pages_df(spark, 2000, seed=11)
    host = F.regexp_extract("url", r"https?://([^/]+)/", 1)
    hot_share = (
        df.groupBy(host.alias("h")).count().orderBy(F.col("count").desc()).limit(2)
        .agg(F.sum("count")).collect()[0][0]
    ) / 2000
    assert hot_share > 0.2  # the skew actually exists in the corpus

    by_host = df.repartition(16, host).groupBy(F.spark_partition_id()).count()
    salted = salted_repartition(df, 16, salt=5).groupBy(F.spark_partition_id()).count()

    def imbalance(rows):
        counts = [r["count"] for r in rows.collect()]
        return max(counts) / (sum(counts) / 16)

    assert imbalance(salted) < 1.35           # near-uniform
    assert imbalance(salted) < imbalance(by_host)  # strictly better than host keys


def test_oversized_payloads_routed_not_dropped(spark):
    """Payloads over oversize_bytes go through the dedicated big-bin pass and
    still produce output; payloads over the 20 MB cap are excluded."""
    import pandas as pd

    from pdf_extractor_spark.corpus import _wrap  # noqa: F401  (html builder)
    from pdf_extractor_spark.operators.extract import run_extract

    big_body = ("<p>" + "big payload text. " * 50 + "</p>")
    huge = b"<html><body>" + big_body.encode() * 80 + b"</body></html>"
    rows = pd.DataFrame(
        {
            "url": ["u://small", "u://big", "u://overcap"],
            "warc_ts": pd.Timestamp("2024-01-01", tz="UTC"),
            "html": [
                b"<html><body><p>small doc</p></body></html>",
                huge,
                b"x" * (len(huge) + 100),
            ],
        }
    )
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    out = run_extract(df, num_partitions=4, oversize_bytes=1000,
                      size_cap_bytes=len(huge) + 10)
    urls = {r["url"] for r in out.select("url").collect()}
    assert urls == {"u://small", "u://big"}  # big extracted, overcap excluded


def test_image_payload_dispatch_needs_ocr():
    """Image payloads (reference enums.py image-capable types) must route to
    a loud needs-OCR quarantine row, not silently-empty text."""
    from pdf_extractor_spark.operators.extract import (
        detect_image_format, extract_document,
    )

    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    jpg = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    gif = b"GIF89a" + b"\x00" * 16
    tiff = b"II*\x00" + b"\x00" * 16
    webp = b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 8
    bmp = b"BM\x46\x00\x00\x00\x00\x00\x00\x00\x36\x00\x00\x00"
    for payload, fmt in [(png, "png"), (jpg, "jpeg"), (gif, "gif"),
                         (tiff, "tiff"), (webp, "webp"), (bmp, "bmp")]:
        assert detect_image_format(payload) == fmt
        rows = extract_document(payload)
        assert len(rows) == 1
        assert rows[0]["meta"]["ok"] == "false"
        assert rows[0]["meta"]["needs_ocr"] == "true"
        assert rows[0]["meta"]["file_type"] == fmt
        assert "needs_ocr" in rows[0]["meta"]["error"]
    # text that merely starts with 'BM' or binary junk is NOT an image
    assert detect_image_format(b"BMW cars are great " * 3) is None
    assert extract_document(b"<p>BMW cars</p>")[0]["meta"].get("ok") != "false"


def test_image_payloads_quarantined_by_pipeline(spark, tmp_path):
    from pdf_extractor_spark.pipeline import ExtractionJob
    from pdf_extractor_spark.session import pages_df

    pages = pages_df(spark, 40, seed=3)
    # overwrite every 8th payload with a PNG header -> 5 needs-OCR docs
    from pyspark.sql import functions as F

    png = bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    pages = pages.withColumn(
        "html",
        F.when(
            F.crc32(F.col("url")) % 8 == 0, F.lit(bytes(png))
        ).otherwise(F.col("html")),
    )
    n_img = pages.where(F.crc32(F.col("url")) % 8 == 0).count()
    job = ExtractionJob(spark, str(tmp_path / "imgq"), n_buckets=4,
                        partitions=4, wave_size=4, failure_rate_abort=0.9)
    job.run(pages)
    quar = job.quarantine.read(spark)
    needs = quar.where(quar["error"].contains("needs_ocr")).count()
    assert needs == n_img and n_img > 0


def test_tune_arrow_batch_shrink_only(spark):
    """The batch tuner sizes maxRecordsPerBatch from the sampled MAX
    payload: small pages keep the 256 default (shrink-only — growing
    measured neutral-to-slower), large payloads shrink the batch so the
    per-batch working set stays ~target_batch_bytes, and the floor/ceiling
    clamp holds. Restores the session conf afterwards."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.extract import tune_arrow_batch

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key)
    try:
        small = spark.createDataFrame(
            [(f"u{i}", b"x" * 100) for i in range(50)],
            "url string, html binary")
        assert tune_arrow_batch(small) == 256
        assert spark.conf.get(key) == "256"

        big = spark.createDataFrame(
            [(f"u{i}", b"x" * (4 << 20)) for i in range(4)],
            "url string, html binary")
        rec = tune_arrow_batch(big)
        assert rec == (32 << 20) // (4 << 20) == 8
        assert spark.conf.get(key) == "8"

        # one huge payload in a sea of small ones must still shrink the
        # batch (MAX, not a percentile — the heavy-tail lesson)
        mixed = small.unionByName(spark.createDataFrame(
            [("big", b"y" * (2 << 20))], "url string, html binary"))
        assert tune_arrow_batch(mixed) == 16

        # floor clamp: payloads larger than the target can't reach 0
        huge = spark.createDataFrame(
            [("h", b"z" * (40 << 20))], "url string, html binary")
        assert tune_arrow_batch(huge) == 8
        # NULL payloads are ignored by the sampler
        nulls = spark.createDataFrame(
            [("n", None)], "url string, html binary")
        assert tune_arrow_batch(nulls) == 256
    finally:
        spark.conf.set(key, before)
