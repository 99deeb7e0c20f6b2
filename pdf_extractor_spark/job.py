"""spark-submit entrypoint for the extraction pipeline (north_rule).

Usage (cluster):
    zip -r engine.zip pdf_extractor_spark
    spark-submit --py-files engine.zip pdf_extractor_spark/job.py \
        --input /data/pages_parquet --output /data/extracted \
        --n-buckets 4096 --partitions 8192 --wave-size 64 --salt 17

Local smoke:
    python -m pdf_extractor_spark.job --generate 5000 --output /tmp/out

The job is idempotent: re-running with the same --output resumes from the
output table's manifest chain (pipeline.ExtractionJob.done_buckets) and
only processes pending buckets.
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="PySpark web-text extraction job")
    p.add_argument("--input", help="pages table path (parquet/json/csv)")
    p.add_argument("--input-format", default="parquet",
                   choices=["parquet", "json", "csv"])
    p.add_argument("--generate", type=int, default=0,
                   help="instead of --input: synthesize N corpus docs (smoke)")
    p.add_argument("--output", required=True, help="output table root")
    p.add_argument("--n-buckets", type=int, default=64,
                   help="checkpoint granularity (lineage buckets)")
    p.add_argument("--partitions", type=int, default=0,
                   help="shuffle partitions for the extract pass (0 = 2×cores)")
    p.add_argument("--wave-size", type=int, default=8,
                   help="buckets committed per wave")
    p.add_argument("--salt", type=int, default=0, help="repartition salt")
    p.add_argument("--max-waves", type=int, default=None)
    p.add_argument("--cores", default=None,
                   help="local[N] cores (ignored under a real cluster master)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.input and not args.generate:
        print("one of --input / --generate is required", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from pdf_extractor_spark.pipeline import ExtractionJob
    from pdf_extractor_spark.session import get_spark
    from pdf_extractor_spark.sources import io as pio

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="pdfx-extract", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    partitions = args.partitions or 2 * (
        spark.sparkContext.defaultParallelism or 8
    )
    if args.generate:
        from pdf_extractor_spark import corpus

        pages = corpus.pages_df_distributed(
            spark, args.generate, seed=42, partitions=min(partitions, 64)
        )
    else:
        pages = pio.read_pages(spark, args.input, fmt=args.input_format)

    job = ExtractionJob(
        spark,
        args.output,
        n_buckets=args.n_buckets,
        partitions=partitions,
        salt=args.salt,
        wave_size=args.wave_size,
    )
    totals = job.run(pages.select("url", "warc_ts", "html"), max_waves=args.max_waves)
    print(json.dumps({"output": args.output, **totals}))
    if owns_session:  # don't stop a session we merely joined (in-process callers)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
