"""SparkSession factory with the engine's standard configs.

Sized for the sandbox (local[N], single JVM) but every knob is the one you'd
set on a real cluster: AQE on, Arrow on, small Arrow batches because payload
rows are multi-MB (SURVEY.md §4 vectorization row), shuffle partitions ≈
2-3× cores.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def get_spark(
    app_name: str = "pdf-extractor-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cores == "*" else int(cores)
        shuffle_partitions = max(2 * n, 8)
    builder = (
        SparkSession.builder
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # payload rows are multi-MB: keep Arrow batches small so the
        # JVM<->Python channel and kernel working set stay bounded
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # Master resolution: forcing .master(local[...]) would OVERRIDE a
    # spark-submit --master and silently run the "cluster" job single-JVM
    # on the driver node. SPARK_GRAFT_MASTER=external (or --cluster on
    # job.py) defers to the submit-time master; any other value is used
    # verbatim; default is the local[] sandbox mode. driver.memory is a
    # pre-JVM setting, so it only applies on the in-process local path —
    # under spark-submit pass --driver-memory instead.
    master_env = os.environ.get("SPARK_GRAFT_MASTER")
    if master_env == "external":
        pass
    elif master_env:
        builder = builder.master(master_env)
    else:
        builder = builder.master(f"local[{cores}]").config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    return builder.getOrCreate()


def pages_df(spark: SparkSession, n: int, seed: int = 42):
    """Synthesize the Common-Crawl-style pages table (FIXTURES.md §1) as a
    Spark DataFrame. Small-scale only (driver-side generation); the bench
    path parallelizes generation across executors (see bench.py)."""
    from pdf_extractor_spark import corpus

    docs = corpus.generate(n, seed)
    pdf, _ = corpus.to_pandas(docs)
    return spark.createDataFrame(pdf, schema=PAGES_DDL)


def golden_df(spark: SparkSession, n: int, seed: int = 42):
    from pdf_extractor_spark import corpus

    docs = corpus.generate(n, seed)
    _, gdf = corpus.to_pandas(docs)
    return spark.createDataFrame(gdf)
