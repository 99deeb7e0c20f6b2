"""Relational operators from the reference's read API (SURVEY.md §2c),
re-expressed as single-pass DataFrame plans over the testdata star schema.

Each function mirrors one SQLAlchemy/app-side pattern from
/root/reference/backend/src/main.py and fixes its N+1 / Python-side
aggregation with the equivalent one-pass Spark plan. All aggregates are
aliased to match the DuckDB oracle SQL in __spark_entry__ (driver hash gate).

Scale notes: dimension joins are broadcast (nation/region/supplier are tiny);
fact-fact joins shuffle on their keys with AQE handling skew; windows
partition on the group key only.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped scan+group-by (maps the reference's status-rollup
    read pattern, main.py:925-968, to a columnar aggregate)."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def job_quality_rollup(events: DataFrame) -> DataFrame:
    """EP2 analogue (main.py:925-968): per user — count, distinct active
    days, rounded average value. One pass, no N+1."""
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("total_events"),
            F.count_distinct(F.to_date("ts")).alias("active_days"),
            # floor(x*100+0.5+1e-9)/100 instead of round(): identical double
            # arithmetic in Spark and DuckDB (immune to rounding-mode
            # differences), and the 1e-9 nudge absorbs the ~1e-12 summation-
            # order differences between the engines' avg() at the boundary
            (F.floor(F.avg("value") * 100 + 0.5 + 1e-9) / 100).alias("avg_value"),
        )
        .orderBy("user_id")
    )


def latest_per_user(events: DataFrame) -> DataFrame:
    """Latest event per user (main.py:1282-1318 latest-per-group):
    window row_number over (ts desc, event_id desc) — deterministic ties."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", F.round("value", 6).alias("value"))
        .orderBy("user_id")
    )


def disjunctive_like(documents: DataFrame, q: str) -> DataFrame:
    """Annotation-search ILIKE filter (main.py:1438-1445)."""
    needle = q.lower()
    return (
        documents.where(
            F.lower(F.col("text")).contains(needle)
            | F.lower(F.col("source")).contains(needle)
        )
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    )


def paginated_orders(orders: DataFrame, sort_col: str = "o_totalprice",
                     desc: bool = True, offset: int = 20, limit: int = 10) -> DataFrame:
    """Whitelist-validated dynamic sort + offset/limit (main.py:581-684).
    o_orderkey tie-break keeps pagination deterministic."""
    allowed = {"o_totalprice", "o_orderdate", "o_orderkey"}
    if sort_col not in allowed:
        raise ValueError(f"sort column {sort_col!r} not in {sorted(allowed)}")
    key = F.col(sort_col).desc() if desc else F.col(sort_col).asc()
    return (
        orders.orderBy(key, F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .offset(offset)
        .limit(limit)
    )


def customer_order_rollup(orders: DataFrame, customer: DataFrame,
                          nation: DataFrame) -> DataFrame:
    """EP3-shaped multi-way gather (main.py:1045-1098): fact ⋈ dim ⋈ dim with
    the dims broadcast, replacing the reference's per-row point lookups."""
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("n_name", "c_mktsegment")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Existence check inverted → anti join (main.py:904-913 semantics)."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def customers_with_high_value_orders(customer: DataFrame, orders: DataFrame,
                                     min_total: float = 400000.0) -> DataFrame:
    """Existence check → left semi join (main.py:984-1002)."""
    big = orders.where(F.col("o_totalprice") >= min_total)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))
        .orderBy("c_custkey")
    )


def scalar_avg_with_point_lookup(events: DataFrame, user_id: int) -> DataFrame:
    """Scalar avg + point value from one scan (main.py:1353-1386)."""
    return events.agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(
            F.max(F.when(F.col("user_id") == user_id, F.col("value"))), 6
        ).alias("user_max_value"),
        F.count("*").alias("n"),
    )


def revenue_by_region(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, region: DataFrame) -> DataFrame:
    """TPC-H Q5-shaped join chain: two fact shuffles + broadcast dims,
    exercising Catalyst join reordering at scale."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("line_count"),
        )
        .orderBy("r_name")
    )


def event_type_windowed_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-day windows per event type — the batch twin of the
    streaming query (streaming/stream.py); oracle = GROUP BY date_trunc."""
    return (
        events.groupBy(
            F.window("ts", "1 day").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )
