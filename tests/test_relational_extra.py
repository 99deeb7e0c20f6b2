"""MERGE/upsert, multi-way gather, rollup, as-of join, char-minhash
fingerprints (SURVEY.md §2c additions + training-data fingerprinting)."""
from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from pdf_extractor_spark.operators import relational, text_analysis


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B"), (9, "Z")], "k long, v string"
    )
    got = {
        (r["k"], r["v"])
        for r in relational.merge_upsert(base, updates, ["k"]).collect()
    }
    assert got == {(1, "a"), (2, "B"), (3, "c"), (9, "Z")}


def test_asof_join_latest_basic_and_ties(spark):
    t = dt.datetime
    left = spark.createDataFrame(
        [
            (1, 10, t(2024, 1, 5)),   # after two events -> latest (Jan 3)
            (2, 10, t(2024, 1, 1)),   # exactly at first event -> matches it
            (3, 10, t(2023, 12, 1)),  # before all events -> NULL
            (4, 99, t(2024, 1, 5)),   # user with no events -> NULL
        ],
        "id long, user_id long, probe_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, t(2024, 1, 1), 1.0),
            (10, t(2024, 1, 3), 2.0),
            (10, t(2024, 1, 3), 5.0),  # tie on ts -> max value wins
            (10, t(2024, 1, 9), 9.0),  # later than every probe
        ],
        "user_id long, ts timestamp, value double",
    )
    out = relational.asof_join_latest(
        left, right, "user_id", "probe_ts", "ts", ["value"]
    )
    got = {r["id"]: r["asof_value"] for r in out.collect()}
    assert got == {1: 5.0, 2: 1.0, 3: None, 4: None}


def test_revenue_rollup_totals_consistent(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rows = relational.revenue_rollup(orders, customer, nation).collect()
    grand = [r for r in rows if r["n_name"] == "(all)" and r["c_mktsegment"] == "(all)"]
    leaves = [
        r for r in rows if r["n_name"] != "(all)" and r["c_mktsegment"] != "(all)"
    ]
    assert len(grand) == 1
    assert grand[0]["orders"] == sum(r["orders"] for r in leaves)
    subtotals = [
        r for r in rows if r["n_name"] != "(all)" and r["c_mktsegment"] == "(all)"
    ]
    assert sum(r["orders"] for r in subtotals) == grand[0]["orders"]


def test_order_detail_gather_matches_filter(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = relational.order_detail_gather(orders, customer, lineitem, max_orderkey=20)
    expect = lineitem.where(F.col("l_orderkey") <= 20).count()
    assert out.count() == expect
    assert out.columns == [
        "l_orderkey", "l_linenumber", "quantity", "price", "o_orderstatus", "c_name",
    ]


def test_char_minhash_matches_python_and_survives_tail_edit(spark):
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "The quick brown fox jumps over the lazy dog EXTRA TAIL"),
            (3, "x"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fp"] for r in text_analysis.char_minhash_fingerprints(docs).collect()}

    def py_fp(text: str, k: int = 8) -> str:
        norm = " ".join(text.lower().split())
        grams = [norm[i : i + k] for i in range(max(len(norm) - k + 1, 1))]
        return min(hashlib.md5(g.encode()).hexdigest() for g in grams)

    for i, text in [(1, "The quick brown fox jumps over the lazy dog"), (3, "x"), (4, "")]:
        assert got[i] == py_fp(text), i
    # a pure tail append usually keeps the minimizing window -> robust fp
    assert got[1] == got[2] or got[2] == py_fp(
        "The quick brown fox jumps over the lazy dog EXTRA TAIL"
    )


def test_customer_year_cohorts_partition(spark):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators import relational

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    got = relational.customer_year_cohorts(orders).collect()
    cohorts = {}
    for r in got:
        cohorts.setdefault(r["cohort"], set()).add(r["o_custkey"])
    c95 = {r["o_custkey"] for r in orders.where(F.year("o_orderdate") == 1995)
           .select("o_custkey").distinct().collect()}
    c96 = {r["o_custkey"] for r in orders.where(F.year("o_orderdate") == 1996)
           .select("o_custkey").distinct().collect()}
    assert cohorts.get("both", set()) == c95 & c96
    assert cohorts.get("only_1995", set()) == c95 - c96
    assert cohorts.get("only_1996", set()) == c96 - c95
    # cohorts partition the union: no custkey appears twice
    all_rows = [r["o_custkey"] for r in got]
    assert len(all_rows) == len(set(all_rows))


def test_revenue_cube_lattice(spark):
    from pdf_extractor_spark.operators import relational

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    got = relational.revenue_cube(orders).collect()
    total = [r for r in got if r["gid"] == 3]
    assert len(total) == 1  # grand total row
    assert total[0]["n_orders"] == orders.count()
    # per-priority subtotals (gid=1: yr aggregated) sum to the grand total
    by_prio = [r for r in got if r["gid"] == 1]
    assert sum(r["n_orders"] for r in by_prio) == orders.count()
    by_yr = [r for r in got if r["gid"] == 2]
    assert sum(r["n_orders"] for r in by_yr) == orders.count()
    fine = [r for r in got if r["gid"] == 0]
    assert sum(r["n_orders"] for r in fine) == orders.count()


def test_order_percentiles_match_numpy(spark):
    import numpy as np

    from pdf_extractor_spark.operators import relational

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    got = {r["o_orderpriority"]: r
           for r in relational.order_value_percentiles(orders).collect()}
    rows = orders.select("o_orderpriority", "o_totalprice").collect()
    per = {}
    for r in rows:
        per.setdefault(r["o_orderpriority"], []).append(r["o_totalprice"])
    for prio, vals in per.items():
        a = np.array(vals)
        assert got[prio]["n_orders"] == len(vals)
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            assert abs(got[prio][col] - np.quantile(a, q)) < 1e-3, (prio, col)


def test_lineitem_stats_match_numpy(spark):
    import numpy as np

    from pdf_extractor_spark.operators import relational

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = {r["l_returnflag"]: r for r in relational.lineitem_stats(li).collect()}
    rows = li.select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    per = {}
    for r in rows:
        per.setdefault(r["l_returnflag"], []).append((r["l_quantity"], r["l_extendedprice"]))
    for flag, vals in per.items():
        q = np.array([v[0] for v in vals], dtype=np.float64)
        p = np.array([v[1] for v in vals], dtype=np.float64)
        assert got[flag]["n"] == len(vals)
        assert abs(got[flag]["sd_qty"] - q.std(ddof=1)) < 1e-4
        assert abs(got[flag]["corr_qty_price"] - np.corrcoef(q, p)[0, 1]) < 1e-4


def test_event_time_heatmap_total_and_grid(spark):
    from pdf_extractor_spark.operators import relational

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = relational.event_time_heatmap(events).collect()
    assert sum(r["n"] for r in got) == events.count()
    for r in got:
        assert 1 <= r["dow"] <= 7 and 0 <= r["hour"] <= 23


def test_user_event_pivot_row_sums(spark):
    from pdf_extractor_spark.operators import relational

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = relational.user_event_pivot(events).collect()
    per_user = {r["user_id"]: r["cnt"] for r in
                events.groupBy("user_id").count()
                .withColumnRenamed("count", "cnt").collect()}
    assert len(got) == len(per_user)
    for r in got:
        total = sum(r[c] for c in relational.EVENT_TYPES)
        assert total == per_user[r["user_id"]]


def test_order_unpivot_shape(spark):
    from pdf_extractor_spark.operators import relational

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    got = relational.order_flags_unpivot(orders).collect()
    n = orders.count()
    assert len(got) == 2 * n
    metrics = {r["metric"] for r in got}
    assert metrics == {"totalprice", "custkey"}


def test_user_moving_avg_matches_python(spark):
    from pdf_extractor_spark.operators import relational

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = relational.user_value_moving_avg(events).collect()
    rows = events.select("user_id", "event_id", "ts", "value").collect()
    per = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        per.setdefault(r["user_id"], []).append(r)
    expect = {}
    for uid, rs in per.items():
        run = 0.0
        for i, r in enumerate(rs):
            run += r["value"]
            window = [x["value"] for x in rs[max(0, i - 3): i + 1]]
            expect[(uid, r["event_id"])] = (sum(window) / len(window), run)
    for r in got[:500]:
        m, t = expect[(r["user_id"], r["event_id"])]
        assert abs(r["mavg4"] - m) < 1e-4
        assert abs(r["running_total"] - t) < 1e-2


def test_order_quartiles_balanced(spark):
    from collections import Counter

    from pdf_extractor_spark.operators import relational

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    got = relational.order_value_quartiles(orders).collect()
    per = {}
    for r in got:
        per.setdefault(r["o_orderpriority"], Counter())[r["quartile"]] += 1
    for prio, counts in per.items():
        assert set(counts) <= {1, 2, 3, 4}
        # ntile balance: sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1, (prio, counts)


def test_pivot_roundtrip_inverse(spark):
    """unpivot(pivot(events)) must reproduce the long-form counts, with
    explicit zero rows for absent (user, type) combos."""
    from pdf_extractor_spark.operators import relational

    rows = [(1, "2024-01-01 00:00:00", 10, "click", 1.0, ""),
            (2, "2024-01-01 00:01:00", 10, "click", 1.0, ""),
            (3, "2024-01-01 00:02:00", 10, "view", 1.0, ""),
            (4, "2024-01-01 00:03:00", 20, "error", 1.0, "")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
              "value double, props string").withColumn("ts", F.to_timestamp("ts"))
    got = {(r["user_id"], r["event_type"]): r["n"]
           for r in relational.pivot_roundtrip(ev).collect()}
    assert got[(10, "click")] == 2 and got[(10, "view")] == 1
    assert got[(10, "error")] == 0 and got[(20, "error")] == 1
    assert len(got) == 2 * 5  # 2 users x 5 declared event types


def test_user_event_windows_frames_and_ranks(spark):
    from pdf_extractor_spark.operators import relational

    rows = [(i, f"2024-01-01 00:0{i}:00", 1, "click", float(i), "")
            for i in range(1, 6)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
              "value double, props string").withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_id"]: r for r in relational.user_event_windows(ev).collect()}
    # running total over time order
    assert out[5]["running_total"] == 15.0
    # bounded 4-row frame at event 5: mean(2,3,4,5)
    assert out[5]["mavg4"] == 3.5
    # ranking by value desc: event 5 (value 5.0) is rank 1 / quartile 1
    assert out[5]["value_rank"] == 1 and out[5]["value_quartile"] == 1
    assert out[1]["value_rank"] == 5


def test_upserted_events_soft_delete_filter(spark, sf_dir):
    from pdf_extractor_spark.operators import relational

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    visible = relational.upserted_events(ev)
    assert visible.where(F.col("event_id") % 17 == 3).count() == 0
    no_tombstones = relational.upserted_events(ev, soft_delete_mod=None)
    assert no_tombstones.count() > visible.count()


def test_annotation_span_intersections_offsets(spark):
    from pdf_extractor_spark.operators.extract import annotation_span_intersections

    extracted = spark.createDataFrame(
        [("u1", 1, [(0, 10, "en"), (12, 30, "de")])],
        "url string, page_number int, "
        "spans array<struct<start:int,end:int,lang:string>>")
    ann = spark.createDataFrame(
        [("u1", 100, 5, 20),   # overlaps both spans
         ("u1", 101, 30, 40)],  # overlaps nothing (span end-exclusive)
        "url string, ann_id long, selection_start int, selection_end int")
    got = {(r["ann_id"], r["span_start"]): r["overlap_chars"]
           for r in annotation_span_intersections(extracted, ann).collect()}
    assert got == {(100, 0): 5, (100, 12): 8}


def test_gap_fill_locf_known_answers_and_twin(spark):
    """Dense spine per key, LOCF fill, filled flag; DuckDB twin parity
    (generate_series spine + last_value IGNORE NULLS window)."""
    import datetime as dt

    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.relational import gap_fill_locf

    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 1.0),
        ("a", d(2024, 1, 4), 4.0),   # 2 gap days -> carry 1.0
        ("b", d(2024, 2, 10), 7.0),  # single-day series
    ]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    got = [(r["k"], r["day"].isoformat(), r["v"], r["filled"])
           for r in gap_fill_locf(df, "k", "day", "v").collect()]
    assert got == [
        ("a", "2024-01-01", 1.0, False),
        ("a", "2024-01-02", 1.0, True),
        ("a", "2024-01-03", 1.0, True),
        ("a", "2024-01-04", 4.0, False),
        ("b", "2024-02-10", 7.0, False),
    ]
    con = duckdb.connect()
    con.register("obs", pd.DataFrame(rows, columns=["k", "day", "v"]))
    du = con.execute("""
        WITH b AS (SELECT k, min(day) d0, max(day) d1 FROM obs GROUP BY k),
        spine AS (SELECT k, unnest(generate_series(d0, d1,
                                   INTERVAL 1 DAY))::DATE AS day FROM b),
        j AS (SELECT s.k, s.day, o.v FROM spine s
              LEFT JOIN obs o ON o.k = s.k AND o.day = s.day)
        SELECT k, day::VARCHAR,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS v,
               v IS NULL AS filled
        FROM j ORDER BY k, day
    """).fetchall()
    assert [tuple(r) for r in du] == got


def test_gap_fill_locf_dedupes_same_day(spark):
    import datetime as dt

    from pdf_extractor_spark.operators.relational import gap_fill_locf

    d = dt.date
    rows = [("a", d(2024, 1, 1), 1.0), ("a", d(2024, 1, 1), 9.0),
            ("a", d(2024, 1, 3), 3.0)]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    got = [(r["day"].isoformat(), r["v"], r["filled"])
           for r in gap_fill_locf(df, "k", "day", "v").collect()]
    # one row per day; intra-day tie resolved to max; carry is deterministic
    assert got == [("2024-01-01", 9.0, False),
                   ("2024-01-02", 9.0, True),
                   ("2024-01-03", 3.0, False)]
