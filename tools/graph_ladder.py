"""Graph ladder for the link-graph centralities: run pagerank_fixedpoint
and hits_fixedpoint on deterministic synthetic host graphs at 1x and 10x
node count and record wall time plus the two knobs that matter at web
scale:

  * broadcast_ranks/broadcast_scores True vs False — the score table is
    host-cardinality; past broadcast size the per-iteration join must
    become a shuffle hash join. Both paths are bit-identical for BOTH
    centralities (asserted on every rung), so the knob is purely
    physical.
  * PageRank warm start (init_ranks) — the month-over-month crawl shape:
    THIS rung's converged ranks seed a 1-iteration refresh of the SAME
    graph perturbed by ~1% extra edges (what a re-crawl actually looks
    like); measured as wall time of the warm iteration vs the
    5-iteration cold run it replaces, with the max fixed-point deviation
    of warm-1 vs cold-5 on the perturbed graph reported next to it.

Graphs are synthesized deterministically (no external data): a
preferential-attachment-flavored formula — host i links to hosts
(i*7+1) % max(i,1) and (i*13+5) % max(i,1), which concentrates in-degree
on low ids (the web's skew shape) — plus a uniform ring edge for
connectivity. Edge weights cycle 1..4.

Usage: python tools/graph_ladder.py     # prints one JSON line
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pdf_extractor_spark.operators import webtext  # noqa: E402
from pdf_extractor_spark.session import get_spark  # noqa: E402

N_BASE = int(os.environ.get("GRAPH_LADDER_N", "20000"))


def edges_at(spark, n: int):
    """Deterministic skewed host graph with ~3n weighted edges."""
    ids = spark.range(n).select(F.col("id").cast("int").alias("i"))
    e = ids.select(
        F.concat(F.lit("h"), F.col("i")).alias("src"),
        F.concat(F.lit("h"), (F.col("i") * 7 + 1)
                 % F.greatest(F.col("i"), F.lit(1))).alias("dst"),
        (F.col("i") % 4 + 1).cast("long").alias("w"),
    ).union(ids.select(
        F.concat(F.lit("h"), F.col("i")).alias("src"),
        F.concat(F.lit("h"), (F.col("i") * 13 + 5)
                 % F.greatest(F.col("i"), F.lit(1))).alias("dst"),
        (F.col("i") % 3 + 1).cast("long").alias("w"),
    )).union(ids.select(
        F.concat(F.lit("h"), F.col("i")).alias("src"),
        F.concat(F.lit("h"), (F.col("i") + 1) % F.lit(n)).alias("dst"),
        F.lit(1).cast("long").alias("w"),
    ))
    return e.groupBy("src", "dst").agg(F.sum("w").alias("w")).persist()


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 3)


def main() -> None:
    spark = get_spark("graph-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"metric": "graph_ladder", "n_base": N_BASE}
    for scale in (1, 10):
        n = N_BASE * scale
        e = edges_at(spark, n)
        n_edges = e.count()
        rung: dict = {"hosts": n, "edges": n_edges}

        pr_b, rung["pagerank_bcast_sec"] = timed(
            lambda: {r["host"]: r["rank_scaled"] for r in
                     webtext.pagerank_fixedpoint(
                         e, iters=5, broadcast_ranks=True).collect()})
        pr_s, rung["pagerank_shuffle_sec"] = timed(
            lambda: {r["host"]: r["rank_scaled"] for r in
                     webtext.pagerank_fixedpoint(
                         e, iters=5, broadcast_ranks=False).collect()})
        assert pr_b == pr_s, "broadcast/shuffle paths must be bit-identical"

        # the round-4 AUTO default (broadcast iff hosts >= the measured
        # ~1e5 crossover): record which physical arm it picked and that
        # results stay bit-identical
        rung["auto_is_broadcast"] = n >= webtext.GRAPH_BROADCAST_MIN_NODES
        pr_a, rung["pagerank_auto_sec"] = timed(
            lambda: {r["host"]: r["rank_scaled"] for r in
                     webtext.pagerank_fixedpoint(e, iters=5).collect()})
        assert pr_a == pr_b, "auto knob must be bit-identical"

        ht_b, rung["hits_bcast_sec"] = timed(
            lambda: {r["host"]: (r["hub_scaled"], r["auth_scaled"]) for r in
                     webtext.hits_fixedpoint(
                         e, iters=5, broadcast_scores=True).collect()})
        ht_s, rung["hits_shuffle_sec"] = timed(
            lambda: {r["host"]: (r["hub_scaled"], r["auth_scaled"]) for r in
                     webtext.hits_fixedpoint(
                         e, iters=5, broadcast_scores=False).collect()})
        assert ht_b == ht_s, "HITS broadcast/shuffle must be bit-identical"
        ht_a, rung["hits_auto_sec"] = timed(
            lambda: {r["host"]: (r["hub_scaled"], r["auth_scaled"]) for r in
                     webtext.hits_fixedpoint(e, iters=5).collect()})
        assert ht_a == ht_b, "HITS auto knob must be bit-identical"
        rung["hits_rows"] = len(ht_b)

        # month-over-month: ~1% of hosts gain one new edge; warm-start the
        # refresh from this rung's converged ranks
        ranks_df = spark.createDataFrame(
            [(h, int(v)) for h, v in pr_b.items()],
            "host string, rank_scaled long")
        delta = spark.range(n // 100).select(
            F.concat(F.lit("h"), (F.col("id") * 101) % F.lit(n)).alias("src"),
            F.concat(F.lit("h"), (F.col("id") * 103 + 7) % F.lit(n))
            .alias("dst"),
            F.lit(2).cast("long").alias("w"))
        e2 = e.unionByName(delta).groupBy("src", "dst") \
            .agg(F.sum("w").alias("w")).persist()
        ref2, rung["pagerank_cold5_perturbed_sec"] = timed(
            lambda: {r["host"]: r["rank_scaled"] for r in
                     webtext.pagerank_fixedpoint(e2, iters=5).collect()})
        warm, rung["pagerank_warm1_sec"] = timed(
            lambda: {r["host"]: r["rank_scaled"] for r in
                     webtext.pagerank_fixedpoint(
                         e2, iters=1, init_ranks=ranks_df).collect()})
        cold1, _ = timed(
            lambda: {r["host"]: r["rank_scaled"] for r in
                     webtext.pagerank_fixedpoint(e2, iters=1).collect()})
        rung["warm1_max_dev_vs_cold5"] = max(
            abs(warm[h] - ref2[h]) for h in ref2)
        rung["cold1_max_dev_vs_cold5"] = max(
            abs(cold1[h] - ref2[h]) for h in ref2)
        result[f"x{scale}"] = rung
        e.unpersist()
        e2.unpersist()
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
