"""Scale ladder for the dedup/ANN suites (round-2 verdict item 2): run the
q18/q21/q22 shapes at 1x and 10x the sf0.1 corpus and record wall time and
CANDIDATE VOLUME, with the documented log2(n) bucket-width knobs grown at
10x — measured evidence the bucket-bounding knobs work, not just the
derivation in dedup.py.

Corpora are synthesized deterministically from sf0.1 (no external data):
  docs:       `scale` copies of documents.parquet, every token prefixed
              with the copy id (decorrelates cross-copy shingles so copies
              are NOT near-dups of each other), then the q18-style per-copy
              near-dup injection (doc_id % 11 == 0 -> appended-token copy).
  embeddings: fresh seeded unit Gaussians at 2000*scale vectors, plus the
              q21-style near-dup clones (every 5th id, first component
              +0.05 -> cos ~ 0.998).

Usage: python tools/scale_ladder.py            # prints one JSON line
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pdf_extractor_spark.operators import dedup, similarity  # noqa: E402
from pdf_extractor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LADDER_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse", "scale_ladder")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def docs_at_scale(spark, scale: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    parts = []
    for k in range(scale):
        c = base.select(
            (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
            # prefix EVERY token with the copy id: within-copy dup structure
            # is preserved exactly, cross-copy shingle overlap drops to zero
            F.regexp_replace("text", r"(\S+)", f"c{k}$1").alias("text"),
        )
        parts.append(c)
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)
    near = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 200_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra near duplicate token"))
        .alias("text"),
    )
    return docs.unionByName(near)


def embs_at_scale(spark, scale: int, n_base: int = 2000, dim: int = 64):
    n = n_base * scale

    def gen(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            rows = []
            for vid in ids:
                rng = np.random.default_rng(int(vid) + 1_234_567)
                v = rng.standard_normal(dim)
                v = v / np.linalg.norm(v)
                rows.append(v.tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": rows})

    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    base = ids.repartition(32).mapInPandas(
        gen, "vec_id long, embedding array<double>")
    v = F.col("embedding")
    near = base.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.concat(F.array(F.element_at(v, 1) + F.lit(0.05)),
                 F.slice(v, 2, dim - 1)).alias("embedding"),
    )
    return base.unionByName(near)


def bucket_stats(banded, id_col: str) -> dict:
    """Candidate volume of a banded-LSH plan: per-(band, sig) bucket sizes
    -> total pair slots sum(C(sz, 2)) before distinct."""
    row = (
        banded.groupBy("band", "band_sig")
        .agg(F.count(id_col).alias("sz"))
        .agg(
            F.count("*").alias("buckets"),
            F.max("sz").alias("max_bucket"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("pair_slots"),
        )
        .first()
    )
    return {"buckets": int(row["buckets"]),
            "max_bucket": int(row["max_bucket"]),
            "pair_slots": int(row["pair_slots"])}


def run_q18(spark, docs, scale: int) -> dict:
    store = os.path.join(LADDER_ROOT, f"shingles_x{scale}")
    shutil.rmtree(store, ignore_errors=True)
    t0 = time.time()
    out = dedup.minhash_lsh_pairs(
        docs, num_perm=64, bands=32, jaccard_threshold=0.5,
        shingle_store=store)
    n_pairs = out.count()
    wall = time.time() - t0
    shh = dedup.shingle_table(docs, 3, store)
    banded = dedup.minhash_banded_from_hashes(shh, 64, 32)
    return {"wall_s": round(wall, 2), "pairs": n_pairs,
            "cand": bucket_stats(banded, "doc_id")}


def run_q18_prefix(spark, docs, scale: int) -> dict:
    """Prefix-filtered EXACT join vs the full inverted index: same output
    pairs (lossless), but the wide stage (posting explode) shrinks to
    ~(1-t). Reports posting volumes, walls, and pair-count equality."""
    store = os.path.join(LADDER_ROOT, f"shingles_x{scale}")
    sh = dedup.shingle_table(docs, 3, store)  # committed by run_q18
    full_posts = sh.select(F.explode("shh")).count()
    t = 0.5
    pref_posts = dedup.prefix_postings(sh, t).count()
    t0 = time.time()
    pf = dedup.prefix_filter_jaccard_pairs(
        docs, threshold=t, shingle_store=store)
    n_pf = pf.count()
    wall_pf = time.time() - t0
    t0 = time.time()
    exact = dedup.ngram_jaccard_pairs(docs, threshold=t, shingle_store=store)
    n_exact = exact.count()
    wall_exact = time.time() - t0
    return {
        "full_postings": full_posts, "prefix_postings": pref_posts,
        "prefix_frac": round(pref_posts / full_posts, 3),
        "prefix_wall_s": round(wall_pf, 2),
        "full_index_wall_s": round(wall_exact, 2),
        "pairs": n_pf, "pairs_equal": n_pf == n_exact,
    }


def run_q21(spark, embs, band_bits: int) -> dict:
    t0 = time.time()
    out = dedup.embedding_neardup_pairs_lsh(
        embs, threshold=0.95, n_bands=16, band_bits=band_bits)
    n_pairs = out.count()
    wall = time.time() - t0
    banded = dedup.embedding_lsh_band_signatures(embs, 16, band_bits, 7)
    return {"band_bits": band_bits, "wall_s": round(wall, 2),
            "pairs": n_pairs, "cand": bucket_stats(banded, "vec_id")}


def run_q22(spark, embs, n_cells: int, queries: list[int]) -> dict:
    t0 = time.time()
    ivf = similarity.ivf_topk(embs, queries, k=5, n_cells=n_cells,
                              n_probe=2)
    n = ivf.count()
    t_ivf = time.time() - t0
    t0 = time.time()
    brute = similarity.brute_force_topk(embs, queries, k=5)
    nb = brute.count()
    t_brute = time.time() - t0
    return {"n_cells": n_cells, "scan_frac": round(2 / n_cells, 3),
            "ivf_wall_s": round(t_ivf, 2), "brute_wall_s": round(t_brute, 2),
            "rows": n, "brute_rows": nb}


def run_q22_pq(spark, embs, n_cells: int, queries: list[int]) -> dict:
    """PQ + IVF-PQ ladder arm: flat-PQ ADC scoring touches every code (but
    codes are m_sub bytes, not dim floats); IVF-PQ bounds the SCORED set
    to the probed cells, with n_cells grown ~sqrt(n) like the IVF arm.
    Reports walls plus the scored-candidate count per query set and the
    index-size story (code bytes vs raw float32 bytes)."""
    from pdf_extractor_spark.operators.dedup import assign_cells

    t0 = time.time()
    pq = similarity.pq_adc_topk(embs, queries, k=5, m_sub=4, ksub=16,
                                train_iters=2)
    n_pq = pq.count()
    t_pq = time.time() - t0
    t0 = time.time()
    ipq = similarity.ivfpq_adc_topk(embs, queries, k=5, n_cells=n_cells,
                                    n_probe=2, m_sub=4, ksub=16,
                                    train_iters=2)
    n_ipq = ipq.count()
    t_ipq = time.time() - t0
    # scored-candidate volume: rows in the probed cells (recomputed from
    # the same deterministic geometry the operator trains)
    v = F.col("embedding").cast("array<double>")
    e_n = embs.select("vec_id", similarity._unit_expr(v).alias("v"))
    cents = similarity.kmeans_centroids(
        e_n.select("vec_id", F.col("v").alias("embedding")),
        k=n_cells, iters=2, seed=3)
    sizes = {r["cell"]: r["n"] for r in assign_cells(e_n, cents)
             .groupBy("cell").agg(F.count("*").alias("n")).collect()}
    qrows = [(int(r["vec_id"]), list(r["v"]))
             for r in e_n.where(F.col("vec_id").isin(queries)).collect()]
    probes = similarity.ivfpq_probes(qrows, cents, n_probe=2)
    cand = sum(sizes.get(cell, 0) for _, cell, _ in probes)
    n = embs.count()
    return {"n_cells": n_cells, "pq_wall_s": round(t_pq, 2),
            "ivfpq_wall_s": round(t_ipq, 2), "pq_rows": n_pq,
            "ivfpq_rows": n_ipq,
            "ivfpq_scored_candidates": cand,
            "flat_scored_candidates": len(queries) * (n - 1),
            "code_bytes": n * 4, "raw_f32_bytes": n * 64 * 4}


def run_q53(spark, docs, scale: int) -> dict:
    """q53-shaped rung (round-4 verdict item 4: the ladder was dedup/ANN
    only): the Common-Crawl artifact path + web-graph centralities at
    1x/10x. Pages are synthesized from the scaled docs with hosts growing
    with scale (20*scale hosts), written as per-partition gzip WARC
    segments, re-read one-file-one-task and CDX-indexed; host_edges →
    PageRank (5 iters) + HITS (3 iters) integer fixed-points. Each stage
    wall is recorded separately so linear IO growth and flat-per-iteration
    graph growth are separately visible."""
    import glob
    import tempfile

    from pdf_extractor_spark.operators import webtext
    from pdf_extractor_spark.sources import warc as warcmod

    n_hosts = 20 * scale
    did = F.col("doc_id").cast("string")
    host = F.concat(F.lit("s"), (F.col("doc_id") % n_hosts).cast("string"),
                    F.lit(".example.com"))
    h2 = F.concat(F.lit("s"), ((F.col("doc_id") * 7 + 1) % n_hosts)
                  .cast("string"), F.lit(".example.com"))
    html = F.encode(F.concat(
        F.lit('<html><body><a href="https://'), h2, F.lit('/p/'), did,
        F.lit('">x</a><p>'), F.substring("text", 1, 40),
        F.lit('</p></body></html>')), "utf-8")
    pages = docs.select(
        F.concat(F.lit("https://"), host, F.lit("/doc/"), did).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        html.alias("html"))

    seg_dir = tempfile.mkdtemp(prefix=f"ladder_warc_x{scale}_")

    def write_part(it):
        import uuid

        for pdf in it:
            if len(pdf):
                # uuid, NOT (pid, id(pdf)): a reused worker can hand two
                # batches the same memory address, silently overwriting a
                # segment (observed: 512 lost pages at the 10x rung)
                fn = os.path.join(
                    seg_dir, f"seg-{uuid.uuid4().hex}.warc.gz")
                warcmod.write_warc(fn, [
                    {"url": u, "warc_ts": ts.to_pydatetime(), "body": bytes(b)}
                    for u, ts, b in zip(pdf["url"], pdf["warc_ts"],
                                        pdf["html"])])
            yield pd.DataFrame({"n": [len(pdf)]})

    t0 = time.time()
    pages.repartition(32).mapInPandas(write_part, "n long").agg(
        F.sum("n")).collect()
    t_write = time.time() - t0

    t0 = time.time()
    back = warcmod.read_warc(spark, seg_dir)
    n_back = back.count()
    t_read = time.time() - t0

    t0 = time.time()
    n_idx = warcmod.index_warc_files(spark, seg_dir).count()
    t_index = time.time() - t0

    t0 = time.time()
    links = webtext.extract_links(pages)
    edges = webtext.host_edges(links).persist()
    n_edges = edges.count()
    t_edges = time.time() - t0

    t0 = time.time()
    pr = webtext.pagerank_fixedpoint(edges, iters=5)
    n_pr = pr.count()
    t_pr = time.time() - t0
    t0 = time.time()
    ht = webtext.hits_fixedpoint(edges, iters=3)
    n_ht = ht.count()
    t_hits = time.time() - t0
    edges.unpersist()
    shutil.rmtree(seg_dir, ignore_errors=True)
    return {"n_pages": n_back, "n_cdx": n_idx, "n_hosts": n_hosts,
            "n_edges": n_edges, "pr_hosts": n_pr, "hits_hosts": n_ht,
            "warc_write_s": round(t_write, 2),
            "warc_read_s": round(t_read, 2),
            "cdx_index_s": round(t_index, 2),
            "edges_s": round(t_edges, 2),
            "pagerank_s": round(t_pr, 2), "hits_s": round(t_hits, 2)}


def main() -> None:
    spark = get_spark(app_name="scale-ladder", cores=32,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    queries = [3, 17, 42, 99, 123]
    out: dict = {"sf": SF_DIR, "scales": {}}
    for scale in (1, 10):
        docs = docs_at_scale(spark, scale).persist()
        n_docs = docs.count()
        embs = embs_at_scale(spark, scale).persist()
        n_embs = embs.count()
        entry: dict = {"n_docs": n_docs, "n_embs": n_embs}
        entry["q18_minhash"] = run_q18(spark, docs, scale)
        entry["q18_prefix_filter"] = run_q18_prefix(spark, docs, scale)
        # band_bits knob: 12 at the 1x operating point (n ~ 2.4k); at 10x
        # the documented rule grows it by log2(10) ~ 3.3 -> 15/16. Run the
        # UNGROWN width at 10x too, to show what the knob is protecting
        # against (candidate volume, not recall - verify stays exact).
        if scale == 1:
            entry["q21_lsh"] = [run_q21(spark, embs, 12)]
        else:
            entry["q21_lsh"] = [run_q21(spark, embs, 12),
                                run_q21(spark, embs, 16)]
        # IVF cell count grows ~sqrt(n): 8 cells at 2.4k vectors, 25 at 24k
        entry["q22_ivf"] = run_q22(spark, embs, 8 if scale == 1 else 25,
                                   queries)
        entry["q22_pq"] = run_q22_pq(spark, embs, 8 if scale == 1 else 25,
                                     queries)
        entry["q53_graph_artifacts"] = run_q53(spark, docs, scale)
        out["scales"][f"x{scale}"] = entry
        docs.unpersist()
        embs.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
