"""Physical-plan regression guards for the scale-critical paths.

Each assertion pins a plan property that PLANS.md documents as the reason a
query survives a 100x scale-up: extraction does exactly one exchange (the
mandated salted repartition) with a pruned scan, dimension joins broadcast
instead of shuffling the fact table, and the near-dup candidate generators
contain no quadratic stage. A Catalyst or operator-code change that silently
reintroduces a shuffle/cartesian shows up here, not at 100 TB.
"""
from __future__ import annotations

from pdf_extractor_spark.operators import dedup, extract, relational


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def test_extraction_plan_single_exchange_pruned_scan(spark):
    """The extract pipeline is scan -> one salted Exchange -> mapInArrow;
    a second exchange would double the shuffle bill at 100 TB (PLANS.md
    q25/q26)."""
    import datetime as dt

    from pdf_extractor_spark import corpus

    docs = corpus.generate(50, seed=5)
    ts = dt.datetime(2024, 1, 1)
    rows = [(d.url, ts, d.html) for d in docs if d.html]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    out = extract.run_extract(pages, num_partitions=8)
    plan = _plan(out)
    assert plan.count("Exchange") == 1, plan
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan, plan


def test_dim_joins_broadcast_not_shuffled(spark, sf_dir):
    """Revenue-by-region joins the dims (customer/nation/region) to the
    fact chain: every dimension must broadcast — only fact-fact joins may
    exchange (PLANS.md q02)."""
    df = relational.revenue_by_region(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_minhash_lsh_plan_no_self_join_no_cartesian(spark):
    """LSH candidates come from a (band, band_sig) groupBy pair-explode —
    never a two-sided self-join of the banded table and never a cartesian
    product (PLANS.md q18)."""
    rows = [(i, ("alpha beta gamma delta epsilon zeta " * 4) + str(i % 7))
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    df = dedup.minhash_lsh_pairs(docs, num_perm=16, bands=8,
                                 jaccard_threshold=0.5)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_ngram_jaccard_plan_no_cartesian(spark):
    """Exact n-gram Jaccard pairs use an inverted shingle index (explode ->
    join on shingle hash), not an all-pairs comparison."""
    rows = [(i, ("lorem ipsum dolor sit amet " * 5) + str(i % 5))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    df = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_tfidf_store_plan_has_no_corpus_reexplode(spark, tmp_path):
    """With the tf store, the TF-IDF plan must tokenize the corpus at most
    once: the df branch reads the committed tf table instead of re-exploding
    the documents (at 100 TB a second explode doubles the tokenize work)."""
    from pdf_extractor_spark.operators import text_analysis

    rows = [(i, f"alpha beta gamma doc{i % 3} common words here") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    df = text_analysis.tfidf_topk(docs, k=2, tf_store=str(tmp_path / "tf"))
    plan = _plan(df)
    # 'Generate explode' is the tokenize step; the store path leaves at most
    # one (inside the tf-table build lineage), never one per branch
    assert plan.count("Generate explode") <= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_covariance_plan_partial_agg_bounded_shuffle(spark):
    """embedding_covariance shuffles O(partitions · d²) partial rows, never
    the vectors: the plan must show a map-side partial HashAggregate feeding
    ONE aggregate exchange (plus the final sort), and no Generate/explode of
    the embedding column (PLANS.md q63)."""
    import numpy as np

    from pdf_extractor_spark.operators import similarity

    rng = np.random.default_rng(31)
    rows = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(50)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df = similarity.embedding_covariance(embs)
    plan = _plan(df)
    assert plan.count("Exchange") == 2, plan  # agg shuffle + final sort
    assert "HashAggregate" in plan, plan
    assert "Generate explode" not in plan, plan


def test_pca_projection_stage_is_narrow(spark):
    """pca_project's per-row stage is a narrow Arrow matmul: after the
    driver-side eigh, the projection plan contains exactly one exchange
    (the final orderBy sort) and no joins (PLANS.md q66)."""
    import numpy as np

    from pdf_extractor_spark.operators import similarity

    rng = np.random.default_rng(32)
    rows = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(50)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df = similarity.pca_project(embs, k=2)
    plan = _plan(df)
    assert plan.count("Exchange") == 1, plan  # only the final sort
    assert "Join" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_hll_plan_single_data_shuffle_partial_agg(spark, sf_dir):
    """HLL registers must reach their only data-sized shuffle ALREADY
    partially aggregated (max(rank) is algebraic): the plan is
    scan -> partial HashAggregate -> Exchange(grp, idx) -> final agg ->
    register rollup. A second data-sized exchange or a missing partial
    aggregate would ship the raw corpus at 100 TB."""
    from pdf_extractor_spark.operators import sketch

    df = sketch.hll_distinct(_t(spark, sf_dir, "documents"), "text", "source")
    plan = _plan(df)
    # two exchanges total: (grp, idx) then grp — both keyed, none corpus-wide
    assert plan.count("Exchange") <= 2, plan
    assert "partial_max" in plan or "partial" in plan.lower(), plan
    assert "Cartesian" not in plan and "SortMergeJoin" not in plan, plan


def test_countmin_scoring_join_broadcasts_cells(spark):
    """Count-Min scoring joins vocab x d rows against the <=4096-cell
    table: the cell side must broadcast — a shuffle join here would
    repartition the whole vocabulary to look up 4096 rows."""
    from pdf_extractor_spark.operators import sketch

    vocab = spark.createDataFrame(
        [(f"w{i}", i + 1) for i in range(500)], "word string, freq long"
    )
    plan = _plan(sketch.countmin_topk(vocab))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_histogram_quantiles_sorts_cells_not_rows(spark, sf_dir):
    """The histogram sketch must never globally sort the raw data — the
    plan's only Sort orders post-aggregation bucket cells (the window
    input), and both exchanges are keyed aggregates."""
    from pdf_extractor_spark.operators import sketch

    df = sketch.histogram_quantiles(
        _t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority")
    plan = _plan(df)
    assert plan.count("Exchange") <= 2, plan
    # every Sort node sits above the bucket-cell aggregate (sorts grp/bucket
    # columns), not the raw value column
    for line in plan.splitlines():
        if "Sort [" in line:
            assert "o_totalprice" not in line, line
