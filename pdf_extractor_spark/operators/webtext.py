"""Web-corpus operators beyond the reference's API: URL canonicalization
(crawl dedup's first line of defense) and extraction-quality scoring
(token-level P/R/F1 of extracted text against a gold text column — how
boilerplate-removal quality is measured over a labeled corpus).

Both are pure JVM expression/aggregation plans — no Python in the hot
path, every stage map-side-partial — and both carry DuckDB SQL twins in
tests/test_webtext_ops.py (the driver-oracle discipline applied locally,
since the driver's testdata tables carry no URL column to gate them on).

Canonicalization spec (deterministic, documented so the SQL twin is exact):
lowercase scheme+authority, strip fragment, strip default ports (http:80 /
https:443), empty path → "/", strip one trailing slash from non-root
paths, drop empty query components and sort the rest byte-wise.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def canonical_url_expr(url: Column) -> Column:
    """Column expression computing the canonical form of an absolute URL
    (whole-stage-codegen'd: regexp_extract / array_sort / concat only)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    auth = F.when(scheme == "http", F.regexp_replace(auth, ":80$", "")) \
        .when(scheme == "https", F.regexp_replace(auth, ":443$", "")) \
        .otherwise(auth)
    path2 = F.regexp_extract(u, _AUTH_RE + r"([^?#]*)", 2)
    path2 = F.when(path2 == "", F.lit("/")).otherwise(path2)
    path2 = F.when((path2 != "/") & path2.endswith("/"),
                   path2.substr(F.lit(1), F.length(path2) - 1)).otherwise(path2)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    qsorted = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != "")), "&")
    return F.concat(
        scheme, F.lit("://"), auth, path2,
        F.when(qsorted != "", F.concat(F.lit("?"), qsorted)).otherwise(F.lit("")),
    )


def url_dup_groups(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Pages sharing a canonical URL → (canonical_url, n_urls, urls) groups
    with more than one distinct raw spelling — the crawl-frontier exact-dup
    shape (hash groupBy on the canonical key; one shuffle)."""
    c = pages.select(
        F.col(url_col).alias("raw_url"),
        canonical_url_expr(F.col(url_col)).alias("canonical_url"),
    )
    return (
        c.groupBy("canonical_url")
        .agg(
            F.countDistinct("raw_url").alias("n_urls"),
            F.array_sort(F.collect_set("raw_url")).alias("urls"),
        )
        .filter(F.col("n_urls") > 1)
        .orderBy("canonical_url")
    )


def extraction_f1(df: DataFrame, pred_col: str, gold_col: str,
                  key_col: str) -> DataFrame:
    """Per-document token-multiset precision/recall/F1 of an extracted-text
    column against a gold column (whitespace tokens, exact match).

    Plan shape: explode both sides → one (key, token) partial-agg shuffle →
    full-outer token join inside the same key partitioning → one key-level
    agg. Empty gold AND empty pred scores 1.0 (extractor correctly emitted
    nothing); empty on one side only scores 0.0. Rounded 6dp (+0.0) for the
    engine-portable value hash — the SQL twin lives in the unit tests.
    """
    def counts(col: str, out: str) -> DataFrame:
        return (
            df.select(F.col(key_col).alias("k"),
                      F.explode(F.split(F.trim(F.col(col)), r"\s+")).alias("tok"))
            .filter(F.col("tok") != "")
            .groupBy("k", "tok")
            .agg(F.count("*").alias(out))
        )

    p = counts(pred_col, "pc")
    g = counts(gold_col, "gc")
    per_tok = p.join(g, ["k", "tok"], "full_outer").select(
        "k",
        F.coalesce("pc", F.lit(0)).alias("pc"),
        F.coalesce("gc", F.lit(0)).alias("gc"),
    )
    scored = per_tok.groupBy("k").agg(
        F.sum(F.least("pc", "gc")).alias("inter"),
        F.sum("pc").alias("np"),
        F.sum("gc").alias("ng"),
    )
    keys = df.select(F.col(key_col).alias("k")).distinct()
    scored = keys.join(scored, "k", "left").select(
        "k",
        F.coalesce("inter", F.lit(0)).alias("inter"),
        F.coalesce("np", F.lit(0)).alias("np"),
        F.coalesce("ng", F.lit(0)).alias("ng"),
    )
    prec = F.when(F.col("np") > 0, F.col("inter") / F.col("np")) \
        .otherwise(F.when(F.col("ng") == 0, F.lit(1.0)).otherwise(F.lit(0.0)))
    rec = F.when(F.col("ng") > 0, F.col("inter") / F.col("ng")) \
        .otherwise(F.when(F.col("np") == 0, F.lit(1.0)).otherwise(F.lit(0.0)))
    return scored.select(
        F.col("k").alias(key_col),
        (F.round(prec, 6) + F.lit(0.0)).alias("precision"),
        (F.round(rec, 6) + F.lit(0.0)).alias("recall"),
        (F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec))
            .otherwise(F.lit(0.0)), 6) + F.lit(0.0)).alias("f1"),
    ).orderBy(key_col)
