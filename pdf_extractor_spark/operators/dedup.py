"""Deduplication operators for the training-data pipeline.

All hash primitives are md5-based so the DuckDB oracle can reproduce results
bit-exactly (Spark's murmur3 `hash()` is not portable across engines).
Pure-Python twins in kernels/textstats.py.

Scale notes (100 TB):
  - exact dedup: one shuffle on the 16-byte fingerprint — minimal width
    because we aggregate on md5, never on the text itself.
  - MinHash-LSH: signatures are computed scan-side (one pass, no shuffle),
    then ONE shuffle on (band_id, band_hash) to bucket candidates, then a
    self-join restricted to buckets — the classic way to avoid the O(n²)
    cross join. Band count/rows tune recall; verification re-checks exact
    Jaccard so precision is exact.
  - SimHash: per-doc 64-bit signature scan-side; grouping on the signature
    is one narrow shuffle.
  - n-gram Jaccard: explode(shingles) → shuffle on shingle → pair counts;
    at web scale you'd cap df (drop shingles with document-frequency > K)
    — implemented via the `max_df` knob.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared text canonicalization (twin of kernels/textstats.normalize)
# ---------------------------------------------------------------------------

def _norm(col):
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def _shingles(col, n: int = 3):
    """Distinct word n-gram shingles of the normalized text (array<string>).

    Texts with fewer than n tokens yield their full token string as the one
    shingle (textstats.shingles twin).
    """
    toks = F.split(_norm(col), " ")
    return F.when(
        F.size(toks) < n, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) documents: fingerprint groups
    with >1 member. One narrow shuffle on md5(text)."""
    fp = docs.select("doc_id", F.md5(_norm(F.col("text"))).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n") > 1)
        .orderBy("fp")
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Keep the min-doc_id representative per fingerprint group."""
    w_fp = F.md5(_norm(F.col("text"))).alias("fp")
    ranked = docs.select("doc_id", w_fp)
    keep = ranked.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keep, "doc_id", "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def _minhash_val(shingle_col, seed: int):
    """32-bit md5-based hash: int of the first 8 hex chars of
    md5('<seed>:<shingle>') (textstats.minhash_value twin; the DuckDB oracle
    reproduces it with from_hex/strtol on the same md5 prefix)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), shingle_col)), 1, 8), 16, 10
    ).cast("long")


def minhash_signatures(docs: DataFrame, num_perm: int = 64, n: int = 3) -> DataFrame:
    """(doc_id, sig array<long>[num_perm]) — one scan, no shuffle."""
    sh = _shingles(F.col("text"), n).alias("shingles")
    base = docs.select("doc_id", sh)
    def _mh(seed: int):
        # factory, not a default-arg lambda: a 2-param lambda in F.transform
        # is interpreted as (element, index)
        return lambda s: _minhash_val(s, seed)

    sig = F.array(
        *[F.array_min(F.transform(F.col("shingles"), _mh(seed))) for seed in range(num_perm)]
    )
    return base.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH, verified with exact
    Jaccard (so output is exact given candidate recall).

    Plan: scan→signatures (no shuffle) → explode bands → shuffle on
    (band, band_sig) → within-bucket self-join → distinct candidate pairs →
    exact-Jaccard verify via shingle join.
    """
    rows = num_perm // bands
    sigs = minhash_signatures(docs, num_perm, n)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.concat_ws(",", F.transform(
                    F.slice(F.col("sig"), b * rows + 1, rows), lambda x: x.cast("string")
                )),
            )
        ).alias("band", "band_sig"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    return verify_jaccard(docs, cand, n=n, threshold=jaccard_threshold)


def verify_jaccard(docs: DataFrame, pairs: DataFrame, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard for given candidate (a,b) pairs."""
    sh = docs.select("doc_id", _shingles(F.col("text"), n).alias("sh"))
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sha"), "a")
        .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "shb"), "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("sha", "shb"))
                / F.size(F.array_union("sha", "shb"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("a", "b")
    )
    return j


# ---------------------------------------------------------------------------
# exact n-gram Jaccard over all pairs (small-side ground truth / verifier)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        max_df: int | None = None) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via inverted index (explode on
    shingle, pair within posting lists) — NOT a cross join. `max_df` drops
    stop-shingles with document frequency above the cap (the web-scale knob).
    """
    sh = docs.select("doc_id", _shingles(F.col("text"), n).alias("sh"))
    sizes = sh.select("doc_id", F.size("sh").alias("sz"))
    posts = sh.select("doc_id", F.explode("sh").alias("s"))
    if max_df is not None:
        keep = posts.groupBy("s").count().where(F.col("count") <= max_df).select("s")
        posts = posts.join(keep, "s", "left_semi")
    a = posts.alias("pa")
    b = posts.alias("pb")
    inter = (
        a.join(b, (F.col("pa.s") == F.col("pb.s")) & (F.col("pa.doc_id") < F.col("pb.doc_id")))
        .groupBy(F.col("pa.doc_id").alias("a"), F.col("pb.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
        .select(
            "a",
            "b",
            (F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("a", "b")
    )
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 md5 hex chars → fits exact signed-64 integer math
# in both Spark and the DuckDB oracle (16 chars would need unsigned 64).


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """60-bit SimHash over whitespace tokens (textstats.simhash twin).

    Token hash = first 15 md5 hex chars as int; bit b of the signature is 1
    iff sum over tokens of (bit set ? +1 : -1) > 0. Entirely JVM-side long
    arithmetic (shiftright/%), one scan, no shuffle.
    """
    toks = F.split(_norm(F.col("text")), " ")
    tok_hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )

    def bit_sum(b: int):
        def merge(acc, h):
            return acc + F.when(F.shiftright(h, b) % 2 == 1, 1).otherwise(-1)

        return F.aggregate(tok_hashes, F.lit(0), merge)

    sig = sum(
        (
            F.when(bit_sum(b) > 0, F.lit(2 ** b)).otherwise(F.lit(0)).cast("long")
            for b in range(SIMHASH_BITS)
        ),
        start=F.lit(0).cast("long"),
    )
    empty = _norm(F.col("text")) == ""
    return docs.select(
        "doc_id",
        F.when(empty, F.lit(0).cast("long")).otherwise(sig).alias("simhash"),
    )


def simhash_duplicates(docs: DataFrame) -> DataFrame:
    """Docs sharing an identical 64-bit SimHash (hamming distance 0)."""
    s = simhash_signatures(docs)
    return (
        s.groupBy("simhash")
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .where(F.col("n") > 1)
        .orderBy("simhash")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def cosine(a, b):
    """Cosine similarity of two array<float/double> columns, JVM-side."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def embedding_neardup_pairs(embs: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Pairs of embeddings with cosine ≥ threshold.

    Small-scale path: self-join (fine at sf test sizes). Scale path: bucket
    by random-hyperplane LSH first — see similarity.embedding_lsh_pairs.
    Embeddings are cast to double before any arithmetic so results are
    bit-stable and oracle-reproducible.
    """
    e = embs.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a"),
            F.col("b.vec_id").alias("b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .orderBy("a", "b")
    )
